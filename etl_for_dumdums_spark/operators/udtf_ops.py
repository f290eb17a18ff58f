"""Python UDTF surface (SURVEY.md §2.12 API breadth, Spark 4).

The reference exposes row-expanding Python lambdas over pandas frames
(e.g. exploding reaction lists, ``int_fda__food_event_reactions``-style
splits); Spark 4's Python UDTF is the official API for arbitrary
row→rows Python expansion. Like the repo's other Python-API showcases
(the applyInPandas OLS and the scalar pandas_udf token counter), the
point is demonstrated discipline, not a semantic fork:

  * the UDTF (:func:`sentence_udtf`) does the expansion in Python;
  * :func:`split_sentences_native` is the JVM-native twin (regex split +
    posexplode, whole-stage-codegen);
  * tests pin them row-identical, so the Python surface is an ESCAPE
    HATCH with a proven native equivalent, never the hot path.

Scale note (100 TB): a UDTF runs row-at-a-time through the Python worker
— strictly slower than the native twin; use it only when the expansion
logic genuinely cannot be expressed with builtin functions (here it can,
which is exactly what the twin proves).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SENT_RE = r"[.!?]+\s+|[.!?]+$"


def make_sentence_udtf():
    """Build the UDTF lazily (decorating at import would need a session)."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="sent_idx: int, sentence: string, n_words: int")
    class SentenceSplit:
        def eval(self, text: str):  # noqa: D102 — UDTF contract
            if text is None:
                return
            idx = 0
            for raw in re.split(_SENT_RE, text):
                s = raw.strip()
                if not s:
                    continue
                yield idx, s, len(s.split())
                idx += 1

    return SentenceSplit


def split_sentences_udtf(docs: DataFrame) -> DataFrame:
    """(doc_id, text) → (doc_id, sent_idx, sentence, n_words) via the UDTF."""
    spark = docs.sparkSession
    spark.udtf.register("sentence_split", make_sentence_udtf())
    docs.select("doc_id", "text").createOrReplaceTempView("__udtf_docs")
    return spark.sql(
        """
        SELECT d.doc_id, s.sent_idx, s.sentence, s.n_words
        FROM __udtf_docs d, LATERAL sentence_split(d.text) s
        """
    )


def split_sentences_native(docs: DataFrame) -> DataFrame:
    """The JVM-native twin: identical output, whole-stage codegen."""
    sents = F.filter(
        F.transform(
            F.split(F.col("text"), _SENT_RE),
            lambda s: F.trim(s),
        ),
        lambda s: s != "",
    )
    return docs.select(
        "doc_id", F.posexplode(sents).alias("sent_idx", "sentence")
    ).select(
        "doc_id",
        F.col("sent_idx").cast("int"),
        "sentence",
        F.size(F.split(F.col("sentence"), r"\s+")).cast("int").alias("n_words"),
    )
