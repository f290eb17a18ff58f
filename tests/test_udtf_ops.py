"""Python UDTF showcase: row-identical to the JVM-native twin (the same
escape-hatch discipline as the applyInPandas OLS / pandas_udf token
counter showcases — Python expansion surfaces exist, with a proven
native equivalent)."""

from __future__ import annotations

from tests.conftest import SF_SMOKE


def _norm(rows):
    return sorted(
        (r["doc_id"], r["sent_idx"], r["sentence"], r["n_words"]) for r in rows
    )


def test_udtf_matches_native_twin(spark):
    from etl_for_dumdums_spark.operators.udtf_ops import (
        split_sentences_native,
        split_sentences_udtf,
    )

    from pyspark.sql import functions as F

    # the synthetic docs carry no sentence punctuation — inject some so the
    # UDTF actually expands (replace every 5th space with '. ')
    docs = (
        spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
        .limit(200)
        .select(
            "doc_id",
            F.regexp_replace(
                "text", r"(\S+ \S+ \S+ \S+ \S+) ", r"$1. "
            ).alias("text"),
        )
    )
    got = _norm(split_sentences_udtf(docs).collect())
    want = _norm(split_sentences_native(docs).collect())
    assert got == want
    assert len(got) > 400  # expansion actually happened


def test_udtf_handles_null_and_empty(spark):
    from etl_for_dumdums_spark.operators.udtf_ops import (
        split_sentences_native,
        split_sentences_udtf,
    )

    docs = spark.createDataFrame(
        [(1, None), (2, ""), (3, "One. Two! Three?"), (4, "no terminator")],
        "doc_id long, text string",
    )
    got = _norm(split_sentences_udtf(docs).collect())
    want = _norm(split_sentences_native(docs).collect())
    assert got == want
    assert [g[2] for g in got if g[0] == 3] == ["One", "Two", "Three"]
    assert [g[2] for g in got if g[0] == 4] == ["no terminator"]
