"""External-model enrichment operator (reference X2: sentiment scoring).

The reference calls a remote DistilBERT API per text batch
(sources/hacker_news.py:131-229, ThreadPoolExecutor variant in
scripts/backfill_hn_sentiment.py:93-144). Here the scorer is a pluggable
interface executed via mapInPandas so Spark partitions are the unit of
parallelism (replacing the thread pool); tests and offline runs use the
deterministic stub — the real API is never called from tests.

Semantics reproduced exactly:
  * empty/short (<10 chars) → (0.0, 'NEUTRAL', 'neutral')
  * texts truncated at 1000 chars before scoring
  * score thresholds: > 0.25 positive, < -0.25 negative, else neutral
  * scorer errors → (0.0, 'ERROR', 'neutral')
"""

from __future__ import annotations

import hashlib
from typing import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

MAX_CHARS = 1000
THRESHOLD = 0.25

SENTIMENT_FIELDS = [
    T.StructField("sentiment_score", T.DoubleType(), True),
    T.StructField("sentiment_label", T.StringType(), True),
    T.StructField("sentiment_category", T.StringType(), True),
]


def stub_scorer(texts: list[str]) -> list[float]:
    """Deterministic fake model: signed score in [-1, 1] from the text
    digest. Stable across runs/engines — the test double for the real API.
    No rounding: the raw double is reproducible exactly in SQL as
    ('0x' || substr(md5(text), 1, 8))::bigint / 4294967295.0 * 2 - 1."""
    out = []
    for text in texts:
        h = int.from_bytes(hashlib.md5(text.encode()).digest()[:4], "big")
        out.append((h / 0xFFFFFFFF) * 2 - 1)
    return out


def categorize(score: float) -> str:
    if score > THRESHOLD:
        return "positive"
    if score < -THRESHOLD:
        return "negative"
    return "neutral"


def score_sentiment(
    df: DataFrame,
    text_col: str = "text",
    scorer: Callable[[list[str]], list[float]] = stub_scorer,
    batch_size: int = 50,
) -> DataFrame:
    """Append sentiment columns. Batches of ``batch_size`` per call mirror
    the reference's API batching; partitions run in parallel."""
    out_schema = T.StructType(list(df.schema.fields) + SENTIMENT_FIELDS)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            scores, labels, cats = [], [], []
            texts = pdf[text_col].fillna("").astype(str).tolist()
            for start in range(0, len(texts), batch_size):
                chunk = texts[start : start + batch_size]
                prepared = [t[:MAX_CHARS] for t in chunk]
                try:
                    raw = scorer(prepared)
                except Exception:
                    raw = None
                for i, t in enumerate(prepared):
                    if raw is None:
                        scores.append(0.0)
                        labels.append("ERROR")
                        cats.append("neutral")
                    elif len(t.strip()) < 10:
                        scores.append(0.0)
                        labels.append("NEUTRAL")
                        cats.append("neutral")
                    else:
                        s = float(raw[i])
                        scores.append(s)
                        labels.append("POSITIVE" if s >= 0 else "NEGATIVE")
                        cats.append(categorize(s))
            pdf = pdf.copy()
            pdf["sentiment_score"] = scores
            pdf["sentiment_label"] = labels
            pdf["sentiment_category"] = cats
            yield pdf

    return df.mapInPandas(run, schema=out_schema)
