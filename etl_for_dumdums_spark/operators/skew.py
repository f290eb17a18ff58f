"""Skew mitigation for hot join keys: explicit salting.

AQE's skew-join splitting (enabled in session.py) handles most skew at
runtime; explicit salting is the deterministic fallback for the pathological
case — one key holding a double-digit percentage of a 100 TB fact table,
where even a split partition overwhelms its executors.

``salted_join``: the fact side gets a random salt in [0, n); the dimension
side is exploded n× (one row per salt). The join key becomes (key, salt), so
the hot key's rows spread across n reducers. Correct for 1:N joins where
the salted side is the N side (each fact row still matches exactly one
dim row per salt).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join fact⋈dim on `key` with the shuffle spread over n_salts
    buckets per key. Result columns = fact columns + dim columns (minus the
    duplicate key)."""
    salted_fact = fact.withColumn("_salt", (F.rand(seed=42) * n_salts).cast("int"))
    salted_dim = dim.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    out = salted_fact.join(salted_dim, on=[key, "_salt"], how=how)
    return out.drop("_salt")
