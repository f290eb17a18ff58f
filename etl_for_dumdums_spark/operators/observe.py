"""In-flight data-quality metrics via Spark's Observation API.

``df.observe(Observation, metrics...)`` piggybacks aggregates onto whatever
action consumes the frame — the metrics are computed DURING the write/scan,
not by a second pass over the data. At 100 TB that is the difference
between free load-contract checks and doubling the pipeline's I/O: the
reference re-reads its loaded tables to validate row counts
(lib/bigquery.py-style post-load checks); this is the single-pass form.

``observed`` attaches standard load metrics; ``check_contract`` evaluates
expectations against the observed values after the action ran.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F


def observed(
    df: DataFrame,
    null_cols: list[str] | None = None,
    name: str = "load",
) -> tuple[DataFrame, Observation]:
    """Attach row-count / null-count / distinct-ish metrics to ``df``.

    Returns (df', observation); read ``observation.get`` AFTER an action has
    consumed df'. Metrics: ``rows``, and ``nulls_<col>`` per requested col.
    Observation metrics must be aggregates without distinct — approximate
    distinct via HLL would go here if needed."""
    obs = Observation(name)
    metrics = [F.count(F.lit(1)).alias("rows")]
    for c in null_cols or []:
        metrics.append(
            F.sum(F.col(c).isNull().cast("long")).alias(f"nulls_{c}")
        )
    return df.observe(obs, *metrics), obs


def check_contract(
    obs: Observation, expectations: dict[str, Callable[[int], bool]]
) -> dict[str, bool]:
    """Evaluate per-metric predicates against the observed values.

    Returns {metric: passed}; raises KeyError if a metric was never
    observed (contract names must match the attached metrics)."""
    got = obs.get
    return {name: bool(pred(got[name])) for name, pred in expectations.items()}
