"""Recorded-fixture tests for StocksSource (yfinance MultiIndex flattening,
NaN scrubbing) and TrendsSource (5-keyword batching, inter-batch delay,
composite keys) — same transport-injection protocol as test_connectors.py."""

from __future__ import annotations

from datetime import date

import numpy as np
import pandas as pd
import pytest

from etl_for_dumdums_spark.sources import run_sync
from etl_for_dumdums_spark.sources.connectors import (
    TICKER_TO_SECTOR,
    TRENDS_BATCH,
    TRENDS_RATE_LIMIT_DELAY,
    StocksSource,
    TrendsSource,
)

_DATES = pd.to_datetime(["2024-01-02", "2024-01-03"])


def _multi_frame(tickers, drop=()):
    """yfinance group_by='ticker' shape: MultiIndex (ticker, field)."""
    fields = ["Open", "High", "Low", "Close", "Adj Close", "Volume"]
    cols, data = [], []
    for t in tickers:
        if t in drop:
            continue
        for i, f in enumerate(fields):
            cols.append((t, f))
            data.append([100.0 + i, np.nan if f == "Volume" and t == "MSFT" else 200.0 + i])
    return pd.DataFrame(
        np.array(data).T, index=_DATES, columns=pd.MultiIndex.from_tuples(cols)
    )


class StocksFixture:
    def __init__(self, drop=()):
        self.calls = []
        self._drop = drop

    def __call__(self, tickers, start, end):
        self.calls.append((tuple(tickers), start, end))
        if len(tickers) == 1:
            f = _multi_frame(tickers)
            return f[tickers[0]]  # flat columns, like yfinance single-ticker
        return _multi_frame(tickers, drop=self._drop)


def test_stocks_multiindex_flatten_and_nan_scrub(spark):
    fx = StocksFixture(drop=("XOM",))
    src = StocksSource(
        fx,
        tickers=["AAPL", "MSFT", "XOM"],
        lookback_days=7,
        today=date(2024, 1, 9),
        clock=lambda: "2024-01-09T00:00:00",
    )
    rows = {r["id"]: r.asDict() for r in src.read(spark).collect()}

    # protocol: ONE download call for the whole list over the lookback window
    assert fx.calls == [(("AAPL", "MSFT", "XOM"), "2024-01-02", "2024-01-09")]
    # dropped ticker skipped; 2 tickers x 2 dates remain
    assert len(rows) == 4
    r = rows["AAPL_2024-01-02"]
    assert r["ticker"] == "AAPL" and r["sector"] == TICKER_TO_SECTOR["AAPL"]
    assert r["open"] == 100.0 and r["adj_close"] == 104.0 and r["volume"] == 105
    # NaN volume scrubbed to NULL (not NaN, not 0) — fixture NaNs date 2
    assert rows["MSFT_2024-01-03"]["volume"] is None
    # long-typed volume after scrub
    assert dict(src.read(spark).dtypes)["volume"] == "bigint"


def test_stocks_single_ticker_flat_frame(spark):
    src = StocksSource(
        StocksFixture(), tickers=["AAPL"], today=date(2024, 1, 9), clock=lambda: "t"
    )
    rows = src.read(spark).collect()
    assert {r["id"] for r in rows} == {"AAPL_2024-01-02", "AAPL_2024-01-03"}


def test_stocks_empty_response_yields_no_rows(spark):
    src = StocksSource(
        lambda *_: pd.DataFrame(), tickers=["AAPL"], today=date(2024, 1, 9)
    )
    assert src.read(spark).count() == 0


def test_stocks_run_sync_idempotent(spark, tmp_path):
    src = StocksSource(
        StocksFixture(), tickers=["AAPL", "MSFT"], today=date(2024, 1, 9),
        clock=lambda: "t",
    )
    path = run_sync(spark, src, str(tmp_path))
    run_sync(spark, src, str(tmp_path))  # overlapping window re-sync
    assert spark.read.parquet(path).count() == 4


class TrendsFixture:
    def __init__(self, missing=(), empty_batches=()):
        self.calls = []
        self._missing = missing
        self._empty = empty_batches

    def __call__(self, batch, timeframe, geo):
        n = len(self.calls)
        self.calls.append((tuple(batch), timeframe, geo))
        if n in self._empty:
            return pd.DataFrame()
        data = {kw: [10 + i, 20 + i] for i, kw in enumerate(batch) if kw not in self._missing}
        data["isPartial"] = [False, True]
        return pd.DataFrame(data, index=_DATES)


def test_trends_batching_protocol_and_keys(spark):
    kws = [f"kw{i}" for i in range(12)]  # 3 batches: 5 + 5 + 2
    sleeps = []
    fx = TrendsFixture(missing=("kw3",))
    src = TrendsSource(
        fx, keywords=kws, geo="US", sleep=sleeps.append, clock=lambda: "t"
    )
    rows = {r["id"]: r.asDict() for r in src.read(spark).collect()}

    assert [len(c[0]) for c in fx.calls] == [5, 5, 2]
    assert all(len(c[0]) <= TRENDS_BATCH for c in fx.calls)
    # delay BETWEEN batches only: 2 sleeps for 3 batches, each the rate limit
    assert sleeps == [TRENDS_RATE_LIMIT_DELAY, TRENDS_RATE_LIMIT_DELAY]
    # missing keyword skipped: (12-1) keywords x 2 dates
    assert len(rows) == 22
    r = rows["kw0_2024-01-02_US"]
    assert r["keyword"] == "kw0" and r["interest"] == 10 and r["is_partial"] is False
    assert rows["kw0_2024-01-03_US"]["is_partial"] is True


def test_trends_empty_batch_skipped_world_geo(spark):
    fx = TrendsFixture(empty_batches=(0,))
    src = TrendsSource(
        fx, keywords=[f"k{i}" for i in range(7)], geo="", sleep=lambda s: None,
        clock=lambda: "t",
    )
    rows = src.read(spark).collect()
    # first batch (5 kws) empty → only the 2 second-batch keywords land
    assert {r["keyword"] for r in rows} == {"k5", "k6"}
    assert all(r["geo"] == "WORLD" for r in rows)
    assert all(r["id"].endswith("_WORLD") for r in rows)


def test_trends_requires_keywords():
    with pytest.raises(ValueError):
        TrendsSource(lambda *a: None, keywords=[])


def test_trends_run_sync_idempotent(spark, tmp_path):
    src = TrendsSource(
        TrendsFixture(), keywords=["a", "b"], sleep=lambda s: None, clock=lambda: "t"
    )
    path = run_sync(spark, src, str(tmp_path))
    run_sync(spark, src, str(tmp_path))
    assert spark.read.parquet(path).count() == 4
