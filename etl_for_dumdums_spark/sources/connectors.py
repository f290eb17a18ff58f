"""Concrete per-API source connectors (reference parity, transport-injected).

Round 1 covered pagination *mechanics* with one generic PaginatedRestSource;
these classes reproduce each reference API's actual fetch protocol and
row-flattening transform:

  * LinearGraphQLSource  — GraphQL cursor paging + nested-node flattening
                           (reference sources/linear.py:93-198)
  * GitHubRestSource     — page-number paging, Link-header "next" detection,
                           dict-vs-array payloads, and sorted-desc early
                           termination on an updated-at cutoff
                           (reference sources/github.py:73-111,236-268)
  * OuraTokenSource      — next_token paging over a {"data": [...]} envelope
                           + contributors flattening
                           (reference sources/oura.py:37-77,121-136)

The HTTP transport is injected (a callable returning a requests-like
response with ``.json()`` and ``.links``), so tests drive the full protocol
against recorded fixtures and offline runs never touch the network. At
cluster scale the driver-side page walk stays cheap (API volumes are small);
the per-row detail fan-out uses sources.throttled_detail_fetch (mapInPandas)
instead of the reference's inline sleep loop.
"""

from __future__ import annotations

from datetime import datetime
from typing import Any, Callable, Iterable, Optional

from pyspark.sql import SparkSession
from pyspark.sql import types as T

from . import Source


class TransportResponse:
    """Minimal requests.Response stand-in for recorded fixtures: carries the
    parsed JSON payload and the parsed Link-header relations."""

    def __init__(self, payload: Any, links: Optional[dict] = None):
        self._payload = payload
        self.links = links or {}

    def json(self) -> Any:
        return self._payload


# transport(url_or_query, params) -> TransportResponse
Transport = Callable[[str, dict], TransportResponse]


def _opt(node: Optional[dict], key: str) -> Any:
    return node[key] if node else None


class LinearGraphQLSource(Source):
    """Linear GraphQL cursor pagination + issue flattening.

    Protocol (reference sources/linear.py:93-136): POST the query with
    ``variables = {**vars, "after": cursor}``; read
    ``data[root_field].nodes`` and ``pageInfo.hasNextPage / endCursor``;
    raise on a top-level ``errors`` key. The transform flattens nested
    state/assignee/project/cycle/parent objects and the labels.nodes list
    (linear.py:179-198).
    """

    dataset_id = "linear"
    table_id = "raw_issues"
    primary_key = "id"
    schema = T.StructType(
        [
            T.StructField("id", T.StringType(), False),
            T.StructField("identifier", T.StringType()),
            T.StructField("title", T.StringType()),
            T.StructField("state", T.StringType()),
            T.StructField("assignee_id", T.StringType()),
            T.StructField("priority", T.IntegerType()),
            T.StructField("estimate", T.DoubleType()),
            T.StructField("created_at", T.StringType()),
            T.StructField("updated_at", T.StringType()),
            T.StructField("project_name", T.StringType()),
            T.StructField("labels", T.ArrayType(T.StringType())),
            T.StructField("cycle_id", T.StringType()),
            T.StructField("parent_id", T.StringType()),
            T.StructField("parent_identifier", T.StringType()),
        ]
    )

    def __init__(
        self,
        transport: Transport,
        *,
        query: str = "query Issues($after: String) { issues(after: $after) { ... } }",
        root_field: str = "issues",
        variables: Optional[dict] = None,
    ):
        self._transport = transport
        self._query = query
        self._root_field = root_field
        self._variables = variables or {}

    def fetch(self, spark: SparkSession) -> Iterable[dict]:
        nodes: list[dict] = []
        cursor: Optional[str] = None
        while True:
            resp = self._transport(self._query, {**self._variables, "after": cursor})
            data = resp.json()
            if "errors" in data:
                raise RuntimeError(f"Linear API error: {data['errors']}")
            result = data["data"][self._root_field]
            nodes.extend(result["nodes"])
            if not result["pageInfo"]["hasNextPage"]:
                return nodes
            cursor = result["pageInfo"]["endCursor"]

    def transform(self, spark: SparkSession, raw: Iterable[dict]):
        rows = [
            {
                "id": issue["id"],
                "identifier": issue["identifier"],
                "title": issue["title"],
                "state": _opt(issue.get("state"), "name"),
                "assignee_id": _opt(issue.get("assignee"), "id"),
                "priority": issue.get("priority"),
                "estimate": issue.get("estimate"),
                "created_at": issue.get("createdAt"),
                "updated_at": issue.get("updatedAt"),
                "project_name": _opt(issue.get("project"), "name"),
                "labels": [lb["name"] for lb in issue["labels"]["nodes"]],
                "cycle_id": _opt(issue.get("cycle"), "id"),
                "parent_id": _opt(issue.get("parent"), "id"),
                "parent_identifier": _opt(issue.get("parent"), "identifier"),
            }
            for issue in raw
        ]
        return spark.createDataFrame(rows, schema=self.schema)


class GitHubRestSource(Source):
    """GitHub REST page-number pagination with Link-header next detection
    and early termination on a sorted-desc updated-at cutoff.

    Protocol (reference sources/github.py:73-111): request page=1.. with
    per_page=100; a dict payload means search-style ``{"items": [...]}``;
    stop when the payload is empty or the Link header has no ``next``
    relation. Early stop (github.py:236-268): with results sorted by
    updated desc, the first item older than ``since`` ends the whole walk.
    """

    dataset_id = "github"
    table_id = "raw_pull_requests"
    primary_key = "id"
    schema = T.StructType(
        [
            T.StructField("id", T.StringType(), False),
            T.StructField("number", T.IntegerType()),
            T.StructField("repo", T.StringType()),
            T.StructField("title", T.StringType()),
            T.StructField("state", T.StringType()),
            T.StructField("draft", T.BooleanType()),
            T.StructField("author_id", T.StringType()),
            T.StructField("created_at", T.StringType()),
            T.StructField("updated_at", T.StringType()),
            T.StructField("merged_at", T.StringType()),
        ]
    )

    page_size = 100

    def __init__(
        self,
        transport: Transport,
        *,
        url: str,
        repo: str = "",
        params: Optional[dict] = None,
        since: Optional[datetime] = None,
        updated_key: str = "updated_at",
    ):
        self._transport = transport
        self._url = url
        self._repo = repo
        self._params = params or {}
        self._since = since
        self._updated_key = updated_key
        self.pages_fetched = 0  # protocol introspection for tests/telemetry

    @staticmethod
    def _parse_ts(value: str) -> datetime:
        return datetime.fromisoformat(value.replace("Z", "+00:00"))

    def fetch(self, spark: SparkSession) -> Iterable[dict]:
        items: list[dict] = []
        page = 1
        self.pages_fetched = 0
        while True:
            resp = self._transport(
                self._url, {**self._params, "page": page, "per_page": self.page_size}
            )
            self.pages_fetched += 1
            payload = resp.json()
            if isinstance(payload, dict):  # search endpoints wrap in {"items": []}
                payload = payload.get("items", [])
            if not payload:
                return items
            for item in payload:
                if self._since is not None and self._parse_ts(
                    item[self._updated_key]
                ) < self._since:
                    return items  # sorted desc → everything after is older
                items.append(item)
            if "next" not in resp.links:
                return items
            page += 1

    def transform(self, spark: SparkSession, raw: Iterable[dict]):
        rows = [
            {
                "id": str(pr["id"]),
                "number": pr.get("number"),
                "repo": self._repo,
                "title": pr.get("title"),
                "state": pr.get("state"),
                "draft": pr.get("draft"),
                "author_id": str(_opt(pr.get("user"), "id")) if pr.get("user") else None,
                "created_at": pr.get("created_at"),
                "updated_at": pr.get("updated_at"),
                "merged_at": pr.get("merged_at"),
            }
            for pr in raw
        ]
        return spark.createDataFrame(rows, schema=self.schema)


class OuraTokenSource(Source):
    """Oura next_token pagination over a ``{"data": [...]}`` envelope, with
    the daily-sleep contributors flattening.

    Protocol (reference sources/oura.py:37-77): GET with the previous
    response's ``next_token`` merged into params; stop when ``data`` is
    empty or ``next_token`` is absent. Transform (oura.py:121-136): one
    column per contributors sub-score, null-safe.
    """

    dataset_id = "oura"
    table_id = "raw_sleep"
    primary_key = "id"
    _CONTRIBUTORS = (
        "deep_sleep",
        "efficiency",
        "latency",
        "rem_sleep",
        "restfulness",
        "timing",
        "total_sleep",
    )
    schema = T.StructType(
        [
            T.StructField("id", T.StringType(), False),
            T.StructField("day", T.StringType()),
            T.StructField("score", T.IntegerType()),
        ]
        + [T.StructField(f"contributor_{c}", T.IntegerType()) for c in _CONTRIBUTORS]
    )

    def __init__(self, transport: Transport, *, url: str, params: Optional[dict] = None):
        self._transport = transport
        self._url = url
        self._params = params or {}

    def fetch(self, spark: SparkSession) -> Iterable[dict]:
        items: list[dict] = []
        next_token: Optional[str] = None
        while True:
            params = dict(self._params)
            if next_token:
                params["next_token"] = next_token
            data = self._transport(self._url, params).json()
            page = data.get("data", [])
            if not page:
                return items
            items.extend(page)
            next_token = data.get("next_token")
            if not next_token:
                return items

    def transform(self, spark: SparkSession, raw: Iterable[dict]):
        rows = []
        for rec in raw:
            contributors = rec.get("contributors") or {}
            row = {
                "id": rec["id"],
                "day": rec.get("day"),
                "score": rec.get("score"),
            }
            for c in self._CONTRIBUTORS:
                row[f"contributor_{c}"] = contributors.get(c)
            rows.append(row)
        return spark.createDataFrame(rows, schema=self.schema)


def with_retries(
    transport: Transport,
    max_attempts: int = 4,
    base_delay: float = 0.5,
    retry_on: tuple = (ConnectionError, TimeoutError),
    sleep=None,
) -> Transport:
    """Wrap a transport with exponential-backoff retries — the resilience
    layer every reference source relies on requests/the API SDK for. Only
    transient transport errors retry; API-level errors (e.g. a GraphQL
    ``errors`` payload) surface immediately since they are deterministic.
    ``sleep`` is injectable for tests."""
    import time as _time

    do_sleep = sleep or _time.sleep

    def wrapped(url: str, params: dict) -> TransportResponse:
        attempt = 0
        while True:
            try:
                return transport(url, params)
            except retry_on:
                attempt += 1
                if attempt >= max_attempts:
                    raise
                do_sleep(base_delay * (2 ** (attempt - 1)))

    return wrapped


# ---------------------------------------------------------------------------
# Stocks: yfinance-shaped OHLCV download (reference sources/stocks.py)
# ---------------------------------------------------------------------------

# Sector map = reference config (sources/stocks.py:19-27); the grouping IS
# the specified semantics (sector enrichment joins depend on it).
TICKERS_BY_SECTOR = {
    "Technology": ["AAPL", "MSFT", "NVDA", "GOOGL", "META", "AMD", "CRM"],
    "Healthcare": ["JNJ", "UNH", "PFE", "ABBV", "MRK", "LLY"],
    "Energy": ["XOM", "CVX", "COP", "SLB", "OXY", "NEE"],
    "Industrial": ["CAT", "HON", "BA", "UPS", "GE", "DE"],
    "Consumer Retail": ["AMZN", "WMT", "COST", "HD", "NKE", "SBUX", "TGT"],
}
ALL_TICKERS = [t for ts in TICKERS_BY_SECTOR.values() for t in ts]
TICKER_TO_SECTOR = {t: s for s, ts in TICKERS_BY_SECTOR.items() for t in ts}


class StocksSource(Source):
    """Daily OHLCV prices with the yfinance MultiIndex→records flattening.

    Protocol (reference sources/stocks.py:72-139): one download call for the
    whole ticker list over a lookback window; the returned pandas frame has
    MultiIndex (ticker, field) columns for >1 ticker and flat field columns
    for exactly 1; tickers absent from the response are skipped. Transform
    (stocks.py:149-185): composite key ``{ticker}_{date}``, sector lookup,
    and NaN→NULL scrubbing for every price/volume field — done Spark-side
    with functions.scrub_nan instead of per-row Python.

    The downloader is injected: ``download(tickers, start, end) -> pandas
    DataFrame`` (yfinance.download shape). ``today`` is injectable so tests
    pin the lookback window deterministically.
    """

    dataset_id = "stocks"
    table_id = "raw_prices"
    primary_key = "id"
    schema = T.StructType(
        [
            T.StructField("id", T.StringType(), False),
            T.StructField("ticker", T.StringType(), False),
            T.StructField("sector", T.StringType()),
            T.StructField("date", T.StringType(), False),
            T.StructField("open", T.DoubleType()),
            T.StructField("high", T.DoubleType()),
            T.StructField("low", T.DoubleType()),
            T.StructField("close", T.DoubleType()),
            T.StructField("adj_close", T.DoubleType()),
            T.StructField("volume", T.DoubleType()),  # scrubbed → long in transform
            T.StructField("fetched_at", T.StringType()),
        ]
    )

    _FIELDS = {
        "open": "Open",
        "high": "High",
        "low": "Low",
        "close": "Close",
        "adj_close": "Adj Close",
        "volume": "Volume",
    }

    def __init__(
        self,
        download,
        *,
        lookback_days: int = 30,
        tickers: Optional[list] = None,
        today=None,
        clock=None,
    ):
        self._download = download
        self.lookback_days = lookback_days
        self.tickers = list(tickers) if tickers else list(ALL_TICKERS)
        self._today = today  # date | None
        self._clock = clock  # () -> iso str | None

    def fetch(self, spark: SparkSession) -> Iterable[dict]:
        from datetime import date, timedelta

        end = self._today or date.today()
        start = end - timedelta(days=self.lookback_days)
        df = self._download(self.tickers, start.isoformat(), end.isoformat())
        if df is None or df.empty:
            return []
        fetched_at = self._clock() if self._clock else datetime.utcnow().isoformat()

        def rec(ticker, date_idx, row):
            out = {"ticker": ticker, "date": date_idx.strftime("%Y-%m-%d")}
            for name, src_col in self._FIELDS.items():
                out[name] = row.get(src_col)
            out["fetched_at"] = fetched_at
            return out

        records = []
        if len(self.tickers) == 1:  # flat columns, no MultiIndex
            t = self.tickers[0]
            records.extend(rec(t, idx, row) for idx, row in df.iterrows())
        else:
            present = df.columns.get_level_values(0)
            for t in self.tickers:
                if t not in present:
                    continue  # yfinance omits tickers with no data
                records.extend(rec(t, idx, row) for idx, row in df[t].iterrows())
        return records

    def transform(self, spark: SparkSession, raw: Iterable[dict]):
        from pyspark.sql import functions as F

        from ..functions import scrub_nan

        rows = [
            {
                "id": f"{r['ticker']}_{r['date']}",
                "sector": TICKER_TO_SECTOR.get(r["ticker"]),
                **{k: (float(v) if v is not None else None) if k in self._FIELDS else v
                   for k, v in r.items()},
            }
            for r in raw
        ]
        df = spark.createDataFrame(rows, schema=self.schema)
        for name in self._FIELDS:
            df = df.withColumn(name, scrub_nan(F.col(name)))
        return df.withColumn("volume", F.col("volume").cast("long"))


# ---------------------------------------------------------------------------
# Google Trends: 5-keyword batched interest-over-time (reference
# sources/trends.py)
# ---------------------------------------------------------------------------

TRENDS_BATCH = 5  # pytrends payload limit (reference trends.py:83)
TRENDS_RATE_LIMIT_DELAY = 5  # seconds between batches (trends.py:22)


class TrendsSource(Source):
    """Keyword interest-over-time with the pytrends batching protocol.

    Protocol (reference sources/trends.py:72-132): keywords are fetched in
    batches of 5 (the pytrends payload cap) with a 5 s inter-batch delay —
    but NOT after the last batch; a keyword missing from a response frame is
    skipped; an empty frame skips the whole batch. Transform (trends.py:139
    -151): key ``{keyword}_{date}_{geo}``, integer interest, geo recorded as
    'WORLD' when unset.

    ``fetch_batch(keywords, timeframe, geo) -> pandas DataFrame`` is the
    injected pytrends stand-in (date index, one column per keyword, plus an
    optional isPartial column). ``sleep`` is injectable so tests assert the
    rate-limit protocol without waiting.
    """

    dataset_id = "trends"
    table_id = "raw_interest_over_time"
    primary_key = "id"
    schema = T.StructType(
        [
            T.StructField("id", T.StringType(), False),
            T.StructField("keyword", T.StringType(), False),
            T.StructField("date", T.StringType(), False),
            T.StructField("interest", T.IntegerType()),
            T.StructField("is_partial", T.BooleanType()),
            T.StructField("geo", T.StringType()),
            T.StructField("fetched_at", T.StringType()),
        ]
    )

    def __init__(
        self,
        fetch_batch,
        *,
        keywords: list,
        timeframe: str = "today 3-m",
        geo: str = "US",
        sleep=None,
        clock=None,
    ):
        if not keywords:
            raise ValueError("TrendsSource requires a non-empty keyword list")
        self._fetch_batch = fetch_batch
        self.keywords = list(keywords)
        self.timeframe = timeframe
        self.geo = geo
        self._sleep = sleep
        self._clock = clock

    def fetch(self, spark: SparkSession) -> Iterable[dict]:
        import time as _time

        do_sleep = self._sleep or _time.sleep
        fetched_at = self._clock() if self._clock else datetime.utcnow().isoformat()
        out = []
        for i in range(0, len(self.keywords), TRENDS_BATCH):
            batch = self.keywords[i : i + TRENDS_BATCH]
            df = self._fetch_batch(batch, self.timeframe, self.geo)
            if df is not None and not df.empty:
                for kw in batch:
                    if kw not in df.columns:
                        continue  # keyword dropped from the response
                    for idx, row in df.iterrows():
                        out.append(
                            {
                                "keyword": kw,
                                "date": idx,
                                "interest": row[kw],
                                "is_partial": bool(row.get("isPartial", False)),
                                "geo": self.geo or "WORLD",
                                "fetched_at": fetched_at,
                            }
                        )
            if i + TRENDS_BATCH < len(self.keywords):  # never after the last batch
                do_sleep(TRENDS_RATE_LIMIT_DELAY)
        return out

    def transform(self, spark: SparkSession, raw: Iterable[dict]):
        rows = [
            {
                "id": f"{r['keyword']}_{r['date'].strftime('%Y-%m-%d')}_{r['geo']}",
                "keyword": r["keyword"],
                "date": r["date"].strftime("%Y-%m-%d"),
                "interest": int(r["interest"]),
                "is_partial": r["is_partial"],
                "geo": r["geo"],
                "fetched_at": r["fetched_at"],
            }
            for r in raw
        ]
        return spark.createDataFrame(rows, schema=self.schema)
