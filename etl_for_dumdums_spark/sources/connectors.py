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
