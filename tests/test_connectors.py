"""Recorded-fixture tests for the concrete per-API connectors.

Each transport replays recorded response pages and records what was
requested, so the tests pin the full pagination protocol (cursors, page
numbers, Link headers, next_tokens, early termination) plus the flattening
transforms and run_sync merge idempotency."""

from __future__ import annotations

from datetime import datetime, timezone

from etl_for_dumdums_spark.sources import run_sync
from etl_for_dumdums_spark.sources.connectors import (
    GitHubRestSource,
    LinearGraphQLSource,
    OuraTokenSource,
    TransportResponse,
)


def _issue(i, state="Done", labels=(), parent=None):
    return {
        "id": f"iss-{i}",
        "identifier": f"ENG-{i}",
        "title": f"Issue {i}",
        "state": {"name": state},
        "assignee": {"id": f"user-{i % 3}"} if i % 2 == 0 else None,
        "priority": i % 5,
        "estimate": float(i),
        "createdAt": "2024-01-01T00:00:00Z",
        "updatedAt": "2024-01-02T00:00:00Z",
        "project": {"name": "Core"},
        "labels": {"nodes": [{"name": lb} for lb in labels]},
        "cycle": {"id": "cyc-1"},
        "parent": parent,
    }


class LinearFixture:
    """Two GraphQL pages keyed by cursor."""

    def __init__(self):
        self.requests = []
        self.pages = {
            None: {
                "data": {
                    "issues": {
                        "nodes": [_issue(1, labels=("bug",)), _issue(2)],
                        "pageInfo": {"hasNextPage": True, "endCursor": "CUR1"},
                    }
                }
            },
            "CUR1": {
                "data": {
                    "issues": {
                        "nodes": [_issue(3, parent={"id": "iss-1", "identifier": "ENG-1"})],
                        "pageInfo": {"hasNextPage": False, "endCursor": None},
                    }
                }
            },
        }

    def __call__(self, query, variables):
        self.requests.append(variables)
        return TransportResponse(self.pages[variables["after"]])


def test_linear_cursor_pagination_and_flatten(spark):
    fx = LinearFixture()
    src = LinearGraphQLSource(fx)
    df = src.read(spark)
    rows = {r["id"]: r.asDict() for r in df.collect()}

    # protocol: two requests, second carries the endCursor of the first
    assert [v["after"] for v in fx.requests] == [None, "CUR1"]
    assert len(rows) == 3
    # nested flattening
    assert rows["iss-1"]["state"] == "Done"
    assert rows["iss-1"]["labels"] == ["bug"]
    assert rows["iss-1"]["parent_id"] is None
    assert rows["iss-3"]["parent_id"] == "iss-1"
    assert rows["iss-3"]["parent_identifier"] == "ENG-1"
    assert rows["iss-2"]["assignee_id"] == "user-2"
    assert rows["iss-1"]["assignee_id"] is None


def test_linear_errors_raise(spark):
    def transport(query, variables):
        return TransportResponse({"errors": [{"message": "rate limited"}]})

    src = LinearGraphQLSource(transport)
    try:
        src.fetch(spark)
        raise AssertionError("expected RuntimeError")
    except RuntimeError as e:
        assert "rate limited" in str(e)


def _pr(i, updated, user_id=7):
    return {
        "id": 1000 + i,
        "number": i,
        "title": f"PR {i}",
        "state": "closed",
        "draft": False,
        "user": {"id": user_id},
        "created_at": "2024-01-01T00:00:00Z",
        "updated_at": updated,
        "merged_at": None,
    }


class GitHubFixture:
    """Pages sorted by updated desc; records page numbers requested."""

    def __init__(self, pages):
        self.pages = pages
        self.requested_pages = []

    def __call__(self, url, params):
        self.requested_pages.append(params["page"])
        idx = params["page"] - 1
        payload = self.pages[idx] if idx < len(self.pages) else []
        links = {"next": {"url": "..."}} if idx + 1 < len(self.pages) else {}
        return TransportResponse(payload, links=links)


def test_github_link_header_pagination(spark):
    fx = GitHubFixture(
        [
            [_pr(5, "2024-03-05T00:00:00Z"), _pr(4, "2024-03-04T00:00:00Z")],
            [_pr(3, "2024-03-03T00:00:00Z")],
        ]
    )
    src = GitHubRestSource(fx, url="repos/acme/app/pulls", repo="acme/app")
    df = src.read(spark)
    assert fx.requested_pages == [1, 2]
    got = {r["number"]: r.asDict() for r in df.collect()}
    assert set(got) == {3, 4, 5}
    assert got[5]["author_id"] == "7"
    assert got[5]["repo"] == "acme/app"


def test_github_early_termination_on_cutoff(spark):
    fx = GitHubFixture(
        [
            [_pr(5, "2024-03-05T00:00:00Z"), _pr(4, "2024-03-01T00:00:00Z")],
            [_pr(3, "2024-02-01T00:00:00Z")],
        ]
    )
    src = GitHubRestSource(
        fx,
        url="repos/acme/app/pulls",
        since=datetime(2024, 3, 2, tzinfo=timezone.utc),
    )
    items = src.fetch(spark)
    # PR 4 is older than the cutoff → stop mid-page-1, never request page 2
    assert [p["number"] for p in items] == [5]
    assert fx.requested_pages == [1]


def test_github_search_items_envelope(spark):
    def transport(url, params):
        return TransportResponse({"items": [_pr(1, "2024-03-05T00:00:00Z")], "total_count": 1})

    src = GitHubRestSource(transport, url="search/issues")
    assert [p["number"] for p in src.fetch(spark)] == [1]


def _sleep(i, score=80):
    return {
        "id": f"slp-{i}",
        "day": f"2024-02-0{i}",
        "score": score,
        "contributors": {"deep_sleep": 70 + i, "efficiency": 90} if i != 2 else None,
    }


class OuraFixture:
    def __init__(self):
        self.requested_tokens = []
        self.pages = {
            None: {"data": [_sleep(1), _sleep(2)], "next_token": "TOK1"},
            "TOK1": {"data": [_sleep(3)]},  # no next_token → stop
        }

    def __call__(self, url, params):
        tok = params.get("next_token")
        self.requested_tokens.append(tok)
        return TransportResponse(self.pages[tok])


def test_oura_token_pagination_and_flatten(spark):
    fx = OuraFixture()
    src = OuraTokenSource(fx, url="usercollection/daily_sleep")
    df = src.read(spark)
    assert fx.requested_tokens == [None, "TOK1"]
    rows = {r["id"]: r.asDict() for r in df.collect()}
    assert len(rows) == 3
    assert rows["slp-1"]["contributor_deep_sleep"] == 71
    assert rows["slp-2"]["contributor_deep_sleep"] is None  # null contributors
    assert rows["slp-3"]["contributor_efficiency"] == 90


def test_run_sync_idempotent_per_connector(spark, tmp_path):
    """Syncing the same window twice must not duplicate rows; a changed row
    must be replaced (MERGE semantics) — per concrete connector."""
    fx = OuraFixture()
    src = OuraTokenSource(fx, url="usercollection/daily_sleep")
    path = run_sync(spark, src, str(tmp_path))
    assert spark.read.parquet(path).count() == 3

    path = run_sync(spark, src, str(tmp_path))
    assert spark.read.parquet(path).count() == 3  # idempotent

    # overlap re-sync with an updated score replaces, not appends
    fx.pages["TOK1"] = {"data": [_sleep(3, score=55)]}
    run_sync(spark, src, str(tmp_path))
    got = spark.read.parquet(path)
    assert got.count() == 3
    assert got.filter("id = 'slp-3'").collect()[0]["score"] == 55


def test_with_retries_backs_off_then_succeeds(spark):
    from etl_for_dumdums_spark.sources.connectors import with_retries

    calls = {"n": 0}
    delays = []

    def flaky(url, params):
        calls["n"] += 1
        if calls["n"] < 3:
            raise ConnectionError("transient")
        return TransportResponse({"data": [], "next_token": None})

    t = with_retries(flaky, max_attempts=4, base_delay=0.1, sleep=delays.append)
    resp = t("u", {})
    assert resp.json()["data"] == []
    assert calls["n"] == 3
    assert delays == [0.1, 0.2]  # exponential backoff


def test_with_retries_exhausts(spark):
    from etl_for_dumdums_spark.sources.connectors import with_retries

    def dead(url, params):
        raise TimeoutError("down")

    t = with_retries(dead, max_attempts=3, base_delay=0, sleep=lambda s: None)
    try:
        t("u", {})
        raise AssertionError("expected TimeoutError")
    except TimeoutError:
        pass
