"""Join-dense mart parity: dim_users, fct_issues, fct_pull_requests,
fct_reviewer_activity, fct_oura_daily vs DuckDB on the same fixture data."""

import datetime as dt

import duckdb
import pytest

from etl_for_dumdums_spark.models.linear_github import (
    dim_users,
    fct_issues,
    fct_pull_requests,
    fct_reviewer_activity,
)
from etl_for_dumdums_spark.models.oura import fct_oura_daily, stg_daily_activity
from etl_for_dumdums_spark.schema import RAW_SCHEMAS

from .fixtures import gen_linear_github, gen_oura
from .oracle_util import assert_matches_duckdb

NOW = dt.datetime(2024, 3, 15, 12, 0, 0)


@pytest.fixture(scope="module")
def lg_env(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("lg")
    lu, gu, cy, li, pr, rv, cm = gen_linear_github()
    frames = {
        "linear_users": (lu, "linear.raw_users"),
        "github_users": (gu, "github.raw_users"),
        "cycles": (cy, "linear.raw_cycles"),
        "issues": (li, "linear.raw_issues"),
        "prs": (pr, "github.raw_pull_requests"),
        "reviews": (rv, "github.raw_pr_reviews"),
        "comments": (cm, "github.raw_pr_comments"),
    }
    con = duckdb.connect()
    dfs = {}
    for name, (rows, schema) in frames.items():
        path = str(base / name)
        spark.createDataFrame(rows, RAW_SCHEMAS[schema]).write.parquet(path)
        dfs[name] = spark.read.parquet(path)
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{path}/*.parquet')")
    return dfs, con


def test_dim_users_matches_oracle(lg_env):
    dfs, con = lg_env
    sql = """
    WITH l AS (SELECT id AS linear_user_id, lower(email) AS email, display_name,
                      name AS linear_name
               FROM linear_users WHERE email IS NOT NULL),
         g AS (SELECT id AS github_user_id, lower(email) AS email, login,
                      name AS github_name
               FROM github_users WHERE email IS NOT NULL)
    SELECT coalesce(l.email, g.email) AS email, linear_user_id, github_user_id,
           coalesce(display_name, linear_name, github_name, login) AS display_name,
           CASE WHEN linear_user_id IS NOT NULL AND github_user_id IS NOT NULL THEN 'both'
                WHEN linear_user_id IS NOT NULL THEN 'linear_only'
                ELSE 'github_only' END AS presence
    FROM l FULL OUTER JOIN g ON l.email = g.email
    ORDER BY email
    """
    out = dim_users(dfs["linear_users"], dfs["github_users"])
    assert_matches_duckdb(out, con, sql)
    assert out.filter(out.presence == "both").count() > 0  # case-insensitive matches exist


def test_fct_issues_matches_oracle(lg_env):
    dfs, con = lg_env
    sql = f"""
    WITH child_counts AS (
      SELECT parent_id AS issue_id, count(*) AS child_count
      FROM issues WHERE parent_id IS NOT NULL GROUP BY 1)
    SELECT i.id AS issue_id, i.identifier, i.state,
           u.display_name AS assignee_name,
           c.name AS cycle_name,
           p.identifier AS parent_identifier,
           coalesce(cc.child_count, 0) AS child_count,
           date_diff('day', CAST(i.created_at AS DATE), DATE '2024-03-15') AS days_open,
           (c.starts_at IS NOT NULL
            AND TIMESTAMP '{NOW:%Y-%m-%d %H:%M:%S}' BETWEEN c.starts_at AND c.ends_at)
             AS is_in_active_cycle
    FROM issues i
    LEFT JOIN linear_users u ON i.assignee_id = u.id
    LEFT JOIN cycles c ON i.cycle_id = c.id
    LEFT JOIN issues p ON i.parent_id = p.id
    LEFT JOIN child_counts cc ON i.id = cc.issue_id
    ORDER BY issue_id
    """
    out = fct_issues(dfs["issues"], dfs["linear_users"], dfs["cycles"], NOW)
    assert_matches_duckdb(out, con, sql)
    assert out.filter(out.child_count > 0).count() > 0
    assert out.filter(out.is_in_active_cycle).count() > 0


def test_fct_pull_requests_matches_oracle(lg_env):
    dfs, con = lg_env
    sql = """
    WITH review_stats AS (
      SELECT pull_request_id AS pr_id, count(*) AS review_count,
             count_if(state = 'APPROVED') AS approval_count,
             min(submitted_at) AS first_review_at
      FROM reviews GROUP BY 1),
    comment_stats AS (
      SELECT pull_request_id AS pr_id, count(*) AS comment_count
      FROM comments GROUP BY 1)
    SELECT p.id AS pr_id, p.repo, p.state, p.merged,
           coalesce(r.review_count, 0) AS review_count,
           coalesce(r.approval_count, 0) AS approval_count,
           coalesce(c.comment_count, 0) AS comment_count,
           coalesce(p.ready_for_review_at, p.created_at) AS ready_at,
           round(date_diff('second', coalesce(p.ready_for_review_at, p.created_at),
                           r.first_review_at) / 3600.0, 4) AS hours_to_first_review
    FROM prs p
    LEFT JOIN review_stats r ON p.id = r.pr_id
    LEFT JOIN comment_stats c ON p.id = c.pr_id
    ORDER BY pr_id
    """
    out = fct_pull_requests(dfs["prs"], dfs["reviews"], dfs["comments"])
    assert_matches_duckdb(out, con, sql)
    # approval_count <= review_count invariant (dbt expression test)
    assert out.filter(out.approval_count > out.review_count).count() == 0


def test_fct_reviewer_activity_matches_oracle(lg_env):
    dfs, con = lg_env
    sql = """
    WITH r AS (SELECT author_id AS participant_id, pull_request_id AS pr_id,
                      count(*) AS n_reviews FROM reviews GROUP BY 1, 2),
         c AS (SELECT author_id AS participant_id, pull_request_id AS pr_id,
                      count(*) AS n_comments FROM comments GROUP BY 1, 2),
    participation AS (
      SELECT coalesce(r.participant_id, c.participant_id) AS participant_id,
             coalesce(r.pr_id, c.pr_id) AS pr_id,
             coalesce(n_reviews, 0) AS n_reviews,
             coalesce(n_comments, 0) AS n_comments
      FROM r FULL OUTER JOIN c
        ON r.participant_id = c.participant_id AND r.pr_id = c.pr_id)
    SELECT pt.participant_id,
           count(DISTINCT pt.pr_id) AS prs_touched,
           sum(n_reviews) AS total_reviews,
           sum(n_comments) AS total_comments,
           sum(least(n_reviews + n_comments, 5)) AS capped_engagement
    FROM participation pt
    JOIN prs p ON pt.pr_id = p.id
    WHERE pt.participant_id != p.author_id
    GROUP BY pt.participant_id ORDER BY pt.participant_id
    """
    out = fct_reviewer_activity(dfs["prs"], dfs["reviews"], dfs["comments"])
    assert_matches_duckdb(out, con, sql)


@pytest.fixture(scope="module")
def oura_env(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("oura")
    sl, rd, ac, ss = gen_oura()
    frames = {
        "raw_sleep": (sl, "oura.raw_sleep"),
        "raw_readiness": (rd, "oura.raw_daily_readiness"),
        "raw_activity": (ac, "oura.raw_daily_activity"),
        "raw_sessions": (ss, "oura.raw_sleep_sessions"),
    }
    con = duckdb.connect()
    dfs = {}
    for name, (rows, schema) in frames.items():
        path = str(base / name)
        spark.createDataFrame(rows, RAW_SCHEMAS[schema]).write.parquet(path)
        dfs[name] = spark.read.parquet(path)
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{path}/*.parquet')")
    return dfs, con


def test_fct_oura_daily_matches_oracle(oura_env):
    dfs, con = oura_env
    activity = stg_daily_activity(dfs["raw_activity"])
    out = fct_oura_daily(dfs["raw_sleep"], dfs["raw_readiness"], activity, dfs["raw_sessions"])
    sql = """
    WITH act AS (
      SELECT * FROM (
        SELECT *, row_number() OVER (PARTITION BY day ORDER BY steps DESC, id) AS rn
        FROM raw_activity) WHERE rn = 1),
    spine AS (
      SELECT day FROM raw_sleep UNION SELECT day FROM raw_readiness
      UNION SELECT day FROM act UNION SELECT day FROM raw_sessions),
    sess AS (
      SELECT day,
             max(CASE WHEN sleep_type = 'long_sleep' THEN average_heart_rate END) AS long_sleep_hr,
             max(CASE WHEN sleep_type = 'nap' THEN average_heart_rate END) AS nap_hr,
             round(sum(total_sleep_duration_seconds / 3600.0), 4) AS total_sleep_hours,
             count(*) AS n_sessions
      FROM raw_sessions GROUP BY day),
    joined AS (
      SELECT sp.day, s.score AS sleep_score, r.score AS readiness_score,
             r.temperature_deviation, a.score AS activity_score, a.steps,
             sess.long_sleep_hr, sess.nap_hr, sess.total_sleep_hours, sess.n_sessions
      FROM spine sp
      LEFT JOIN raw_sleep s ON sp.day = s.day
      LEFT JOIN raw_readiness r ON sp.day = r.day
      LEFT JOIN act a ON sp.day = a.day
      LEFT JOIN sess ON sp.day = sess.day),
    scored AS (
      SELECT *,
             round((coalesce(sleep_score, 0) + coalesce(readiness_score, 0)
                    + coalesce(activity_score, 0)) * 1.0
                   / nullif((CASE WHEN sleep_score IS NOT NULL THEN 1 ELSE 0 END
                             + CASE WHEN readiness_score IS NOT NULL THEN 1 ELSE 0 END
                             + CASE WHEN activity_score IS NOT NULL THEN 1 ELSE 0 END), 0), 4)
               AS combined_wellness_score
      FROM joined)
    SELECT *,
           CASE WHEN combined_wellness_score >= 85 THEN 'excellent'
                WHEN combined_wellness_score >= 70 THEN 'good'
                WHEN combined_wellness_score >= 55 THEN 'fair'
                WHEN combined_wellness_score IS NOT NULL THEN 'poor'
                ELSE 'unknown' END AS wellness_category
    FROM scored ORDER BY day
    """
    assert_matches_duckdb(out, con, sql)
    cats = {r["wellness_category"] for r in out.collect()}
    assert {"good", "fair"} <= cats
