"""Parity for the last model chains: HN comment-sentiment and the remaining
FDA marts (monthly, by-product, by-state)."""

import duckdb
import pytest

from etl_for_dumdums_spark.models.fda import (
    REACTION_CATEGORIES,
    fct_events_by_product,
    fct_events_monthly,
    fct_recalls_by_state,
    int_food_event_reactions,
    stg_food_events,
)
from etl_for_dumdums_spark.models.hacker_news import (
    fct_hn_keyword_sentiment,
    int_hn_comment_keywords,
    int_hn_comment_sentiment,
    stg_hn_comments,
)
from etl_for_dumdums_spark.schema import RAW_SCHEMAS

from .fixtures import gen_fda_events, gen_fda_recalls, gen_hn_comments
from .oracle_util import assert_matches_duckdb
from .test_fda_models import _STG_SQL, _cat_sql


@pytest.fixture(scope="module")
def env(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("final")
    con = duckdb.connect()
    dfs = {}
    for name, rows, schema in [
        ("raw_comments", gen_hn_comments(), "hacker_news.raw_comments"),
        ("raw_food_events", gen_fda_events(), "fda_food.raw_food_events"),
        ("raw_recalls", gen_fda_recalls(), "fda_food.raw_recalls"),
    ]:
        path = str(base / name)
        spark.createDataFrame(rows, RAW_SCHEMAS[schema]).write.parquet(path)
        dfs[name] = spark.read.parquet(path)
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{path}/*.parquet')")
    return dfs, con


_KW_SQL = r"""
  stg AS (
    SELECT * FROM (
      SELECT *, row_number() OVER (PARTITION BY id ORDER BY posted_at DESC) AS rn
      FROM raw_comments) WHERE rn = 1),
  cleaned AS (
    SELECT id AS comment_id, story_id, posted_day, sentiment_score, sentiment_category,
           lower(trim(regexp_replace(
             replace(replace(replace(replace(replace(replace(replace(
               regexp_replace(text, '<[^>]+>', ' ', 'g'),
               '&amp;', '&'), '&lt;', '<'), '&gt;', '>'), '&quot;', '"'),
               '&#x27;', ''''), '&#39;', ''''), '&nbsp;', ' '),
             '\s+', ' ', 'g'))) AS low
    FROM stg),
  kw(keyword, pattern) AS (VALUES
    ('python', '\bpython\b'), ('rust', '\brust\b'), ('ai', '\bai\b'),
    ('gpt', '\bgpt-?4?\b'), ('database', '\bdatabases?\b')),
  hits AS (
    SELECT c.comment_id, c.story_id, c.posted_day, k.keyword,
           c.sentiment_score, abs(c.sentiment_score) AS sentiment_magnitude,
           c.sentiment_category
    FROM cleaned c CROSS JOIN kw k
    WHERE regexp_matches(c.low, k.pattern) AND c.sentiment_score IS NOT NULL)
"""


def test_fct_hn_keyword_sentiment_matches_oracle(env):
    dfs, con = env
    stg = stg_hn_comments(dfs["raw_comments"])
    out = fct_hn_keyword_sentiment(int_hn_comment_sentiment(int_hn_comment_keywords(stg), stg))
    sql = f"""
    WITH {_KW_SQL},
    daily AS (
      SELECT keyword, posted_day AS day,
             count(*) AS comment_count,
             count(DISTINCT story_id) AS story_count,
             round(avg(sentiment_score), 3) AS avg_sentiment,
             round(stddev(sentiment_score), 3) AS sentiment_stddev,
             round(avg(sentiment_magnitude), 3) AS avg_magnitude,
             round(100.0 * count_if(sentiment_category = 'positive') / count(*), 1) AS positive_pct,
             round(100.0 * count_if(sentiment_category = 'negative') / count(*), 1) AS negative_pct,
             round(100.0 * count_if(sentiment_category = 'neutral') / count(*), 1) AS neutral_pct,
             min(sentiment_score) AS min_sentiment,
             max(sentiment_score) AS max_sentiment
      FROM hits WHERE posted_day IS NOT NULL
      GROUP BY keyword, posted_day)
    SELECT *,
           avg_sentiment - lag(avg_sentiment) OVER w AS sentiment_dod_change,
           positive_pct - lag(positive_pct) OVER w AS positive_pct_dod_change
    FROM daily
    WINDOW w AS (PARTITION BY keyword ORDER BY day)
    ORDER BY keyword, day
    """
    assert_matches_duckdb(out, con, sql)
    assert out.count() > 50


_INT_SQL = f"""
  int_reactions AS (
    SELECT report_number, gender, outcomes, event_year,
           CAST(date_trunc('month', event_date) AS DATE) AS event_month_start,
           {_cat_sql('reactions', REACTION_CATEGORIES)} AS reaction_categories,
           CAST(len({_cat_sql('reactions', REACTION_CATEGORIES)}) AS INT) AS reaction_count,
           {', '.join(f"coalesce(regexp_matches(lower(coalesce(reactions, '')), '{pat}'), FALSE) AS has_{name.lower()}" for name, pat in REACTION_CATEGORIES)}
    FROM stg WHERE reactions IS NOT NULL)
"""


def test_fct_events_monthly_matches_oracle(env):
    dfs, con = env
    cat_counts = ", ".join(
        f"count_if(has_{name.lower()}) AS {name.lower()}_count" for name, _ in REACTION_CATEGORIES
    )
    sql = f"""
    {_STG_SQL}, {_INT_SQL}
    SELECT event_month_start AS month,
           count(DISTINCT report_number) AS event_count,
           {cat_counts},
           count(DISTINCT CASE WHEN regexp_matches(lower(coalesce(outcomes, '')), 'hospitalization')
                               THEN report_number END) AS hospitalization_count,
           count(DISTINCT CASE WHEN regexp_matches(lower(coalesce(outcomes, '')), 'death')
                               THEN report_number END) AS death_count,
           count_if(gender = 'Female') AS female_count,
           count_if(gender = 'Male') AS male_count,
           round(avg(reaction_count), 2) AS avg_reactions_per_event
    FROM int_reactions WHERE event_month_start IS NOT NULL
    GROUP BY event_month_start ORDER BY month
    """
    out = fct_events_monthly(int_food_event_reactions(stg_food_events(dfs["raw_food_events"])))
    assert_matches_duckdb(out, con, sql)


def test_fct_events_by_product_matches_oracle(env):
    dfs, con = env
    sql = f"""
    {_STG_SQL}, {_INT_SQL},
    base AS (
      SELECT s.report_number, s.products_industry_name,
             unnest(r.reaction_categories) AS category
      FROM stg s JOIN int_reactions r ON s.report_number = r.report_number),
    totals AS (
      SELECT products_industry_name AS industry,
             count(DISTINCT report_number) AS n_reports
      FROM stg GROUP BY 1),
    cat_ranked AS (
      SELECT products_industry_name AS industry, category,
             count(DISTINCT report_number) AS n,
             row_number() OVER (PARTITION BY products_industry_name
                                ORDER BY count(DISTINCT report_number) DESC, category) AS rn
      FROM base GROUP BY products_industry_name, category)
    SELECT t.industry, t.n_reports, r.category AS top_reaction,
           r.n AS top_reaction_reports
    FROM totals t LEFT JOIN cat_ranked r ON r.industry = t.industry AND r.rn = 1
    ORDER BY t.industry
    """
    stg = stg_food_events(dfs["raw_food_events"])
    out = fct_events_by_product(stg, int_food_event_reactions(stg))
    assert_matches_duckdb(out, con, sql)


def test_fct_recalls_by_state_matches_oracle(env, spark):
    dfs, con = env
    sql = """
    WITH lookup(state_code, state_name) AS (VALUES
      ('CA', 'California'), ('NY', 'New York'), ('TX', 'Texas'),
      ('IA', 'Iowa'), ('WA', 'Washington')),
    base AS (
      SELECT * FROM raw_recalls
      WHERE country = 'United States' AND recall_number != 'nan'),
    per_state AS (
      SELECT state,
             count(DISTINCT recall_number) AS n_recalls,
             count_if(classification = 'Class I') AS class_i_count,
             count_if(classification = 'Class II') AS class_ii_count,
             count_if(classification = 'Class III') AS class_iii_count
      FROM base GROUP BY state)
    SELECT p.state, coalesce(l.state_name, 'Unknown') AS state_name,
           p.n_recalls, p.class_i_count, p.class_ii_count, p.class_iii_count
    FROM per_state p LEFT JOIN lookup l ON p.state = l.state_code
    ORDER BY p.state
    """
    out = fct_recalls_by_state(dfs["raw_recalls"], spark)
    assert_matches_duckdb(out, con, sql)
    names = {r["state"]: r["state_name"] for r in out.collect()}
    assert names.get("ON") == "Unknown"  # non-US code falls through the lookup
