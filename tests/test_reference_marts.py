"""Reference-mart parity tests: build the re-expressed dbt marts over
reference-shaped fixture data and hash-match them against DuckDB running
the reference's SQL logic on the same parquet."""

import duckdb
import pytest
from pyspark.sql import functions as F

from etl_for_dumdums_spark.models.hacker_news import (
    fct_hn_domain_stats,
    fct_hn_keyword_trends,
    fct_hn_weekly_stats,
    stg_hn_comments,
)
from etl_for_dumdums_spark.models.stocks import fct_sector_performance, fct_stock_prices
from etl_for_dumdums_spark.schema import PRIMARY_KEYS, RAW_SCHEMAS

from .fixtures import gen_hn_comments, gen_hn_stories, gen_stock_prices
from .oracle_util import assert_matches_duckdb


@pytest.fixture(scope="module")
def stock_env(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("stocks") / "raw_prices")
    raw = spark.createDataFrame(gen_stock_prices(), RAW_SCHEMAS["stocks.raw_prices"])
    raw.write.mode("overwrite").parquet(path)
    stg = spark.read.parquet(path).select(
        "ticker",
        "sector",
        F.col("date").alias("trade_date"),
        F.col("open").alias("open_price"),
        F.col("high").alias("high_price"),
        F.col("low").alias("low_price"),
        F.col("close").alias("close_price"),
        "volume",
    )
    con = duckdb.connect()
    con.execute(f"CREATE VIEW raw_prices AS SELECT * FROM read_parquet('{path}/*.parquet')")
    con.execute(
        """CREATE VIEW stg_prices AS
           SELECT ticker, sector, date AS trade_date, open AS open_price,
                  high AS high_price, low AS low_price, close AS close_price, volume
           FROM raw_prices"""
    )
    return stg, con


FCT_STOCK_SQL = """
WITH base AS (
  SELECT ticker, sector, trade_date, open_price, high_price, low_price, close_price, volume,
         lag(close_price) OVER w AS prev_close,
         round(avg(close_price) OVER (w ROWS BETWEEN 6 PRECEDING AND CURRENT ROW), 4) AS close_7d_ma,
         round(avg(close_price) OVER (w ROWS BETWEEN 29 PRECEDING AND CURRENT ROW), 4) AS close_30d_ma,
         round(avg(volume) OVER (w ROWS BETWEEN 6 PRECEDING AND CURRENT ROW), 4) AS volume_7d_avg,
         round(max(high_price) OVER (w ROWS BETWEEN 251 PRECEDING AND CURRENT ROW), 4) AS high_52w,
         round(min(low_price) OVER (w ROWS BETWEEN 251 PRECEDING AND CURRENT ROW), 4) AS low_52w,
         row_number() OVER (PARTITION BY ticker ORDER BY trade_date DESC) AS recency_rank,
         CASE WHEN avg(close_price) OVER (w ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
                   > avg(close_price) OVER (w ROWS BETWEEN 29 PRECEDING AND CURRENT ROW)
              THEN 'uptrend' ELSE 'downtrend' END AS ma_trend
  FROM stg_prices
  WINDOW w AS (PARTITION BY ticker ORDER BY trade_date))
SELECT *,
       round((close_price - prev_close) / nullif(prev_close, 0) * 100, 4) AS daily_change_pct,
       CASE WHEN volume > 1.5 * volume_7d_avg THEN 'high' ELSE 'normal' END AS volume_trend,
       round((close_price - low_52w) / nullif(high_52w - low_52w, 0) * 100, 4) AS pct_of_52w_range,
       round((open_price - prev_close) / nullif(prev_close, 0) * 100, 4) AS overnight_gap_pct
FROM base
"""


def test_fct_stock_prices_matches_oracle(stock_env):
    stg, con = stock_env
    assert_matches_duckdb(fct_stock_prices(stg), con, FCT_STOCK_SQL)


def test_fct_sector_performance_matches_oracle(stock_env):
    stg, con = stock_env
    sql = f"""
    WITH fct AS ({FCT_STOCK_SQL}),
    per_ticker AS (
      SELECT sector, ticker, round(sum(daily_change_pct), 4) AS period_change_pct
      FROM fct WHERE recency_rank <= 30 GROUP BY sector, ticker),
    ranked AS (
      SELECT *, row_number() OVER (PARTITION BY sector
                                   ORDER BY period_change_pct DESC, ticker) AS rn
      FROM per_ticker)
    SELECT a.sector, a.n_tickers, a.n_up, a.avg_change_pct,
           r.ticker AS best_performer, r.period_change_pct AS best_performer_pct
    FROM (SELECT sector, count(*) AS n_tickers,
                 count_if(period_change_pct > 0) AS n_up,
                 round(avg(period_change_pct), 4) AS avg_change_pct
          FROM per_ticker GROUP BY sector) a
    JOIN ranked r ON r.sector = a.sector AND r.rn = 1
    ORDER BY a.sector
    """
    stg_fct = fct_stock_prices(stg)
    assert_matches_duckdb(fct_sector_performance(stg_fct), con, sql)


@pytest.fixture(scope="module")
def hn_env(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("hn")
    spath, cpath = str(base / "raw_stories"), str(base / "raw_comments")
    spark.createDataFrame(gen_hn_stories(), RAW_SCHEMAS["hacker_news.raw_stories"]).write.parquet(
        spath
    )
    spark.createDataFrame(
        gen_hn_comments(), RAW_SCHEMAS["hacker_news.raw_comments"]
    ).write.parquet(cpath)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW raw_stories AS SELECT * FROM read_parquet('{spath}/*.parquet')")
    con.execute(f"CREATE VIEW raw_comments AS SELECT * FROM read_parquet('{cpath}/*.parquet')")
    return spark.read.parquet(spath), spark.read.parquet(cpath), con


def test_stg_hn_comments_dedup(hn_env):
    _, comments, con = hn_env
    out = stg_hn_comments(comments)
    n_ids = comments.select("id").distinct().count()
    assert out.count() == n_ids  # exactly one row per id
    # kept row is the latest posted_at
    latest = con.execute(
        "SELECT id, max(posted_at) FROM raw_comments GROUP BY id"
    ).fetchall()
    got = {r["id"]: r["posted_at"] for r in out.collect()}
    for cid, ts in latest:
        assert got[cid] == ts


def test_fct_hn_weekly_stats_matches_oracle(hn_env):
    stories, _, con = hn_env
    sql = """
    SELECT CAST(date_trunc('week', posted_at) AS DATE) AS week,
           count(*) AS story_count,
           count(DISTINCT author) AS unique_authors,
           round(avg(score), 4) AS avg_score,
           max(score) AS max_score,
           round(avg(descendants), 4) AS avg_comments
    FROM raw_stories GROUP BY 1 ORDER BY 1
    """
    assert_matches_duckdb(fct_hn_weekly_stats(stories), con, sql)


def test_fct_hn_keyword_trends_matches_oracle(hn_env):
    stories, _, con = hn_env
    sql = r"""
    WITH kw(keyword, pattern) AS (VALUES
      ('python', '\bpython\b'), ('rust', '\brust\b'), ('ai', '\bai\b'),
      ('gpt', '\bgpt-?4?\b'), ('database', '\bdatabases?\b')),
    m AS (
      SELECT CAST(date_trunc('week', s.posted_at) AS DATE) AS week, k.keyword
      FROM raw_stories s CROSS JOIN kw k
      WHERE regexp_matches(lower(s.title), k.pattern))
    SELECT week, keyword, count(*) AS mention_count
    FROM m GROUP BY week, keyword ORDER BY week, keyword
    """
    assert_matches_duckdb(fct_hn_keyword_trends(stories), con, sql)


def test_fct_hn_domain_stats_matches_oracle(hn_env):
    stories, _, con = hn_env
    sql = """
    SELECT CAST(date_trunc('week', posted_at) AS DATE) AS week, domain,
           count(*) AS story_count, round(avg(score), 4) AS avg_score
    FROM raw_stories
    WHERE domain IS NOT NULL AND domain != ''
    GROUP BY 1, 2 HAVING count(*) >= 3
    ORDER BY 1, 2
    """
    assert_matches_duckdb(fct_hn_domain_stats(stories), con, sql)


def test_all_raw_schemas_instantiate(spark):
    for name, schema in RAW_SCHEMAS.items():
        df = spark.createDataFrame([], schema)
        assert df.schema == schema
        assert PRIMARY_KEYS[name] in [f.name for f in schema.fields]
    assert len(RAW_SCHEMAS) == 18
