"""Trends + Iowa mart parity tests vs DuckDB."""

import duckdb
import pytest

from etl_for_dumdums_spark.models.iowa import (
    fct_sales_by_county,
    fct_sales_monthly,
    fct_top_vendors,
)
from etl_for_dumdums_spark.models.trends import fct_keyword_trends
from etl_for_dumdums_spark.schema import RAW_SCHEMAS

from .fixtures import gen_iowa_sales, gen_trends
from .oracle_util import assert_matches_duckdb


@pytest.fixture(scope="module")
def env(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("ti")
    con = duckdb.connect()
    dfs = {}
    for name, rows, schema in [
        ("interest", gen_trends(), "trends.raw_interest_over_time"),
        ("sales", gen_iowa_sales(), "iowa_liquor.raw_sales"),
    ]:
        path = str(base / name)
        spark.createDataFrame(rows, RAW_SCHEMAS[schema]).write.parquet(path)
        dfs[name] = spark.read.parquet(path)
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{path}/*.parquet')")
    return dfs, con


def test_fct_keyword_trends_matches_oracle(env):
    dfs, con = env
    sql = """
    SELECT keyword, geo, date, interest,
           round(avg(interest) OVER (w ROWS BETWEEN 6 PRECEDING AND CURRENT ROW), 4)
             AS interest_7d_avg,
           round(avg(interest) OVER (w ROWS BETWEEN 29 PRECEDING AND CURRENT ROW), 4)
             AS interest_30d_avg,
           interest - lag(interest, 7) OVER w AS wow_change,
           interest - lag(interest, 30) OVER w AS mom_change,
           (lag(interest, 3) OVER w IS NOT NULL AND lead(interest, 3) OVER w IS NOT NULL
            AND interest >= max(interest) OVER (w ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING))
             AS is_local_peak,
           row_number() OVER (PARTITION BY keyword, geo ORDER BY date DESC) AS recency_rank
    FROM interest
    WINDOW w AS (PARTITION BY keyword, geo ORDER BY date)
    ORDER BY keyword, geo, date
    """
    out = fct_keyword_trends(dfs["interest"])
    assert_matches_duckdb(out, con, sql)
    assert out.filter(out.is_local_peak).count() > 0


def test_fct_sales_monthly_matches_oracle(env):
    dfs, con = env
    sql = """
    SELECT CAST(date_trunc('month', date) AS DATE) AS sale_month,
           count(*) AS n_transactions,
           round(sum(sale_dollars), 4) AS total_sales,
           round(sum(volume_sold_liters), 4) AS total_liters,
           sum(bottles_sold) AS total_bottles,
           round(sum(sale_dollars) / nullif(count(*), 0), 4) AS avg_transaction
    FROM sales GROUP BY 1 ORDER BY 1
    """
    assert_matches_duckdb(fct_sales_monthly(dfs["sales"]), con, sql)


def test_fct_sales_by_county_matches_oracle(env):
    dfs, con = env
    sql = """
    WITH base AS (SELECT * FROM sales WHERE county IS NOT NULL),
    totals AS (
      SELECT county, count(*) AS n_transactions,
             round(sum(sale_dollars), 4) AS total_sales,
             count(DISTINCT store_number) AS n_stores
      FROM base GROUP BY county),
    ranked AS (
      SELECT county, category_name, sum(sale_dollars) AS m,
             row_number() OVER (PARTITION BY county
                                ORDER BY sum(sale_dollars) DESC, category_name) AS rn
      FROM base GROUP BY county, category_name)
    SELECT t.*, r.category_name AS top_category, round(r.m, 4) AS top_category_sales
    FROM totals t JOIN ranked r ON t.county = r.county AND r.rn = 1
    ORDER BY t.county
    """
    assert_matches_duckdb(fct_sales_by_county(dfs["sales"]), con, sql)


def test_fct_top_vendors_matches_oracle(env):
    dfs, con = env
    sql = """
    WITH totals AS (
      SELECT vendor_name, round(sum(sale_dollars), 4) AS total_sales,
             sum(bottles_sold) AS total_bottles
      FROM sales GROUP BY vendor_name),
    ranked AS (
      SELECT vendor_name, item_description, sum(sale_dollars) AS m,
             row_number() OVER (PARTITION BY vendor_name
                                ORDER BY sum(sale_dollars) DESC, item_description) AS rn
      FROM sales GROUP BY vendor_name, item_description)
    SELECT t.*, r.item_description AS top_product, round(r.m, 4) AS top_product_sales
    FROM totals t JOIN ranked r ON t.vendor_name = r.vendor_name AND r.rn = 1
    ORDER BY t.vendor_name
    """
    assert_matches_duckdb(fct_top_vendors(dfs["sales"]), con, sql)
