"""FDA model-chain parity: regex categorization → array build → explode →
conditional distinct counts, matched against DuckDB running the same logic."""

import duckdb
import pytest

from etl_for_dumdums_spark.models.fda import (
    ALLERGEN_TOPICS,
    PATHOGEN_TOPICS,
    REACTION_CATEGORIES,
    RECALL_TOPICS,
    fct_events_by_gender,
    fct_events_by_reaction,
    fct_recalls_by_topic,
    int_food_event_reactions,
    int_recall_topics,
    stg_food_events,
)
from etl_for_dumdums_spark.schema import RAW_SCHEMAS

from .fixtures import gen_fda_events, gen_fda_recalls
from .oracle_util import assert_matches_duckdb


@pytest.fixture(scope="module")
def fda_env(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("fda")
    epath, rpath = str(base / "raw_food_events"), str(base / "raw_recalls")
    spark.createDataFrame(gen_fda_events(), RAW_SCHEMAS["fda_food.raw_food_events"]).write.parquet(
        epath
    )
    spark.createDataFrame(gen_fda_recalls(), RAW_SCHEMAS["fda_food.raw_recalls"]).write.parquet(
        rpath
    )
    con = duckdb.connect()
    con.execute(f"CREATE VIEW raw_food_events AS SELECT * FROM read_parquet('{epath}/*.parquet')")
    con.execute(f"CREATE VIEW raw_recalls AS SELECT * FROM read_parquet('{rpath}/*.parquet')")
    return spark.read.parquet(epath), spark.read.parquet(rpath), con


_STG_SQL = """
  WITH ranked AS (
    SELECT *, row_number() OVER (
        PARTITION BY report_number
        ORDER BY CASE WHEN products_role = 'Suspect' THEN 0 ELSE 1 END,
                 date_created DESC, products_brand_name ASC NULLS LAST) AS rn
    FROM raw_food_events),
  stg AS (
    SELECT *,
           CASE WHEN upper(trim(consumer_gender)) IN ('F', 'FEMALE') THEN 'Female'
                WHEN upper(trim(consumer_gender)) IN ('M', 'MALE') THEN 'Male'
                ELSE 'Unknown' END AS gender,
           coalesce(date_started, date_created) AS event_date,
           CAST(extract(year FROM coalesce(date_started, date_created)) AS INT) AS event_year
    FROM ranked WHERE rn = 1)
"""


def _cat_sql(col, categories):
    cases = ", ".join(
        f"CASE WHEN regexp_matches(lower(coalesce({col}, '')), '{pat}') THEN '{name}' END"
        for name, pat in categories
    )
    return (
        f"CASE WHEN len(list_filter([{cases}], x -> x IS NOT NULL)) = 0 THEN ['Other'] "
        f"ELSE list_filter([{cases}], x -> x IS NOT NULL) END"
    )


def test_stg_dedup_prefers_suspect(fda_env):
    raw, _, _ = fda_env
    stg = stg_food_events(raw)
    assert stg.count() == raw.select("report_number").distinct().count()
    # every report that has a Suspect row keeps role Suspect after dedup
    assert stg.filter(stg.products_role != "Suspect").count() == 0


def test_fct_events_by_reaction_matches_oracle(fda_env):
    raw, _, con = fda_env
    sql = f"""
    {_STG_SQL},
    reactions AS (
      SELECT report_number, outcomes, event_year,
             unnest({_cat_sql('reactions', REACTION_CATEGORIES)}) AS category
      FROM stg WHERE reactions IS NOT NULL)
    SELECT category,
           count(DISTINCT report_number) AS n_reports,
           count(DISTINCT CASE WHEN regexp_matches(lower(coalesce(outcomes, '')), 'hospitalization')
                               THEN report_number END) AS n_hospitalized,
           min(event_year) AS first_year,
           max(event_year) AS last_year
    FROM reactions GROUP BY category ORDER BY category
    """
    out = fct_events_by_reaction(int_food_event_reactions(stg_food_events(raw)))
    assert_matches_duckdb(out, con, sql)
    cats = {r["category"] for r in out.collect()}
    assert "Other" in cats and "Gastrointestinal" in cats


def test_fct_events_by_gender_matches_oracle(fda_env):
    raw, _, con = fda_env
    sql = f"""
    {_STG_SQL}
    SELECT gender,
           count(DISTINCT report_number) AS n_reports,
           count(DISTINCT CASE WHEN regexp_matches(lower(coalesce(outcomes, '')), 'hospitalization')
                               THEN report_number END) AS n_hospitalized,
           round(count(DISTINCT report_number) * 100.0
                 / sum(count(DISTINCT report_number)) OVER (), 4) AS pct_of_reports,
           round(count(DISTINCT CASE WHEN regexp_matches(lower(coalesce(outcomes, '')), 'hospitalization')
                                     THEN report_number END) * 100.0
                 / count(DISTINCT report_number), 4) AS pct_hospitalized
    FROM stg GROUP BY gender ORDER BY gender
    """
    assert_matches_duckdb(fct_events_by_gender(stg_food_events(raw)), con, sql)


def test_fct_recalls_by_topic_matches_oracle(fda_env):
    _, recalls, con = fda_env
    pathogens = ", ".join(f"'{t}'" for t in PATHOGEN_TOPICS)
    allergens = ", ".join(f"'{t}'" for t in ALLERGEN_TOPICS)
    sql = f"""
    WITH int_topics AS (
      SELECT recall_number, classification,
             unnest({_cat_sql('reason_for_recall', RECALL_TOPICS)}) AS topic
      FROM raw_recalls
      WHERE country = 'United States' AND recall_number != 'nan')
    SELECT topic, count(DISTINCT recall_number) AS n_recalls,
           count(DISTINCT CASE WHEN classification = 'Class I' THEN recall_number END) AS n_class_i
    FROM int_topics GROUP BY topic
    UNION ALL
    SELECT 'Pathogen (Any)', count(DISTINCT recall_number),
           count(DISTINCT CASE WHEN classification = 'Class I' THEN recall_number END)
    FROM int_topics WHERE topic IN ({pathogens})
    UNION ALL
    SELECT 'Allergen (Any)', count(DISTINCT recall_number),
           count(DISTINCT CASE WHEN classification = 'Class I' THEN recall_number END)
    FROM int_topics WHERE topic IN ({allergens})
    ORDER BY topic
    """
    assert_matches_duckdb(fct_recalls_by_topic(int_recall_topics(recalls)), con, sql)
