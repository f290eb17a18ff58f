from etl_for_dumdums_spark.checks import (
    CheckSuite,
    accepted_range,
    accepted_values,
    expression_is_true,
    not_null,
    relationships,
    unique,
)


def test_unique(spark):
    good = spark.createDataFrame([(1,), (2,)], ["id"])
    bad = spark.createDataFrame([(1,), (1,), (2,)], ["id"])
    assert unique(good, "id").passed
    res = unique(bad, "id")
    assert not res.passed and res.violations == 1  # one duplicated key


def test_not_null(spark):
    df = spark.createDataFrame([(1, "a"), (2, None)], ["id", "v"])
    assert not_null(df, "id").passed
    assert not not_null(df, "v").passed


def test_accepted_values_ignores_nulls(spark):
    df = spark.createDataFrame([("open",), ("closed",), (None,)], ["state"])
    assert accepted_values(df, "state", ["open", "closed"]).passed
    assert not accepted_values(df, "state", ["open"]).passed


def test_relationships(spark):
    parent = spark.createDataFrame([(1,), (2,)], ["id"])
    child_ok = spark.createDataFrame([(1,), (2,), (None,)], ["pid"])
    child_bad = spark.createDataFrame([(1,), (99,)], ["pid"])
    assert relationships(child_ok, "pid", parent, "id").passed
    res = relationships(child_bad, "pid", parent, "id")
    assert not res.passed and res.violations == 1


def test_expression_is_true_counts_nulls_as_violations(spark):
    df = spark.createDataFrame([(5,), (-1,), (None,)], ["x"])
    res = expression_is_true(df, "x >= 0")
    assert not res.passed and res.violations == 2


def test_accepted_range(spark):
    df = spark.createDataFrame([(0.5,), (1.0,), (-0.1,)], ["score"])
    assert not accepted_range(df, "score", 0.0, 1.0).passed
    assert accepted_range(df, "score", -1.0, 1.0).passed


def test_suite(spark):
    df = spark.createDataFrame([(1, "open"), (2, "closed")], ["id", "state"])
    suite = (
        CheckSuite()
        .add(unique, "id")
        .add(not_null, "id")
        .add(accepted_values, "state", ["open", "closed"])
    )
    results = suite.run(df)
    assert len(results) == 3 and all(r.passed for r in results)
