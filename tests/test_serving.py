from pyspark.sql import functions as F
from pyspark.sql import types as T

from etl_for_dumdums_spark.serving import LoaderRegistry
from etl_for_dumdums_spark.sources import throttled_detail_fetch


def test_loader_registry_caches_within_ttl(spark):
    clock = {"t": 0.0}
    reg = LoaderRegistry(ttl_seconds=300, clock=lambda: clock["t"])
    calls = {"n": 0}

    @reg.loader("numbers")
    def numbers(spark):
        calls["n"] += 1
        return spark.range(5)

    a = reg.load(spark, "numbers")
    b = reg.load(spark, "numbers")
    assert calls["n"] == 1 and a is b  # cache hit, loader not re-run

    clock["t"] = 301.0  # TTL expired → reload
    c = reg.load(spark, "numbers")
    assert calls["n"] == 2 and c is not a

    reg.invalidate()
    reg.load(spark, "numbers")
    assert calls["n"] == 3


def _fake_detail(key):
    return {"id": int(key), "detail": f"detail-{key}"}


def test_throttled_detail_fetch(spark):
    keys = spark.range(6).select(F.col("id"))
    out_schema = T.StructType(
        [
            T.StructField("id", T.LongType(), False),
            T.StructField("detail", T.StringType(), True),
        ]
    )
    out = throttled_detail_fetch(keys, _fake_detail, out_schema)
    rows = sorted((r["id"], r["detail"]) for r in out.collect())
    assert rows == [(i, f"detail-{i}") for i in range(6)]


def test_scrub_nan(spark):
    from etl_for_dumdums_spark.functions import scrub_nan

    df = spark.createDataFrame([(1.0,), (float("nan"),), (2.5,)], ["x"])
    got = [r["x"] for r in df.select(scrub_nan(F.col("x")).alias("x")).collect()]
    assert got[0] == 1.0 and got[1] is None and got[2] == 2.5
