"""Hot-bucket cap for the sign-LSH similarity family (catalog/similarity.py).

Same scale contract as dedup's _MAX_BUCKET: buckets above the cap must never
enter the O(bucket²) pair self-join. At the test SFs the default cap (64)
never triggers (max bucket ≈ 16 at sf0.1), so these tests force it with a
low cap and assert the semantics directly:
  * capped buckets disappear from sim_lsh_bucketed's per-bucket output;
  * kept buckets are byte-identical to the uncapped run (the cap only
    removes work, never changes surviving results);
  * dedup_embedding_neardup reports the skipped buckets and its pair list
    shrinks accordingly.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_for_dumdums_spark.catalog import Tables
from etl_for_dumdums_spark.catalog.similarity import (
    _MAX_SIM_BUCKET,
    _bucketed_ivecs,
    _cap_buckets,
    dedup_embedding_neardup,
    sim_lsh_bucketed,
)

from .conftest import SF_SMOKE

_LOW_CAP = 4  # sf0.001 buckets run 1..6 docs, so this forcibly triggers


def test_cap_excludes_hot_buckets_from_pair_join(spark):
    iv = _bucketed_ivecs(Tables(spark, SF_SMOKE))
    sizes = {r["bucket"]: r["n"] for r in iv.groupBy("bucket").agg(F.count("*").alias("n")).collect()}
    assert max(sizes.values()) > _LOW_CAP, "fixture must contain hot buckets for this cap"

    small, hot = _cap_buckets(iv, _LOW_CAP)
    small_buckets = {r["bucket"] for r in small.select("bucket").distinct().collect()}
    hot_buckets = {r["bucket"] for r in hot.select("bucket").collect()}

    assert hot_buckets == {b for b, n in sizes.items() if n > _LOW_CAP}
    assert small_buckets == {b for b, n in sizes.items() if n <= _LOW_CAP}
    assert small_buckets.isdisjoint(hot_buckets)


def test_sim_lsh_bucketed_cap_only_removes_hot_buckets(spark):
    uncapped = sim_lsh_bucketed(spark, SF_SMOKE, max_bucket=10**9).collect()
    capped = sim_lsh_bucketed(spark, SF_SMOKE, max_bucket=_LOW_CAP).collect()

    by_bucket = {r["bucket"]: r for r in uncapped}
    capped_by_bucket = {r["bucket"]: r for r in capped}
    # every surviving bucket is within the cap and identical to the uncapped run
    for b, row in capped_by_bucket.items():
        assert row["bucket_size"] <= _LOW_CAP
        assert row == by_bucket[b]
    # and everything the cap removed was genuinely hot (or fell under the
    # n_pairs >= 5 floor only because it was hot)
    removed = set(by_bucket) - set(capped_by_bucket)
    assert all(by_bucket[b]["bucket_size"] > _LOW_CAP for b in removed)


def test_neardup_reports_skipped_buckets(spark):
    uncapped = dedup_embedding_neardup(spark, SF_SMOKE, max_bucket=10**9).collect()[0]
    capped = dedup_embedding_neardup(spark, SF_SMOKE, max_bucket=_LOW_CAP).collect()[0]

    assert uncapped["n_hot_buckets_skipped"] == 0
    assert capped["n_hot_buckets_skipped"] > 0
    # capping can only shrink the candidate pair list
    assert capped["n_neardup_pairs"] <= uncapped["n_neardup_pairs"]
    assert capped["n_docs_kept"] >= uncapped["n_docs_kept"]


def test_default_cap_is_the_minhash_cap():
    # one consistent escape-valve constant across the LSH family
    assert _MAX_SIM_BUCKET == 64


# --- sim_contrastive_triplets -------------------------------------------------


def _triplets(spark, max_bucket):
    from etl_for_dumdums_spark.catalog.similarity import sim_contrastive_triplets

    return sim_contrastive_triplets(spark, SF_SMOKE, max_bucket=max_bucket)


def test_triplets_argmax_matches_window_reference(spark):
    """The min-struct per-(anchor, is_pos) argmax must equal the plain
    row_number()-window rule the oracle states."""
    from pyspark.sql import Window as W

    from etl_for_dumdums_spark.catalog import ROUND_DP as DP
    from etl_for_dumdums_spark.catalog.similarity import (
        _DOT_SPARK,
        _NORM_SPARK,
        _IVEC_SPARK,
        _bucket_spark,
    )

    t = Tables(spark, SF_SMOKE)
    iv = t.embeddings.select(
        "vec_id",
        "label",
        F.expr(_IVEC_SPARK).alias("v"),
        F.expr(_NORM_SPARK.format(v=_IVEC_SPARK)).alias("nrm"),
        F.expr(_bucket_spark(_IVEC_SPARK)).alias("bucket"),
    )
    small, _ = _cap_buckets(iv, _MAX_SIM_BUCKET)
    a, b = small.alias("a"), small.alias("b")
    cand = a.join(
        b, (F.col("a.bucket") == F.col("b.bucket")) & (F.col("a.vec_id") != F.col("b.vec_id"))
    ).select(
        F.col("a.vec_id").alias("anchor_id"),
        F.col("a.label").alias("label"),
        F.col("b.vec_id").alias("neighbor_id"),
        (F.col("b.label") == F.col("a.label")).alias("is_pos"),
        F.round(
            F.expr(_DOT_SPARK.format(a="a.v", b="b.v"))
            / F.sqrt(F.col("a.nrm") * 1.0 * F.col("b.nrm")),
            DP,
        ).alias("cosine"),
    )
    w = W.partitionBy("anchor_id", "is_pos").orderBy(F.col("cosine").desc(), F.col("neighbor_id"))
    ref_best = cand.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1)
    ref = {
        (r["anchor_id"], r["is_pos"]): (r["neighbor_id"], r["cosine"])
        for r in ref_best.collect()
    }

    out = {r["anchor_id"]: r for r in _triplets(spark, _MAX_SIM_BUCKET).collect()}
    assert out, "smoke fixture must yield triplets"
    for anchor, row in out.items():
        assert (row["pos_id"], row["pos_cos"]) == ref[(anchor, True)]
        assert (row["neg_id"], row["neg_cos"]) == ref[(anchor, False)]
    # anchors missing from the output lack a same-bucket pos or neg candidate
    for (anchor, _), _v in ref.items():
        if anchor not in out:
            assert (anchor, True) not in ref or (anchor, False) not in ref


def test_triplets_semantics_and_hot_bucket_exclusion(spark):
    rows = _triplets(spark, _MAX_SIM_BUCKET).collect()
    assert rows
    for r in rows:
        assert r["pos_id"] != r["anchor_id"] and r["neg_id"] != r["anchor_id"]
        assert abs(r["margin"] - round(r["pos_cos"] - r["neg_cos"], 4)) < 1e-12

    # with a forcing cap, anchors in hot buckets vanish from the output
    iv = _bucketed_ivecs(Tables(spark, SF_SMOKE))
    sizes = {
        r["bucket"]: r["n"]
        for r in iv.groupBy("bucket").agg(F.count("*").alias("n")).collect()
    }
    hot = {b for b, n in sizes.items() if n > _LOW_CAP}
    assert hot, "fixture must contain hot buckets for this cap"
    bucket_of = {
        r["vec_id"]: r["bucket"] for r in iv.select("vec_id", "bucket").collect()
    }
    capped = _triplets(spark, _LOW_CAP).collect()
    assert all(bucket_of[r["anchor_id"]] not in hot for r in capped)
    # and surviving anchors are identical to the uncapped run
    full = {r["anchor_id"]: r for r in rows}
    for r in capped:
        assert r == full[r["anchor_id"]]
