"""Feature-engineering operators: hashing-trick vectorization, leakage-safe
target encoding, JSON schema inference, and multi-touch attribution.

The ML-prep layer between a cleaned corpus / fact table and a training job:

* ``feat_hash_vectorizer`` — the hashing trick (Weinberger et al. 2009 /
  scikit-learn ``HashingVectorizer``): token → signed bucket via a shared
  md5-derived hash, corpus-level bucket census (hits, distinct terms =
  collision load, signed feature sum). No vocabulary build, no driver state —
  the property that makes it the 100 TB featurizer.
* ``feat_target_encode_kfold`` — K-fold out-of-fold target encoding: each
  fold's category mean is computed from the OTHER folds only (the standard
  leakage guard), entirely in integer cents: oof mean = (S_cat − S_fold) DIV
  (n_cat − n_fold). The per-row encode is a broadcast join of this ≤|cat|·K
  cell table back onto the facts; the catalog query outputs the cell table
  with the full-mean gap so the leakage correction is visible.
* ``ops_json_schema_infer`` — semi-structured schema census: per JSON key,
  presence/fill and a value-type histogram (int / float / bool / string by
  lexical shape), over the real ``events.props`` column plus a second JSON
  column constructed in-query from ``orders`` (mixed types, partial-fill key)
  so the census is exercised on more than one shape.
* ``events_attribution_linear`` — linear multi-touch attribution: each
  purchase's value is split equally over the user's views in the prior 7
  days, in exact integer micro-cents with floor division; the remainder and
  the unattributed (view-less) value are accounted per week and the output
  carries an in-query conservation proof column (≡ 0).

Scale notes on each operator; everything is hash-agg / equi-join shaped —
the one pair join (attribution) is keyed on user_id with calendar-bounded
per-user fan-out.
"""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from . import Tables, register
from .sketches import _h_spark, _h_sql

# ---------------------------------------------------------------------------
# feat_hash_vectorizer: hashing-trick bucket census over document tokens.
# bucket = h mod 64, sign = parity of the next hash bit (h div 64) — one
# shared md5 per token instance, no vocabulary. Census per bucket:
# instance hits, distinct terms (collision load), signed feature sum (what
# a linear model would see summed over the corpus).
# Scale: explode → two hash aggregates (instance counts map-side combine;
# distinct terms via (bucket, term) pre-distinct). Output is 64 rows at any
# corpus size.
# ---------------------------------------------------------------------------
_FH_B = 64


@register(
    "feat_hash_vectorizer",
    extra=True,
    sql=f"""
    WITH tok AS (
      SELECT unnest(regexp_split_to_array(lower(trim(text)), '\\s+')) AS w
      FROM documents),
    hashed AS (
      SELECT w, {_h_sql('w')} % {_FH_B} AS bucket,
             CASE WHEN ({_h_sql('w')} // {_FH_B}) % 2 = 0 THEN 1 ELSE -1 END AS sign
      FROM tok),
    inst AS (
      SELECT bucket, count(*) AS n_hits,
             CAST(sum(sign) AS BIGINT) AS feat_sum
      FROM hashed GROUP BY bucket),
    terms AS (
      SELECT bucket, count(*) AS n_terms
      FROM (SELECT DISTINCT bucket, w FROM hashed) GROUP BY bucket)
    SELECT i.bucket, i.n_hits, t.n_terms, i.feat_sum
    FROM inst i JOIN terms t ON i.bucket = t.bucket
    ORDER BY i.bucket
    """,
)
def feat_hash_vectorizer(spark, sf_dir):
    t = Tables(spark, sf_dir)
    tok = t.documents.select(
        F.explode(F.split(F.lower(F.trim(F.col("text"))), r"\s+")).alias("w")
    )
    h = _h_spark("w")
    hashed = tok.select(
        "w",
        F.expr(f"{h} % {_FH_B}").alias("bucket"),
        F.expr(f"CASE WHEN ({h} DIV {_FH_B}) % 2 = 0 THEN 1 ELSE -1 END").alias("sign"),
    )
    inst = hashed.groupBy("bucket").agg(
        F.count("*").alias("n_hits"), F.sum("sign").cast("long").alias("feat_sum")
    )
    terms = (
        hashed.select("bucket", "w")
        .distinct()
        .groupBy("bucket")
        .agg(F.count("*").alias("n_terms"))
    )
    return (
        inst.join(terms, "bucket")
        .select("bucket", "n_hits", "n_terms", "feat_sum")
        .orderBy("bucket")
    )


# ---------------------------------------------------------------------------
# feat_target_encode_kfold: K-fold out-of-fold target encoding of
# o_orderpriority against the order total, all-integer. The oof mean for
# (category, fold) uses only rows OUTSIDE the fold; leakage_gap shows how
# far each fold's encode sits from the full-data mean (the quantity k-fold
# encoding exists to de-bias). Encode table is ≤ |categories|·K rows —
# broadcast-join it back onto facts to materialize per-row features.
# Scale: one hash aggregate over the facts, then window sums over the tiny
# cell frame. Integer division truncates identically in both engines (all
# sums positive).
# ---------------------------------------------------------------------------
_TE_K = 5


@register(
    "feat_target_encode_kfold",
    extra=True,
    sql=f"""
    WITH cells AS (
      SELECT o_orderpriority AS category, o_orderkey % {_TE_K} AS fold,
             count(*) AS n_rows,
             CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS s_cents
      FROM orders GROUP BY 1, 2),
    tot AS (
      SELECT *, sum(n_rows) OVER (PARTITION BY category) AS n_cat,
             sum(s_cents) OVER (PARTITION BY category) AS s_cat
      FROM cells)
    SELECT category, CAST(fold AS BIGINT) AS fold, n_rows,
           CAST((s_cat - s_cents) // (n_cat - n_rows) AS BIGINT) AS oof_mean_cents,
           CAST(s_cat // n_cat AS BIGINT) AS full_mean_cents,
           CAST((s_cat - s_cents) // (n_cat - n_rows) - s_cat // n_cat AS BIGINT)
             AS leakage_gap_cents
    FROM tot ORDER BY category, fold
    """,
)
def feat_target_encode_kfold(spark, sf_dir):
    t = Tables(spark, sf_dir)
    cells = t.orders.groupBy(
        F.col("o_orderpriority").alias("category"),
        (F.col("o_orderkey") % _TE_K).alias("fold"),
    ).agg(
        F.count("*").alias("n_rows"),
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).cast("long").alias("s_cents"),
    )
    wc = W.partitionBy("category")
    tot = cells.withColumn("n_cat", F.sum("n_rows").over(wc)).withColumn(
        "s_cat", F.sum("s_cents").over(wc)
    )
    oof = F.expr("(s_cat - s_cents) DIV (n_cat - n_rows)")
    full = F.expr("s_cat DIV n_cat")
    return tot.select(
        "category",
        F.col("fold").cast("long").alias("fold"),
        "n_rows",
        oof.cast("long").alias("oof_mean_cents"),
        full.cast("long").alias("full_mean_cents"),
        (oof - full).cast("long").alias("leakage_gap_cents"),
    ).orderBy("category", "fold")


def encode_with_oof_means(facts, cell_table):
    """Materialize per-row out-of-fold features: broadcast the ≤|cat|·K cell
    table onto the facts. Exposed for pipelines; the catalog query ships the
    cell table itself (per-row output would grow with the facts)."""
    return facts.join(
        F.broadcast(cell_table.select("category", "fold", "oof_mean_cents")),
        ["category", "fold"],
        "left",
    )


# ---------------------------------------------------------------------------
# ops_json_schema_infer: schema census for semi-structured columns — per
# (source, key): presence, fill ppm, lexical type histogram, distinct
# values. Runs over events.props (real JSON) plus an orders-derived JSON
# built identically in both engines (integer / string / partial-fill bool —
# no floats in the payload, so no float-formatting divergence).
# Scale: explode keys (bounded per row by key count) → one hash aggregate;
# per-source totals via window over the tiny key frame.
# ---------------------------------------------------------------------------
_ORD_JSON_SQL = (
    "'{' || '\"okey\": ' || o_orderkey || ', \"cents\": ' || "
    "CAST(round(o_totalprice * 100) AS BIGINT) || "
    "', \"prio\": \"' || o_orderpriority || '\"' || "
    "CASE WHEN o_totalprice > 150000 THEN ', \"big\": true' ELSE '' END || '}'"
)

_INT_RE = "^-?[0-9]+$"
_FLOAT_RE = r"^-?[0-9]*\.[0-9]+([eE][+-]?[0-9]+)?$"


@register(
    "ops_json_schema_infer",
    extra=True,
    sql=f"""
    WITH js AS (
      SELECT 'events.props' AS source, props AS j FROM events
      UNION ALL
      SELECT 'orders.synth' AS source, {_ORD_JSON_SQL} AS j FROM orders),
    keyed AS (
      SELECT source, j, unnest(json_keys(j)) AS key FROM js),
    vals AS (
      SELECT source, key, json_extract_string(j, '$.' || key) AS v FROM keyed),
    census AS (
      SELECT source, key,
             count(*) AS n_present,
             count(DISTINCT v) AS n_distinct,
             CAST(count_if(regexp_full_match(v, '{_INT_RE.strip("^$")}')) AS BIGINT) AS n_int,
             CAST(count_if(regexp_full_match(v, '{_FLOAT_RE.strip("^$")}')) AS BIGINT) AS n_float,
             CAST(count_if(v IN ('true', 'false')
                      AND NOT regexp_full_match(v, '{_INT_RE.strip("^$")}')) AS BIGINT) AS n_bool,
             CAST(count_if(NOT regexp_full_match(v, '{_INT_RE.strip("^$")}')
                      AND NOT regexp_full_match(v, '{_FLOAT_RE.strip("^$")}')
                      AND v NOT IN ('true', 'false')) AS BIGINT) AS n_str
      FROM vals GROUP BY source, key),
    totals AS (
      SELECT 'events.props' AS source, count(*) AS n_rows FROM events
      UNION ALL
      SELECT 'orders.synth' AS source, count(*) AS n_rows FROM orders)
    SELECT c.source, c.key, c.n_present,
           CAST(c.n_present * 1000000 // t.n_rows AS BIGINT) AS fill_ppm,
           c.n_distinct, c.n_int, c.n_float, c.n_bool, c.n_str
    FROM census c JOIN totals t ON c.source = t.source
    ORDER BY c.source, c.key
    """,
)
def ops_json_schema_infer(spark, sf_dir):
    t = Tables(spark, sf_dir)
    ord_json = F.expr(
        """concat('{', '"okey": ', o_orderkey, ', "cents": ',
                  CAST(round(o_totalprice * 100) AS BIGINT),
                  ', "prio": "', o_orderpriority, '"',
                  CASE WHEN o_totalprice > 150000 THEN ', "big": true' ELSE '' END,
                  '}')"""
    )
    js = t.events.select(F.lit("events.props").alias("source"), F.col("props").alias("j")).unionByName(
        t.orders.select(F.lit("orders.synth").alias("source"), ord_json.alias("j"))
    )
    # parse each JSON document ONCE: from_json to map<string,string>
    # preserves every scalar's lexical form (numbers keep their text,
    # booleans become 'true'/'false') exactly like get_json_object, but
    # the old json_object_keys + per-key get_json_object(concat('$.',key))
    # re-parsed the document once per key with an uncacheable dynamic path
    # (guide §1.2 per-task work: measured 5.1 s -> 1.8 s for this stage at
    # sf0.1; equivalence pinned in tests/test_optimization_r09.py)
    vals = js.select(
        "source",
        F.explode(F.expr("from_json(j, 'map<string,string>')")).alias("key", "v"),
    )
    is_int = F.col("v").rlike(_INT_RE)
    is_float = F.col("v").rlike(_FLOAT_RE)
    is_bool = F.col("v").isin("true", "false") & ~is_int
    census = vals.groupBy("source", "key").agg(
        F.count("*").alias("n_present"),
        F.count_distinct("v").alias("n_distinct"),
        F.count_if(is_int).cast("long").alias("n_int"),
        F.count_if(is_float).cast("long").alias("n_float"),
        F.count_if(is_bool).cast("long").alias("n_bool"),
        F.count_if(~is_int & ~is_float & ~F.col("v").isin("true", "false")).cast("long").alias("n_str"),
    )
    totals = t.events.agg(F.count("*").alias("n_rows")).select(
        F.lit("events.props").alias("source"), "n_rows"
    ).unionByName(
        t.orders.agg(F.count("*").alias("n_rows")).select(
            F.lit("orders.synth").alias("source"), "n_rows"
        )
    )
    return (
        census.join(F.broadcast(totals), "source")
        .select(
            "source",
            "key",
            "n_present",
            F.expr("CAST(n_present * 1000000 DIV n_rows AS BIGINT)").alias("fill_ppm"),
            "n_distinct",
            "n_int",
            "n_float",
            "n_bool",
            "n_str",
        )
        .orderBy("source", "key")
    )


# ---------------------------------------------------------------------------
# events_attribution_linear: linear multi-touch attribution with exact
# conservation. Each purchase's value (integer micro-cents) is split
# floor-equally across the user's views in [purchase − 7d, purchase); the
# floor remainder and the value of view-less purchases are accounted
# separately, and conservation_diff ≡ 0 proves value = credited + remainder
# + unattributed within every week, in-query.
# Scale: purchases and views meet on ONE user_id shuffle; per-user pair
# fan-out is bounded by the 7-day window × per-user activity. Weekly rollup
# is a calendar-bounded hash aggregate.
# ---------------------------------------------------------------------------
_ATTR_WINDOW_US = 7 * 86400 * 1_000_000


@register(
    "events_attribution_linear",
    extra=True,
    sql=f"""
    WITH p AS (
      SELECT user_id, epoch_us(ts) AS pus,
             CAST(round(value * 100) AS BIGINT) * 1000000 AS vmicro
      FROM events WHERE event_type = 'purchase'),
    v AS (
      SELECT user_id, epoch_us(ts) AS vus FROM events WHERE event_type = 'view'),
    matched AS (
      SELECT p.user_id, p.pus, p.vmicro, count(v.vus) AS n_views
      FROM p LEFT JOIN v
        ON p.user_id = v.user_id
       AND v.vus < p.pus AND v.vus >= p.pus - {_ATTR_WINDOW_US}
      GROUP BY 1, 2, 3),
    accounted AS (
      SELECT pus // (86400000000 * 7) AS week_bucket, vmicro, n_views,
             CASE WHEN n_views > 0 THEN (vmicro // n_views) * n_views ELSE 0 END
               AS credited,
             CASE WHEN n_views > 0 THEN vmicro - (vmicro // n_views) * n_views
                  ELSE 0 END AS remainder,
             CASE WHEN n_views = 0 THEN vmicro ELSE 0 END AS unattributed
      FROM matched)
    SELECT CAST(week_bucket AS BIGINT) AS week_bucket,
           count(*) AS n_purchases,
           CAST(count_if(n_views > 0) AS BIGINT) AS n_attributed,
           CAST(sum(vmicro) AS BIGINT) AS value_micro,
           CAST(sum(credited) AS BIGINT) AS credited_micro,
           CAST(sum(remainder) AS BIGINT) AS remainder_micro,
           CAST(sum(unattributed) AS BIGINT) AS unattributed_micro,
           CAST(sum(vmicro) - sum(credited) - sum(remainder) - sum(unattributed)
             AS BIGINT) AS conservation_diff
    FROM accounted GROUP BY week_bucket ORDER BY week_bucket
    """,
)
def events_attribution_linear(spark, sf_dir):
    t = Tables(spark, sf_dir)
    ev = t.events
    p = ev.where(F.col("event_type") == "purchase").select(
        "user_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("pus"),
        (F.round(F.col("value") * 100).cast("long") * 1000000).alias("vmicro"),
    )
    v = ev.where(F.col("event_type") == "view").select(
        F.col("user_id").alias("vuser"),
        F.unix_micros(F.col("ts").cast("timestamp")).alias("vus"),
    )
    matched = (
        p.join(
            v,
            (F.col("user_id") == F.col("vuser"))
            & (F.col("vus") < F.col("pus"))
            & (F.col("vus") >= F.col("pus") - _ATTR_WINDOW_US),
            "left",
        )
        .groupBy("user_id", "pus", "vmicro")
        .agg(F.count("vus").alias("n_views"))
    )
    per_view = F.expr("vmicro DIV n_views")
    accounted = matched.select(
        F.expr("pus DIV (86400000000 * 7)").alias("week_bucket"),
        "vmicro",
        "n_views",
        F.when(F.col("n_views") > 0, per_view * F.col("n_views")).otherwise(0).alias("credited"),
        F.when(F.col("n_views") > 0, F.col("vmicro") - per_view * F.col("n_views"))
        .otherwise(0)
        .alias("remainder"),
        F.when(F.col("n_views") == 0, F.col("vmicro")).otherwise(0).alias("unattributed"),
    )
    return (
        accounted.groupBy(F.col("week_bucket").cast("long").alias("week_bucket"))
        .agg(
            F.count("*").alias("n_purchases"),
            F.count_if(F.col("n_views") > 0).cast("long").alias("n_attributed"),
            F.sum("vmicro").cast("long").alias("value_micro"),
            F.sum("credited").cast("long").alias("credited_micro"),
            F.sum("remainder").cast("long").alias("remainder_micro"),
            F.sum("unattributed").cast("long").alias("unattributed_micro"),
            (
                F.sum("vmicro") - F.sum("credited") - F.sum("remainder") - F.sum("unattributed")
            )
            .cast("long")
            .alias("conservation_diff"),
        )
        .orderBy("week_bucket")
    )


# ---------------------------------------------------------------------------
# Point-in-time feature assembly (leakage-free): for every purchase event,
# the user's view count over the PRIOR 7 days — computed with a value-RANGE
# window ending at 1 microsecond before the event, so nothing at-or-after
# the label time can leak into the feature (the training-set-assembly rule
# feature stores enforce). The catalog output is the conversion profile per
# prior-engagement bucket: how purchase count/value scale with recent views.
#
# Scale design (100 TB): one user_id shuffle; the RANGE frame is bounded by
# the 7-day horizon (state per task = the sliding window, not the user
# history); the bucket rollup is a 4-key hash aggregate. All value math is
# exact integer cents with one floor division.
# ---------------------------------------------------------------------------
_PIT_7D_US = 7 * 24 * 3600 * 1_000_000


@register(
    "feat_point_in_time",
    extra=True,
    sql=f"""
    WITH e AS (
      SELECT user_id, event_type, epoch_us(ts) AS us,
             CAST(round(value * 100) AS BIGINT) AS cents
      FROM events),
    feat AS (
      SELECT user_id, event_type, cents,
             sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
               OVER (PARTITION BY user_id ORDER BY us
                     RANGE BETWEEN {_PIT_7D_US} PRECEDING AND 1 PRECEDING) AS pv
      FROM e),
    p AS (
      SELECT user_id, cents,
             CASE WHEN coalesce(pv, 0) >= 3 THEN '3+'
                  ELSE CAST(coalesce(pv, 0) AS VARCHAR) END AS views_bucket
      FROM feat WHERE event_type = 'purchase')
    SELECT views_bucket,
           CAST(count(*) AS BIGINT) AS n_purchases,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
           CAST(sum(cents) AS BIGINT) AS total_value_cents,
           CAST(sum(cents) // count(*) AS BIGINT) AS avg_value_cents
    FROM p GROUP BY views_bucket ORDER BY views_bucket
    """,
)
def feat_point_in_time(spark, sf_dir):
    t = Tables(spark, sf_dir)
    e = t.events.select(
        "user_id",
        "event_type",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    w = (
        W.partitionBy("user_id")
        .orderBy("us")
        .rangeBetween(-_PIT_7D_US, -1)
    )
    feat = e.select(
        "user_id",
        "event_type",
        "cents",
        F.sum(F.when(F.col("event_type") == "view", 1).otherwise(0)).over(w).alias("pv"),
    )
    p = feat.filter(F.col("event_type") == "purchase").select(
        "user_id",
        "cents",
        F.when(F.coalesce(F.col("pv"), F.lit(0)) >= 3, F.lit("3+"))
        .otherwise(F.coalesce(F.col("pv"), F.lit(0)).cast("string"))
        .alias("views_bucket"),
    )
    return (
        p.groupBy("views_bucket")
        .agg(
            F.count("*").cast("long").alias("n_purchases"),
            F.count_distinct("user_id").cast("long").alias("n_users"),
            F.sum("cents").cast("long").alias("total_value_cents"),
            F.expr("CAST(sum(cents) div count(*) AS BIGINT)").alias("avg_value_cents"),
        )
        .orderBy("views_bucket")
    )
