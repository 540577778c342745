"""Driver contract for the spark-graft builder (PySpark target).

``queries()`` exposes one entry per implemented operator family from
SURVEY.md §2; ``oracle_sql()`` gives the DuckDB-equivalent ANSI SQL. Both
sides alias computed columns identically and round floating aggregates so
the driver's order-insensitive value-hash is stable.

Engine operators under test here come from ``etl_framework_spark``
(LWW dedupe, set-based upsert resolution, text/dedup/similarity ops);
plain relational coverage uses the idiomatic DataFrame API so Catalyst
plans it (pushdown/broadcast visible via .explain).
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

sys.path.insert(0, str(Path(__file__).resolve().parent))

REPO_TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    # Pin UTC so timestamp rendering/literals agree with DuckDB's naive
    # timestamps regardless of the driver session's default TZ.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _materialize(df: DataFrame) -> DataFrame:
    """Detach a small result from its backing files (tmp dirs that the
    query deletes before returning).

    Collect-based on purpose: a ``toPandas()`` round-trip promotes
    nullable long columns to float64 (e.g. the change feed's ``_lsn``,
    NULL on delete rows), and a non-Arrow ``createDataFrame`` then
    rejects float for LongType — the round-3 driver red row
    (CORRECTNESS_r03 ``cdc_changes_feed``). ``Row`` objects preserve
    int/None exactly under both Arrow modes, so this helper is safe in
    any harness session. Only used on bounded entry-harness results.
    """
    return df.sparkSession.createDataFrame(df.collect(), schema=df.schema)


# --------------------------------------------------------------------------
# flagship
# --------------------------------------------------------------------------


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: LWW change-application (the engine's core operator, W1)
    over the events stream, enriched with per-user aggregates."""
    from etl_framework_spark.cdc import lww_dedupe

    sf_dir = "/root/testdata/sf0.001"
    events = _t(spark, sf_dir, "events")
    latest = lww_dedupe(events, keys=["user_id"], order_cols=["event_id"])
    stats = events.groupBy("user_id").agg(
        F.count("*").alias("n_events"),
        F.round(F.sum("value"), 2).alias("total_value"),
    )
    return (
        latest.select(
            "user_id",
            F.col("event_id").alias("last_event_id"),
            F.col("event_type").alias("last_type"),
        )
        .join(stats, "user_id")
        .orderBy("user_id")
    )


# --------------------------------------------------------------------------
# queries + oracles
# --------------------------------------------------------------------------


def q_filter_project(spark, sf):  # P7/S1: pushdown filter + projection
    li = _t(spark, sf, "lineitem")
    # floor(x*100+0.5)/100 instead of round(): identical IEEE ops on both
    # engines, immune to the decimal-string tie-break divergence between
    # Spark's BigDecimal rounding and DuckDB's binary rounding.
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return li.where(
        (F.col("l_shipdate") < "1996-01-01") & (F.col("l_discount") > 0.05)
    ).select(
        "l_orderkey",
        "l_linenumber",
        (F.floor(rev * 100 + F.lit(0.5)) / 100).alias("revenue"),
    )


def q_pricing_summary(spark, sf):  # A1-A5: TPC-H Q1 shape
    li = _t(spark, sf, "lineitem")
    return (
        li.where(F.col("l_shipdate") <= "1998-09-02")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("sum_disc_price"),
            F.round(
                F.sum(
                    F.col("l_extendedprice")
                    * (1 - F.col("l_discount"))
                    * (1 + F.col("l_tax"))
                ),
                2,
            ).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


def q_group_count(spark, sf):  # A6 + A3
    o = _t(spark, sf, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.count("*").alias("n_orders"),
        F.countDistinct("o_custkey").alias("n_customers"),
        F.round(F.avg("o_totalprice"), 2).alias("avg_price"),
    )


def q_monthly_revenue(spark, sf):  # month bucket scalar + grouped agg
    o = _t(spark, sf, "orders")
    return (
        o.groupBy(F.date_format("o_orderdate", "yyyy-MM").alias("order_month"))
        .agg(
            F.round(F.sum("o_totalprice"), 2).alias("revenue"),
            F.count("*").alias("n_orders"),
        )
    )


def q_topk(spark, sf):  # O1: ORDER BY + LIMIT (TakeOrderedAndProject)
    o = _t(spark, sf, "orders")
    return o.orderBy(F.desc("o_totalprice"), F.asc("o_orderkey")).limit(10).select(
        "o_orderkey", "o_custkey", F.round("o_totalprice", 2).alias("o_totalprice")
    )


def q_join_agg(spark, sf):  # J1: multi-way equi-join + agg
    """Revenue + distinct-order count per market segment.

    Plan choice (r3): pre-aggregate lineitem to ORDER grain first (one
    map-side-combinable shuffle collapses 4 lineitems/order), then join
    the |orders|-sized result to orders/customer and finish with a tiny
    segment aggregation using plain count. The naive formulation joins
    600k lineitems THROUGH orders/customer and pays a distinct-expand
    on o_orderkey — at 100x scale that's a 100x-wider shuffle and a
    second full-width distinct shuffle for no extra information."""
    li = _t(spark, sf, "lineitem")
    o = _t(spark, sf, "orders")
    c = _t(spark, sf, "customer")
    per_order = li.groupBy("l_orderkey").agg(
        F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("_rev")
    )
    return (
        per_order.join(o, per_order.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            F.round(F.sum("_rev"), 2).alias("revenue"),
            F.count("*").alias("n_orders"),
        )
    )


def q_broadcast_lookup(spark, sf):  # J4: broadcast dim joins
    c = _t(spark, sf, "customer")
    n = _t(spark, sf, "nation")
    r = _t(spark, sf, "region")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy(F.col("r_name").alias("region"))
        .agg(
            F.count("*").alias("n_customers"),
            F.round(F.sum("c_acctbal"), 2).alias("total_balance"),
        )
    )


def q_semi_join(spark, sf):  # J3/O3: EXISTS
    c = _t(spark, sf, "customer")
    o = _t(spark, sf, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select(
        "c_custkey", "c_mktsegment"
    )


def q_anti_join(spark, sf):  # J2/O4: NOT EXISTS (date-bounded so non-empty)
    c = _t(spark, sf, "customer")
    o = _t(spark, sf, "orders").where(F.col("o_orderdate") >= "1997-06-01")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_mktsegment"
    )


def q_lww_latest_event(spark, sf):  # W1: the engine's LWW operator
    from etl_framework_spark.cdc import lww_dedupe

    ev = _t(spark, sf, "events")
    latest = lww_dedupe(ev, keys=["user_id"], order_cols=["event_id"])
    return latest.select(
        "user_id",
        F.col("event_id").alias("last_event_id"),
        F.col("event_type").alias("last_type"),
        F.round("value", 4).alias("last_value"),
    )


def q_upsert_emulation(spark, sf):  # L5/L6: set-based upsert (base+delta)
    from etl_framework_spark.cdc import lww_dedupe

    ev = _t(spark, sf, "events")
    n = ev.count()
    base = ev.where(F.col("event_id") < n // 2)
    delta = ev.where(F.col("event_id") >= n // 2)
    merged = lww_dedupe(base.unionByName(delta), keys=["user_id"], order_cols=["event_id"])
    return merged.select(
        "user_id", F.col("event_id").alias("last_event_id"), "event_type"
    )


def q_running_total(spark, sf):  # W2-shape: ordered running aggregation
    from pyspark.sql import Window

    ev = _t(spark, sf, "events")
    w = Window.partitionBy("user_id").orderBy("event_id").rowsBetween(
        Window.unboundedPreceding, 0
    )
    return ev.select(
        "user_id",
        "event_id",
        F.round(F.sum("value").over(w), 2).alias("running_value"),
    )


def q_rank_topk_per_group(spark, sf):  # W3: top-3 orders per customer
    from pyspark.sql import Window

    o = _t(spark, sf, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        o.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= 3)
        .select(
            "o_custkey",
            "o_orderkey",
            F.round("o_totalprice", 2).alias("o_totalprice"),
            "rk",
        )
    )


def q_union_distinct(spark, sf):  # O2/O5
    ev = _t(spark, sf, "events")
    a = ev.where(F.col("event_type") == "purchase").select("user_id")
    b = ev.where(F.col("event_type") == "signup").select("user_id")
    return a.unionByName(b).distinct()


def q_intersect_users(spark, sf):  # O3 as set op
    ev = _t(spark, sf, "events")
    a = ev.where(F.col("event_type") == "purchase").select("user_id").distinct()
    b = ev.where(F.col("event_type") == "click").select("user_id").distinct()
    return a.intersect(b)


def q_scalar_functions(spark, sf):  # §2.8 scalar corpus
    o = _t(spark, sf, "orders")
    return o.select(
        "o_orderkey",
        F.concat_ws("-", F.lit("ord"), F.col("o_orderkey").cast("string")).alias("tag"),
        F.upper("o_orderpriority").alias("prio_upper"),
        F.year("o_orderdate").alias("order_year"),
        F.quarter("o_orderdate").alias("order_quarter"),
        F.datediff(F.lit("1999-01-01").cast("date"), F.col("o_orderdate").cast("date")).alias(
            "days_to_ref"
        ),
        F.when(F.col("o_totalprice") < 50000, "small")
        .when(F.col("o_totalprice") < 200000, "medium")
        .otherwise("large")
        .alias("size_class"),
        F.floor(F.col("o_totalprice") / 1000).cast("long").alias("price_k"),
    )


def q_conditional_agg(spark, sf):  # A-family: pivot-shaped conditional sums
    o = _t(spark, sf, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.sum(F.when(F.col("o_orderstatus") == "F", 1).otherwise(0)).alias("n_final"),
        F.sum(F.when(F.col("o_orderstatus") == "O", 1).otherwise(0)).alias("n_open"),
        F.sum(F.when(F.col("o_orderstatus") == "P", 1).otherwise(0)).alias("n_partial"),
        F.round(
            F.sum(F.when(F.col("o_orderstatus") == "F", F.col("o_totalprice")).otherwise(0.0)),
            2,
        ).alias("final_revenue"),
    )


def q_dedup_exact(spark, sf):  # exact dedupe: one survivor per text hash
    d = _t(spark, sf, "documents")
    return d.groupBy(F.md5("text").alias("text_hash")).agg(
        F.min("doc_id").alias("survivor_doc_id"),
        F.count("*").alias("n_copies"),
    )


def q_doc_quality(spark, sf):  # text quality scoring
    d = _t(spark, sf, "documents")
    toks = F.size(F.split(F.trim(F.col("text")), r"\s+"))
    return d.select(
        "doc_id",
        F.length("text").alias("text_len"),
        toks.alias("n_tokens"),
        F.round(F.length("text") / toks, 4).alias("avg_token_len"),
        (F.length("text") == F.col("n_chars")).alias("len_consistent"),
    )


def q_lang_stats(spark, sf):
    d = _t(spark, sf, "documents")
    return d.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.round(F.avg("n_chars"), 4).alias("avg_chars"),
        F.countDistinct("source").alias("n_sources"),
    )


def q_token_stats_by_source(spark, sf):
    d = _t(spark, sf, "documents")
    toks = F.size(F.split(F.trim(F.col("text")), r"\s+"))
    return d.groupBy("source").agg(
        F.sum(toks).alias("total_tokens"),
        F.round(F.avg(toks), 4).alias("avg_tokens"),
    )


def q_knn_cosine(spark, sf):  # brute-force cosine top-10 vs vec_id=0
    e = _t(spark, sf, "embeddings")
    qrow = e.where(F.col("vec_id") == 0).select("embedding").head()
    qvec = [float(x) for x in qrow["embedding"]]
    qlit = F.array(*[F.lit(x) for x in qvec])
    dot = F.aggregate(
        F.zip_with(F.col("embedding").cast("array<double>"), qlit, lambda a, b: a * b),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    norm_a = F.sqrt(
        F.aggregate(
            F.transform(F.col("embedding").cast("array<double>"), lambda a: a * a),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )
    norm_q = sum(x * x for x in qvec) ** 0.5
    sim = dot / (norm_a * F.lit(norm_q))
    return (
        e.where(F.col("vec_id") != 0)
        .select("vec_id", sim.alias("sim"))
        .orderBy(F.desc("sim"), F.asc("vec_id"))
        .limit(10)
        .select("vec_id", F.round("sim", 4).alias("sim"))
    )


def q_sessionize(spark, sf):  # sessionization: gap>1h starts a session
    from pyspark.sql import Window

    ev = _t(spark, sf, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w))
    new_sess = F.when(gap.isNull() | (gap > 3600), 1).otherwise(0)
    sess = F.sum(new_sess).over(
        Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
            Window.unboundedPreceding, 0
        )
    )
    return (
        ev.withColumn("session_id", sess)
        .groupBy("user_id")
        .agg(
            F.max("session_id").alias("n_sessions"),
            F.count("*").alias("n_events"),
        )
    )


def q_fill_forward(spark, sf):  # W2: ordered ffill/bfill (engine cleaner)
    from etl_framework_spark.transforms import fill_missing

    ev = _t(spark, sf, "events")
    # null-out click values deterministically, then fill them back
    with_nulls = ev.select(
        "user_id",
        "event_id",
        F.when(F.col("event_type") != "click", F.col("value")).alias("value"),
    )
    filled = fill_missing(
        with_nulls, order_by=["event_id"], columns=["value"], partition_by=["user_id"]
    )
    return filled.select("user_id", "event_id", F.round("value", 4).alias("value"))


def q_calc_program(spark, sf):  # §2.8 formula engine on orders
    from etl_framework_spark.transforms import MappingProgram

    o = _t(spark, sf, "orders")
    prog = MappingProgram.from_json(
        {
            "business_rules": {
                "tax_rate": 1.08,
                "status_names": {"O": "open", "F": "final", "P": "partial"},
            },
            "calculations": [
                {"name": "gross", "formula": "round(o_totalprice * tax_rate, 2)"},
                {
                    "name": "status_name",
                    "type": "lookup",
                    "lookup": "status_names",
                    "source_column": "o_orderstatus",
                    "default": "unknown",
                },
                {"name": "handling_fee", "value": 150.0},
                {
                    "name": "order_quarter",
                    "dialect": "pandas",
                    "formula": "o_orderdate.dt.quarter",
                },
            ],
        }
    )
    return prog.apply(o).select(
        "o_orderkey", "gross", "status_name", "handling_fee", "order_quarter"
    )


# --------------------------------------------------------------------------
# training-data pipeline operators (dedup / text / similarity / multimodal)
# --------------------------------------------------------------------------

_MINHASH_K = 16
_LSH_BANDS = 4
_LSH_ROWS = 4
_SIMHASH_BITS = 60  # full 15-hex-char token-hash entropy, sign-safe in SQL
_SIMHASH_MAXHAM = 3


def q_minhash_lsh_pairs(spark, sf):  # MinHash+LSH near-dup candidates
    from etl_framework_spark.operators import lsh_candidate_pairs, minhash_signatures

    d = _t(spark, sf, "documents")
    sigs = minhash_signatures(d, num_hashes=_MINHASH_K)
    return lsh_candidate_pairs(sigs, bands=_LSH_BANDS, rows_per_band=_LSH_ROWS, max_bucket=50)


def q_ngram_jaccard(spark, sf):  # exact n-gram Jaccard pairs
    from etl_framework_spark.operators import ngram_jaccard_pairs

    d = _t(spark, sf, "documents")
    out = ngram_jaccard_pairs(d, threshold=0.5)
    return out.select("a", "b", F.round("jaccard", 6).alias("jaccard"))


def q_simhash(spark, sf):  # per-doc 60-bit SimHash
    from etl_framework_spark.operators import simhash64

    d = _t(spark, sf, "documents")
    return simhash64(d, bits=_SIMHASH_BITS)


def q_simhash_near_pairs(spark, sf):  # multi-block Hamming<=3 pairs (full recall)
    from etl_framework_spark.operators import simhash64, simhash_near_pairs

    d = _t(spark, sf, "documents")
    return simhash_near_pairs(
        simhash64(d, bits=_SIMHASH_BITS),
        max_hamming=_SIMHASH_MAXHAM,
        bits=_SIMHASH_BITS,
    )


def q_embedding_near_dup(spark, sf):  # cosine-threshold near-dup pairs
    from etl_framework_spark.operators import embedding_near_dup

    e = _t(spark, sf, "embeddings")
    out = embedding_near_dup(e, threshold=0.4)
    return out.select("a", "b", F.round("cosine", 4).alias("cosine"))


def q_doc_fingerprint(spark, sf):  # bottom-k rolling-hash fingerprint
    from etl_framework_spark.operators import fingerprint

    d = _t(spark, sf, "documents")
    fp = fingerprint(d, k=8, fp_size=32)
    return fp.select("doc_id", F.concat_ws(",", "fp").alias("fp_str"), F.size("fp").alias("fp_n"))


def q_fingerprint_overlap(spark, sf):  # docs sharing >=3 fingerprint hashes
    from etl_framework_spark.operators import fingerprint, fingerprint_overlap_pairs

    d = _t(spark, sf, "documents")
    return fingerprint_overlap_pairs(fingerprint(d, k=8, fp_size=32), min_common=3, max_df=20)


def q_quality_features(spark, sf):  # text quality scoring feature vector
    from etl_framework_spark.operators import quality_features

    d = _t(spark, sf, "documents")
    return quality_features(d)


def q_lang_id_stats(spark, sf):  # heuristic language-ID routing counts
    from etl_framework_spark.operators import language_id

    d = _t(spark, sf, "documents")
    return language_id(d).groupBy("lang_pred").agg(F.count("*").alias("n_docs"))


def q_knn_ivf_full(spark, sf):  # IVF ANN with nprobe=all == exact top-10
    from etl_framework_spark.operators import ivf_build, knn_ivf

    e = _t(spark, sf, "embeddings")
    qrow = e.where(F.col("vec_id") == 0).select("embedding").head()
    qvec = [float(x) for x in qrow["embedding"]]
    assigned, cents = ivf_build(e.where(F.col("vec_id") != 0), n_centroids=8)
    out = knn_ivf(assigned, cents, qvec, k=10, nprobe=8)
    return out.select("vec_id", F.round("sim", 4).alias("sim"))


def q_knn_ivf_stored(spark, sf):  # IVF on BUCKETED STORAGE (partition-pruned)
    """Same exact-equivalence contract as knn_ivf_full (nprobe=all), but
    the index is round-tripped through ``ivf_write``/``ivf_read`` — the
    100 TB form where a probe's centroid filter is file-level partition
    pruning, not a post-scan filter (pruning gated in
    tests/test_plans.py)."""
    import shutil
    import tempfile

    from etl_framework_spark.operators import ivf_build, ivf_read, ivf_write, knn_ivf

    e = _t(spark, sf, "embeddings")
    qrow = e.where(F.col("vec_id") == 0).select("embedding").head()
    qvec = [float(x) for x in qrow["embedding"]]
    assigned, cents = ivf_build(e.where(F.col("vec_id") != 0), n_centroids=8)
    tmp = tempfile.mkdtemp(prefix="entry_ivf_")
    try:
        ivf_write(assigned, cents, f"{tmp}/idx")
        stored, cents2 = ivf_read(spark, f"{tmp}/idx")
        out = knn_ivf(stored, cents2, qvec, k=10, nprobe=8)
        res = _materialize(out.select("vec_id", F.round("sim", 4).alias("sim")))
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return res


def q_media_features(spark, sf):  # multimodal decode plumbing, oracle-checked
    """The decode stubs are sha256-seeded and deterministic, so the
    oracle replays payload construction in pure SQL: payload bytes =
    sha256 digest of '11:<id>' repeated (8 + id%5) times; content
    parity goes through sha256-of-hex (DuckDB's sha256 is
    VARCHAR-only). RNG-derived outputs (mean_luma, embedding) are
    pinned by exact-value pytest instead (tests/test_training_ops.py)."""
    from etl_framework_spark.operators.multimodal import gen_media, image_features

    m = gen_media(spark, 300, seed=11)
    feats = image_features(m).select(
        "media_id", "n_bytes", "out_width", "out_height"
    )
    hashes = m.select(
        "media_id", F.sha2(F.hex("payload"), 256).alias("payload_sha")
    )
    return feats.join(hashes, "media_id")


def q_frame_sample(spark, sf):  # video frame sampling (UDTF-shaped), oracle-checked
    from etl_framework_spark.operators.multimodal import gen_media, sample_frames

    m = gen_media(spark, 300, seed=11)
    return sample_frames(m, every_ms=5000).groupBy("media_id").agg(
        F.count("*").alias("n_frames"), F.max("frame_ms").alias("last_ms")
    )


# --------------------------------------------------------------------------
# CDC engine end-to-end (the reason this repo exists): events table mapped
# to a change log, applied through the engine, final state vs SQL replay
# --------------------------------------------------------------------------


def _events_as_changes(spark, sf) -> DataFrame:
    """Deterministic CDC mapping of the driver's events table:
    key (conv_id=user_id, turn_idx=event_id%7), order (ts, lsn=event_id),
    clicks are deletes, everything else upserts."""
    ev = _t(spark, sf, "events")
    is_del = F.col("event_type") == "click"
    return ev.select(
        F.when(is_del, "D").otherwise("U").alias("op"),
        F.col("event_id").cast("long").alias("lsn"),
        # parquet naive timestamps surface as timestamp_ntz in Spark 4;
        # the table schema is timestamp (session TZ pinned to UTC).
        F.col("ts").cast("timestamp").alias("ts"),
        F.concat(F.lit("conv-"), F.col("user_id").cast("string")).alias("conv_id"),
        F.pmod("event_id", F.lit(7)).cast("int").alias("turn_idx"),
        F.when(~is_del, F.col("event_type")).alias("role"),
        F.when(
            ~is_del,
            F.concat_ws("#", F.col("event_type"), F.col("event_id").cast("string")),
        ).alias("text"),
        F.lit(None).cast("string").alias("tool"),
    )


_CDC_REPLAY_ORACLE = """
    WITH ch AS (
        SELECT CASE WHEN event_type = 'click' THEN 'D' ELSE 'U' END AS op,
               event_id AS lsn, ts,
               'conv-' || CAST(user_id AS VARCHAR) AS conv_id,
               CAST(event_id % 7 AS INT) AS turn_idx,
               event_type AS role,
               event_type || '#' || CAST(event_id AS VARCHAR) AS text
        FROM events
    ), w AS (
        SELECT *, row_number() OVER (
            PARTITION BY conv_id, turn_idx ORDER BY ts DESC, lsn DESC) AS rn
        FROM ch
    )
    SELECT conv_id, turn_idx, role, text, ts, lsn AS _lsn
    FROM w WHERE rn = 1 AND op <> 'D'
"""


def _final_state(table) -> DataFrame:
    return table.refresh().current().select(
        "conv_id", "turn_idx", "role", "text", "ts", "_lsn"
    )


def q_cdc_apply_batch(spark, sf):  # batch apply_changes -> final table state
    """Since round 5 this runs the MERGE-ON-READ path
    (``merge_policy="lww"``): the apply commits per-epoch delta files
    (no bucket rewrite) and the final-state read folds them — the same
    oracle must still hold. The copy-on-write path stays covered by
    ``cdc_stream_apply`` (tables created without a policy)."""
    import shutil
    import tempfile

    from etl_framework_spark.cdc import apply_changes
    from etl_framework_spark.lakehouse import LakeTable
    from etl_framework_spark.schemas import KEY_COLUMNS, TRANSCRIPT_SCHEMA

    from pyspark.sql import types as T

    changes = _events_as_changes(spark, sf)
    tmp = tempfile.mkdtemp(prefix="entry_cdc_")
    stored = T.StructType(TRANSCRIPT_SCHEMA.fields)
    table = LakeTable.create(
        spark, f"{tmp}/t", schema=stored, key_columns=KEY_COLUMNS, n_buckets=16,
        merge_policy="lww",
    )
    apply_changes(table, changes, stream_id="entry", epoch_id=0)
    assert table.file_stats()["delta_files"] > 0, "expected MoR delta commit"
    fs = _materialize(_final_state(table))  # detach before tmp cleanup
    shutil.rmtree(tmp, ignore_errors=True)
    return fs


def q_cdc_apply_batch_dir(spark, sf):  # same replay through the 2nd format
    """Format-seam evidence (``lakehouse.protocol.KeyedTable``): the SAME
    ``apply_changes`` engine code replays the same change batch into a
    ``DirTable`` (flat-directory log-structured format) and must reach
    the identical final state as the ``LakeTable`` run — one oracle, two
    table formats."""
    import shutil
    import tempfile

    from etl_framework_spark.cdc import apply_changes
    from etl_framework_spark.lakehouse.dirtable import DirTable
    from etl_framework_spark.schemas import KEY_COLUMNS, TRANSCRIPT_SCHEMA

    from pyspark.sql import types as T

    changes = _events_as_changes(spark, sf)
    tmp = tempfile.mkdtemp(prefix="entry_cdc_dir_")
    stored = T.StructType(TRANSCRIPT_SCHEMA.fields)
    table = DirTable.create(
        spark, f"{tmp}/t", schema=stored, key_columns=KEY_COLUMNS, n_buckets=16,
        merge_policy="lww",  # merge-on-read through the 2nd format too
    )
    apply_changes(table, changes, stream_id="entry", epoch_id=0)
    fs = _materialize(_final_state(table))  # detach before tmp cleanup
    shutil.rmtree(tmp, ignore_errors=True)
    return fs


def q_cdc_changes_feed(spark, sf):  # CDC-out: row-level diff between versions
    """§2.10 change feed (``LakeTable.changes_between``): apply the log
    in two lsn-halves, emit one I/U/D row per key whose state changed
    between the two committed versions. Bucket-pruned on the engine
    side (only buckets whose file lists moved are read); the oracle
    recomputes the diff from two LWW replays."""
    import shutil
    import tempfile

    from etl_framework_spark.cdc import apply_changes
    from etl_framework_spark.lakehouse import LakeTable
    from etl_framework_spark.schemas import KEY_COLUMNS, TRANSCRIPT_SCHEMA

    from pyspark.sql import types as T

    changes = _events_as_changes(spark, sf)
    mid = changes.agg(F.max("lsn")).head()[0] // 2
    tmp = tempfile.mkdtemp(prefix="entry_feed_")
    table = LakeTable.create(
        spark, f"{tmp}/t", schema=T.StructType(TRANSCRIPT_SCHEMA.fields),
        key_columns=KEY_COLUMNS, n_buckets=16, merge_policy="lww",
    )
    apply_changes(table, changes.where(F.col("lsn") <= mid), stream_id="feed", epoch_id=0)
    v1 = table.version
    apply_changes(table, changes.where(F.col("lsn") > mid), stream_id="feed", epoch_id=1)
    v2 = table.version
    feed = _materialize(
        table.changes_between(v1, v2).select(
            "conv_id", "turn_idx", "role", "text", "ts", "_lsn", "_change_type"
        )
    )
    shutil.rmtree(tmp, ignore_errors=True)
    return feed


def q_cdc_time_travel(spark, sf):  # read the table AT a historical version
    """Time travel (``LakeTable.read(version=)`` / ``snapshot_at``,
    reference parity: incremental loads are re-runnable against a past
    state): apply the log in two lsn-halves (two commits), then read the
    table AT the first committed version — must equal an LWW replay of
    ONLY the first half. Copy-on-write never mutates old data files, so
    any committed version stays readable until GC."""
    import shutil
    import tempfile

    from etl_framework_spark.cdc import apply_changes
    from etl_framework_spark.lakehouse import LakeTable
    from etl_framework_spark.schemas import KEY_COLUMNS, TRANSCRIPT_SCHEMA

    from pyspark.sql import types as T

    changes = _events_as_changes(spark, sf)
    mid = changes.agg(F.max("lsn")).head()[0] // 2
    tmp = tempfile.mkdtemp(prefix="entry_tt_")
    table = LakeTable.create(
        spark, f"{tmp}/t", schema=T.StructType(TRANSCRIPT_SCHEMA.fields),
        key_columns=KEY_COLUMNS, n_buckets=16, merge_policy="lww",
    )
    apply_changes(table, changes.where(F.col("lsn") <= mid), stream_id="tt", epoch_id=0)
    v1 = table.version
    apply_changes(table, changes.where(F.col("lsn") > mid), stream_id="tt", epoch_id=1)
    out = _materialize(
        table.refresh().current(version=v1).select(
            "conv_id", "turn_idx", "role", "text", "ts", "_lsn"
        )
    )
    shutil.rmtree(tmp, ignore_errors=True)
    return out


def q_cdc_compacted_state(spark, sf):  # maintenance is state-preserving
    """Table maintenance (``compact`` + ``expire_snapshots``): apply the
    log in two halves, force-compact every bucket (key-sorted rewrite),
    expire all but the latest snapshot (orphan-file GC, zero grace —
    no concurrent writers here), then read the final state. Maintenance
    is a pure physical rewrite, so the result must be IDENTICAL to the
    plain replay oracle."""
    import shutil
    import tempfile

    from etl_framework_spark.cdc import apply_changes
    from etl_framework_spark.lakehouse import LakeTable
    from etl_framework_spark.schemas import KEY_COLUMNS, TRANSCRIPT_SCHEMA

    from pyspark.sql import types as T

    changes = _events_as_changes(spark, sf)
    mid = changes.agg(F.max("lsn")).head()[0] // 2
    tmp = tempfile.mkdtemp(prefix="entry_compact_")
    table = LakeTable.create(
        spark, f"{tmp}/t", schema=T.StructType(TRANSCRIPT_SCHEMA.fields),
        key_columns=KEY_COLUMNS, n_buckets=16, merge_policy="lww",
    )
    apply_changes(table, changes.where(F.col("lsn") <= mid), stream_id="c", epoch_id=0)
    apply_changes(table, changes.where(F.col("lsn") > mid), stream_id="c", epoch_id=1)
    assert table.file_stats()["delta_files"] > 0, "expected MoR deltas pre-compact"
    table.compact(min_files=1)  # collapse MoR deltas + rewrite every bucket
    assert table.refresh().file_stats()["delta_files"] == 0, "compact must collapse deltas"
    table.refresh().expire_snapshots(keep_last=1, grace_seconds=0)
    fs = _materialize(_final_state(table))
    shutil.rmtree(tmp, ignore_errors=True)
    return fs


def q_cdc_delete_where(spark, sf):  # predicate delete -> bucket-pruned rewrite
    """Predicate delete (``delete_where``, GDPR-style erasure): apply the
    full log, delete every surviving row with role='purchase', read the
    final state. Engine side rewrites ONLY buckets containing matches
    (column-pruned hit scan first); oracle is the replay minus those
    rows."""
    import shutil
    import tempfile

    from etl_framework_spark.cdc import apply_changes
    from etl_framework_spark.lakehouse import LakeTable
    from etl_framework_spark.schemas import KEY_COLUMNS, TRANSCRIPT_SCHEMA

    from pyspark.sql import types as T

    changes = _events_as_changes(spark, sf)
    tmp = tempfile.mkdtemp(prefix="entry_delw_")
    table = LakeTable.create(
        spark, f"{tmp}/t", schema=T.StructType(TRANSCRIPT_SCHEMA.fields),
        key_columns=KEY_COLUMNS, n_buckets=16, merge_policy="lww",
    )
    apply_changes(table, changes, stream_id="dw", epoch_id=0)
    table.delete_where(F.col("role") == "purchase")
    fs = _materialize(_final_state(table))
    shutil.rmtree(tmp, ignore_errors=True)
    return fs


def q_cdc_relay_state(spark, sf):  # table->table relay over the change feed
    """CDC relay (``cdc.relay.sync_once``): apply the log to a
    LakeTable in two lsn-halves, then replicate it commit-by-commit
    into a DirTable (cross-format, different bucket count) via the
    CDC-out feed with exactly-once watermarking. The REPLICA's state
    must equal the full replay oracle — the whole chain
    (apply → changes_between → key-replace merge) is value-checked."""
    import shutil
    import tempfile

    from etl_framework_spark.cdc import apply_changes, sync_once
    from etl_framework_spark.lakehouse import LakeTable
    from etl_framework_spark.lakehouse.dirtable import DirTable
    from etl_framework_spark.schemas import KEY_COLUMNS, TRANSCRIPT_SCHEMA

    from pyspark.sql import types as T

    changes = _events_as_changes(spark, sf)
    mid = changes.agg(F.max("lsn")).head()[0] // 2
    tmp = tempfile.mkdtemp(prefix="entry_relay_")
    stored = T.StructType(TRANSCRIPT_SCHEMA.fields)
    src = LakeTable.create(
        spark, f"{tmp}/src", schema=stored, key_columns=KEY_COLUMNS, n_buckets=16,
        merge_policy="lww",
    )
    # replica syncs are merge-on-read too: each sync appends one delta
    # commit folded by commit order (key-replace), so a small delta
    # never rewrites whole buckets on the target either
    dst = DirTable.create(
        spark, f"{tmp}/dst", schema=stored, key_columns=KEY_COLUMNS, n_buckets=8,
        merge_policy="replace",
    )
    apply_changes(src, changes.where(F.col("lsn") <= mid), stream_id="r", epoch_id=0)
    sync_once(src, dst)  # incremental: first half
    apply_changes(src, changes.where(F.col("lsn") > mid), stream_id="r", epoch_id=1)
    sync_once(src, dst)  # incremental: second half
    fs = _materialize(_final_state(dst))
    shutil.rmtree(tmp, ignore_errors=True)
    return fs


def q_cdc_rebucket_state(spark, sf):  # bucket-count evolution mid-history
    """Bucket-count evolution (``rebucket``): replay the first lsn-half
    into a 16-bucket merge-on-read table, re-key the whole layout to 32
    buckets (offline maintenance op — version-preconditioned overwrite),
    then replay the second half against the NEW layout. Epoch ledgers
    survive the rebucket (the second apply must see stream watermarks),
    and the final state must equal the plain replay oracle — rebucket is
    a pure physical re-key."""
    import shutil
    import tempfile

    from etl_framework_spark.cdc import apply_changes
    from etl_framework_spark.lakehouse import LakeTable
    from etl_framework_spark.schemas import KEY_COLUMNS, TRANSCRIPT_SCHEMA

    from pyspark.sql import types as T

    changes = _events_as_changes(spark, sf)
    mid = changes.agg(F.max("lsn")).head()[0] // 2
    tmp = tempfile.mkdtemp(prefix="entry_rebucket_")
    table = LakeTable.create(
        spark, f"{tmp}/t", schema=T.StructType(TRANSCRIPT_SCHEMA.fields),
        key_columns=KEY_COLUMNS, n_buckets=16, merge_policy="lww",
    )
    apply_changes(table, changes.where(F.col("lsn") <= mid), stream_id="rb", epoch_id=0)
    table.refresh().rebucket(32)
    assert table.n_buckets == 32
    assert table.last_epoch("rb") == 0, "epoch ledger must survive rebucket"
    apply_changes(table, changes.where(F.col("lsn") > mid), stream_id="rb", epoch_id=1)
    fs = _materialize(_final_state(table))
    shutil.rmtree(tmp, ignore_errors=True)
    return fs


def q_cdc_stream_apply(spark, sf):  # full streaming path -> final state
    import shutil
    import tempfile

    from etl_framework_spark.lakehouse import LakeTable
    from etl_framework_spark.schemas import CHANGE_SCHEMA, KEY_COLUMNS, TRANSCRIPT_SCHEMA
    from etl_framework_spark.streaming import run_to_completion

    from pyspark.sql import types as T

    changes = _events_as_changes(spark, sf)
    tmp = tempfile.mkdtemp(prefix="entry_stream_")
    # write the change log as 4 lsn-ranged batch files (binlog segments)
    n = changes.count()
    per = max(n // 4, 1)
    for b in range(4):
        changes.where(
            (F.col("lsn") >= b * per) & (F.col("lsn") < (b + 1) * per if b < 3 else F.lit(True))
        ).write.parquet(f"{tmp}/log/batch={b:03d}", mode="overwrite")
    LakeTable.create(
        spark,
        f"{tmp}/t",
        schema=T.StructType(TRANSCRIPT_SCHEMA.fields),
        key_columns=KEY_COLUMNS,
        n_buckets=16,
    )
    run_to_completion(
        spark,
        f"{tmp}/t",
        f"{tmp}/log",
        f"{tmp}/ckpt",
        CHANGE_SCHEMA,
        stream_id="entry-stream",
    )
    table = LakeTable(spark, f"{tmp}/t")
    fs = _materialize(_final_state(table))
    shutil.rmtree(tmp, ignore_errors=True)
    return fs


def q_excel_roundtrip(spark, sf):  # S2: xlsx sink+scan (self-contained codec)
    import shutil
    import tempfile

    from etl_framework_spark.sources import read_excel, write_xlsx

    n = _t(spark, sf, "nation").select("n_nationkey", "n_name").orderBy("n_nationkey")
    pdf0 = n.toPandas()
    tmp = tempfile.mkdtemp(prefix="entry_xlsx_")
    try:
        p = f"{tmp}/nation.xlsx"
        write_xlsx(p, list(pdf0.columns), pdf0.values.tolist())
        back = read_excel(spark, p)
        out = _materialize(
            back.select(
                F.col("n_nationkey").cast("long").alias("n_nationkey"),
                F.col("n_name").cast("string").alias("n_name"),
            )
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return out


def q_feather_roundtrip(spark, sf):  # L9: feather sink+scan (Arrow IPC, distributed)
    import shutil
    import tempfile

    from etl_framework_spark.sources import read_feather, write_feather

    o = _t(spark, sf, "orders").select("o_orderkey", "o_orderstatus", "o_totalprice")
    tmp = tempfile.mkdtemp(prefix="entry_feather_")
    try:
        write_feather(o, f"{tmp}/orders")
        back = read_feather(spark, f"{tmp}/orders")
        out = _materialize(
            back.groupBy("o_orderstatus").agg(
                F.count("*").alias("n"),
                F.round(F.sum("o_totalprice"), 2).alias("total_price"),
            )
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return out


def q_pdf_tables_roundtrip(spark, sf):  # S4: pdf table sink+scan (minimal codec)
    """Nation rows written as a simple report PDF (self-contained codec,
    sources/pdfmini.py), read back through the DISTRIBUTED binaryFile +
    mapInPandas table extractor, header row dropped."""
    import shutil
    import tempfile

    from etl_framework_spark.sources import read_pdf_tables
    from etl_framework_spark.sources.pdfmini import write_simple_pdf

    n = _t(spark, sf, "nation").select("n_nationkey", "n_name").orderBy("n_nationkey")
    pdf0 = n.toPandas()
    rows = [["n_nationkey", "n_name"]] + [
        [str(r.n_nationkey), str(r.n_name)] for r in pdf0.itertuples()
    ]
    tmp = tempfile.mkdtemp(prefix="entry_pdf_")
    try:
        write_simple_pdf(f"{tmp}/nation.pdf", [rows])
        out = (
            read_pdf_tables(spark, f"{tmp}/nation.pdf")
            .where(F.col("row_idx") > 0)
            .select(
                "row_idx",
                F.element_at("cells", 1).alias("nk"),
                F.element_at("cells", 2).alias("n_name"),
            )
        )
        out = _materialize(out)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return out


def q_csv_roundtrip(spark, sf):  # S1: csv sink+scan with pinned schema
    import shutil
    import tempfile

    from pyspark.sql import types as T

    from etl_framework_spark.sources import read_csv

    c = _t(spark, sf, "customer")
    tmp = tempfile.mkdtemp(prefix="entry_csv_")
    c.write.csv(f"{tmp}/customer", header=True, mode="overwrite")
    schema = T.StructType(
        [
            T.StructField("c_custkey", T.LongType()),
            T.StructField("c_name", T.StringType()),
            T.StructField("c_nationkey", T.IntegerType()),
            T.StructField("c_acctbal", T.DoubleType()),
            T.StructField("c_mktsegment", T.StringType()),
        ]
    )
    back = read_csv(spark, f"{tmp}/customer", schema=schema)
    out = _materialize(
        back.groupBy("c_mktsegment").agg(
            F.count("*").alias("n"),
            F.round(F.sum("c_acctbal"), 2).alias("total_bal"),
        )
    )
    shutil.rmtree(tmp, ignore_errors=True)
    return out


def q_json_flatten(spark, sf):  # S3: nested JSON scan + flatten + explode
    import shutil
    import tempfile

    from pyspark.sql import types as T

    from etl_framework_spark.sources import flatten_json, read_json

    o = _t(spark, sf, "orders").orderBy("o_orderkey").limit(2000)
    li = _t(spark, sf, "lineitem")
    nested = (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .groupBy("o_orderkey", "o_custkey")
        .agg(
            F.sort_array(
                F.collect_list(
                    F.struct(
                        F.col("l_linenumber").alias("ln"),
                        F.col("l_quantity").alias("qty"),
                    )
                )
            ).alias("lines")
        )
        .select(
            F.col("o_orderkey").alias("id"),
            F.struct(F.col("o_custkey").alias("cust")).alias("meta"),
            "lines",
        )
    )
    tmp = tempfile.mkdtemp(prefix="entry_json_")
    nested.write.json(f"{tmp}/orders", mode="overwrite")
    schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("meta", T.StructType([T.StructField("cust", T.LongType())])),
            T.StructField(
                "lines",
                T.ArrayType(
                    T.StructType(
                        [
                            T.StructField("ln", T.IntegerType()),
                            T.StructField("qty", T.DoubleType()),
                        ]
                    )
                ),
            ),
        ]
    )
    flat = flatten_json(read_json(spark, f"{tmp}/orders", schema=schema))
    out = _materialize(
        flat.select(
            "id", F.col("meta_cust").alias("cust"), "lines_ln",
            F.round("lines_qty", 2).alias("qty"),
        )
    )
    shutil.rmtree(tmp, ignore_errors=True)
    return out


def q_crypto_roundtrip(spark, sf):  # C1/C2: AES encrypt/decrypt, JVM-side
    from etl_framework_spark.transforms import decrypt_columns, encrypt_columns

    c = _t(spark, sf, "customer").select("c_custkey", "c_name")
    enc = encrypt_columns(c, ["c_name"], key="entry-key", mode="ECB")
    dec = decrypt_columns(enc, ["c_name"], key="entry-key", mode="ECB")
    joined = dec.alias("d").join(
        c.alias("o"), F.col("d.c_custkey") == F.col("o.c_custkey")
    )
    return joined.agg(
        F.count("*").alias("n_rows"),
        F.sum(
            (F.col("d.c_name") == F.col("o.c_name")).cast("int")
        ).alias("n_roundtrip_ok"),
    )


def q_clean_standardize(spark, sf):  # P2/P4: name standardization + drop-empty
    from etl_framework_spark.transforms import drop_empty_rows, standardize_column_names

    d = _t(spark, sf, "documents")
    blank = F.col("doc_id") % 10 == 0
    messy = d.select(
        F.col("doc_id").alias("Doc ID"),
        F.when(~blank, F.col("lang")).alias("  Lang-Code  "),
        F.when(~blank, F.col("source")).alias("Source!"),
        F.when(~blank, F.col("n_chars")).alias("N-Chars"),
    )
    cleaned = standardize_column_names(messy)
    # drop rows where every non-key column is null
    kept = drop_empty_rows(cleaned, subset=[c for c in cleaned.columns if c != "doc_id"])
    return kept


def q_asof_join(spark, sf):  # J6: event-time as-of join (single-exchange)
    from etl_framework_spark.operators.asof import asof_join

    ev = _t(spark, sf, "events").withColumn("ts", F.col("ts").cast("timestamp"))
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "user_id", "event_id", "ts"
    )
    # dedupe right side per (user, ts) so the as-of pick is deterministic
    clicks = (
        ev.where(F.col("event_type") == "click")
        .groupBy("user_id", "ts")
        .agg(F.max("event_id").alias("click_id"))
    )
    out = asof_join(
        purchases, clicks, on=["user_id"], left_ts="ts", right_ts="ts"
    )
    return out.select(
        "user_id",
        "event_id",
        "ts",
        F.col("click_id").alias("last_click_id"),
        F.col("ts_r").alias("last_click_ts"),
    )


def q_percentiles(spark, sf):  # A-family: exact percentiles per group
    o = _t(spark, sf, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.round(F.expr("percentile(o_totalprice, 0.5)"), 2).alias("p50"),
        F.round(F.expr("percentile(o_totalprice, 0.9)"), 2).alias("p90"),
        F.round(F.expr("percentile(o_totalprice, 0.99)"), 2).alias("p99"),
    )


def q_rollup_revenue(spark, sf):  # A8: rollup (partial-agg grouping sets)
    o = _t(spark, sf, "orders")
    return o.rollup("o_orderstatus", "o_orderpriority").agg(
        F.count("*").alias("n_orders"),
        F.round(F.sum("o_totalprice"), 2).alias("revenue"),
    )


def q_cube_counts(spark, sf):  # A8: cube
    o = _t(spark, sf, "orders")
    return o.cube("o_orderstatus", F.year("o_orderdate").alias("yr")).agg(
        F.count("*").alias("n_orders")
    )


def q_mask_pii(spark, sf):  # C3: masking via single regexp, no UDF
    from etl_framework_spark.transforms import mask_column

    c = _t(spark, sf, "customer")
    return mask_column(c.select("c_custkey", "c_name"), "c_name", keep_last=4)


def q_sanitize_strings(spark, sf):  # C4: control-char/script-tag strip
    from etl_framework_spark.transforms import sanitize_strings

    d = _t(spark, sf, "documents")
    dirty = d.select(
        "doc_id",
        F.concat(
            F.lit("<script>x</script>"), F.col("text"), F.lit("\x01\x02")
        ).alias("text"),
    )
    return sanitize_strings(dirty, ["text"]).select(
        "doc_id", F.md5("text").alias("clean_hash"), F.length("text").alias("clean_len")
    )


def q_enrich_lookup(spark, sf):  # Enricher: auto source-column detection
    """EnricherTransformer parity
    (reference:plugins/transformers/enricher.py:146-263): the source
    column is NOT named — detection probes a driver-side sample and
    finds 'lang' as the first column whose values hit the lookup keys;
    the lookup compiles to an inline literal map (codegen, no shuffle)."""
    from etl_framework_spark.transforms import EnricherTransformer

    d = _t(spark, sf, "documents")
    t = EnricherTransformer(
        {"en": "English", "de": "German", "es": "Spanish", "fr": "French"},
        new_column_name="language_name",
    )
    return t.transform(d).select("doc_id", "lang", "language_name")


def q_pipeline_end_to_end(spark, sf):  # Pipeline API: extract->transform->load x2
    """The orchestration front door (reference core/pipeline.py:75-246):
    batch 1 loads all orders with one computed column; batch 2 UPSERTs a
    recomputed subset (o_orderkey % 10 == 0). Final table state proves
    registry dispatch, transformer chaining, strategy-driven load, and
    keyed upsert composition end to end."""
    import shutil
    import tempfile

    from etl_framework_spark.lakehouse import LakeTable
    from etl_framework_spark.pipeline import (
        DataFrameExtractor,
        LakeLoader,
        MappingTransformer,
        Pipeline,
    )

    o = _t(spark, sf, "orders")
    tmp = tempfile.mkdtemp(prefix="entry_pipe_")
    try:
        pipe = Pipeline(spark, username="admin", enable_security=True)
        pipe.register_extractor("mem", DataFrameExtractor())
        pipe.add_transformer(
            MappingTransformer(
                {
                    "calculations": [
                        {"name": "gross", "formula": "floor(o_totalprice * 0.5 * 100 + 0.5) / 100"}
                    ]
                }
            )
        )
        pipe.register_loader("lake", LakeLoader(spark, n_buckets=8))
        base = o.select("o_orderkey", "o_custkey", "o_totalprice")
        pipe.run("mem", base, "lake", f"{tmp}/t", strategy="replace",
                 key_columns=["o_orderkey"])
        # batch 2: recompute the calc for 10% of keys, upsert them
        pipe.transformers.clear()
        pipe.add_transformer(
            MappingTransformer(
                {
                    "calculations": [
                        {"name": "gross", "formula": "floor(o_totalprice * 0.9 * 100 + 0.5) / 100"}
                    ]
                }
            )
        )
        pipe.run(
            "mem",
            base.where(F.col("o_orderkey") % 10 == 0),
            "lake",
            f"{tmp}/t",
            strategy="upsert",
            key_columns=["o_orderkey"],
        )
        out = _materialize(
            LakeTable(spark, f"{tmp}/t").current().select(
                "o_orderkey", "o_custkey", "gross"
            )
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return out


def q_grouped_session_stats(spark, sf):  # §2.11 grouped-apply (applyInPandas)
    from etl_framework_spark.operators.grouped import user_session_stats

    ev = _t(spark, sf, "events").withColumn("ts", F.col("ts").cast("timestamp"))
    out = user_session_stats(ev)
    return out.select(
        "user_id",
        "n_events",
        "n_types",
        F.round("max_gap_seconds", 3).alias("max_gap_seconds"),
        F.round("total_value", 2).alias("total_value"),
    )


def _events_as_transcripts(spark, sf) -> DataFrame:
    """Deterministic transcript projection of events for the validator:
    turn_idx = per-user event rank; every 13th event then DROPPED so
    some conversations have missing turns (valid=false cases)."""
    from pyspark.sql import Window

    ev = _t(spark, sf, "events").withColumn("ts", F.col("ts").cast("timestamp"))
    w = Window.partitionBy("user_id").orderBy("event_id")
    tr = ev.select(
        F.concat(F.lit("conv-"), F.col("user_id").cast("string")).alias("conv_id"),
        (F.row_number().over(w) - 1).cast("int").alias("turn_idx"),
        F.col("event_type").alias("role"),
        "ts",
        "event_id",
    )
    return tr.where(F.col("event_id") % 13 != 0).drop("event_id")


def q_conversation_validate(spark, sf):  # §2.11 per-conversation validation
    from etl_framework_spark.operators.grouped import validate_conversation_turns

    tr = _events_as_transcripts(spark, sf)
    out = validate_conversation_turns(tr)
    return out.select(
        "conv_id",
        "n_turns",
        "n_missing",
        "n_dup_turns",
        "role_repeats",
        F.round("max_gap_seconds", 3).alias("max_gap_seconds"),
        "valid",
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "filter_project": q_filter_project,
        "pricing_summary": q_pricing_summary,
        "group_count": q_group_count,
        "monthly_revenue": q_monthly_revenue,
        "topk": q_topk,
        "join_agg": q_join_agg,
        "broadcast_lookup": q_broadcast_lookup,
        "semi_join": q_semi_join,
        "anti_join": q_anti_join,
        "lww_latest_event": q_lww_latest_event,
        "upsert_emulation": q_upsert_emulation,
        "running_total": q_running_total,
        "rank_topk_per_group": q_rank_topk_per_group,
        "union_distinct": q_union_distinct,
        "intersect_users": q_intersect_users,
        "scalar_functions": q_scalar_functions,
        "conditional_agg": q_conditional_agg,
        "dedup_exact": q_dedup_exact,
        "doc_quality": q_doc_quality,
        "lang_stats": q_lang_stats,
        "token_stats_by_source": q_token_stats_by_source,
        "knn_cosine": q_knn_cosine,
        "sessionize": q_sessionize,
        "fill_forward": q_fill_forward,
        "calc_program": q_calc_program,
        "minhash_lsh_pairs": q_minhash_lsh_pairs,
        "ngram_jaccard": q_ngram_jaccard,
        "simhash": q_simhash,
        "simhash_near_pairs": q_simhash_near_pairs,
        "embedding_near_dup": q_embedding_near_dup,
        "doc_fingerprint": q_doc_fingerprint,
        "fingerprint_overlap": q_fingerprint_overlap,
        "quality_features": q_quality_features,
        "lang_id_stats": q_lang_id_stats,
        "knn_ivf_full": q_knn_ivf_full,
        "knn_ivf_stored": q_knn_ivf_stored,
        "media_features": q_media_features,
        "frame_sample": q_frame_sample,
        "rollup_revenue": q_rollup_revenue,
        "cube_counts": q_cube_counts,
        "mask_pii": q_mask_pii,
        "sanitize_strings": q_sanitize_strings,
        "enrich_lookup": q_enrich_lookup,
        "cdc_apply_batch": q_cdc_apply_batch,
        "cdc_apply_batch_dir": q_cdc_apply_batch_dir,
        "cdc_changes_feed": q_cdc_changes_feed,
        "cdc_time_travel": q_cdc_time_travel,
        "cdc_compacted_state": q_cdc_compacted_state,
        "cdc_delete_where": q_cdc_delete_where,
        "cdc_relay_state": q_cdc_relay_state,
        "cdc_rebucket_state": q_cdc_rebucket_state,
        "cdc_stream_apply": q_cdc_stream_apply,
        "asof_join": q_asof_join,
        "percentiles": q_percentiles,
        "csv_roundtrip": q_csv_roundtrip,
        "excel_roundtrip": q_excel_roundtrip,
        "feather_roundtrip": q_feather_roundtrip,
        "pdf_tables_roundtrip": q_pdf_tables_roundtrip,
        "json_flatten": q_json_flatten,
        "crypto_roundtrip": q_crypto_roundtrip,
        "clean_standardize": q_clean_standardize,
        "pipeline_end_to_end": q_pipeline_end_to_end,
        "grouped_session_stats": q_grouped_session_stats,
        "conversation_validate": q_conversation_validate,
    }


# Shared oracle fragments (must mirror etl_framework_spark.operators 1:1).

#: distinct word-trigram shingles per doc (mirrors dedup.shingles_expr)
_SH_CTE = r"""
toks AS (
    SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS t FROM documents
), sh AS (
    SELECT doc_id,
           list_distinct([array_to_string(t[i:i+2], ' ')
                          for i in range(1, greatest(len(t) - 2, 1) + 1)]) AS s
    FROM toks
)
"""

#: bottom-32 char-8-gram fingerprint per doc (mirrors text.fingerprint)
_FP_CTE = r"""
nrm AS (
    SELECT doc_id, lower(regexp_replace(text, '\s+', ' ', 'g')) AS nm FROM documents
), fps AS (
    SELECT doc_id,
           list_sort(list_distinct(
               [md5(substring(nm, i, 8))
                for i in range(1, greatest(length(nm) - 7, 1) + 1)]))[1:32] AS fp
    FROM nrm
)
"""


def _simhash_sql(bits: int = 16) -> str:
    hv = "(('0x' || substring(md5(tok), 1, 15))::BIGINT)"
    votes = ",\n           ".join(
        f"sum(CASE WHEN ({hv} & {1 << k}) <> 0 THEN 1 ELSE -1 END) AS v{k}"
        for k in range(bits)
    )
    combine = " + ".join(f"(CASE WHEN v{k} > 0 THEN {1 << k} ELSE 0 END)" for k in range(bits))
    return rf"""
        WITH toks AS (
            SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\s+')) AS tok
            FROM documents
        ), v AS (
            SELECT doc_id,
           {votes}
            FROM toks GROUP BY doc_id
        )
        SELECT doc_id, CAST({combine} AS BIGINT) AS simhash FROM v
    """


def _simhash_near_pairs_sql(bits: int, max_hamming: int) -> str:
    """Replicates the Manku combination-table candidate scheme: one
    (table_idx, packed_key) row per table (UNION ALL — block boundaries
    and table combinations shared with the Spark side via
    ``simhash_tables``), join on key equality, exact popcount confirm.
    60-bit hashes are sign-free so ``//`` and ``%`` replay the shifts
    exactly, and packed keys stay < 2^60 (no signed-int64 issues)."""
    from etl_framework_spark.operators.dedup import simhash_tables

    def packed(table):
        shift, terms = 0, []
        for off, w in table:
            terms.append(f"((simhash // {1 << off}) % {1 << w}) * {1 << shift}")
            shift += w
        return " + ".join(terms)

    blk = " UNION ALL ".join(
        f"SELECT doc_id, simhash, {t} AS tbl, {packed(table)} AS kv FROM s"
        for t, table in enumerate(simhash_tables(bits, max_hamming))
    )
    return rf"""
        WITH s AS ({_simhash_sql(bits)}), blk AS ({blk})
        SELECT DISTINCT l.doc_id AS a, r.doc_id AS b,
               CAST(bit_count(xor(l.simhash, r.simhash)) AS INT) AS hamming
        FROM blk l JOIN blk r
          ON l.tbl = r.tbl AND l.kv = r.kv AND l.doc_id < r.doc_id
        WHERE bit_count(xor(l.simhash, r.simhash)) <= {max_hamming}
    """


def _lang_id_sql() -> str:
    from etl_framework_spark.operators.text import STOPWORDS

    score = lambda lang: (  # noqa: E731
        "len(list_filter(t, x -> list_contains(["
        + ", ".join(f"'{w}'" for w in STOPWORDS[lang])
        + f"], x))) * 1.0 / greatest(len(t), 1) AS s_{lang}"
    )
    langs = list(STOPWORDS)
    best = "greatest(" + ", ".join(f"s_{lang}" for lang in langs) + ")"
    case = "CASE WHEN " + best + " = 0 THEN 'unknown' " + " ".join(
        f"WHEN s_{lang} = {best} THEN '{lang}'" for lang in langs
    ) + " END"
    return rf"""
        WITH toks AS (
            SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\s+') AS t
            FROM documents
        ), sc AS (
            SELECT doc_id, {", ".join(score(lang) for lang in langs)} FROM toks
        ), p AS (
            SELECT doc_id, {case} AS lang_pred FROM sc
        )
        SELECT lang_pred, count(*) AS n_docs FROM p GROUP BY lang_pred
    """


def _minhash_sig_sql() -> str:
    """Per-permutation list_min expressions over the one-time shingle
    hash (constants shared with the Spark side via
    ``dedup.minhash_params``)."""
    from etl_framework_spark.operators.dedup import _MINHASH_P, minhash_params

    return ", ".join(
        f"list_min([(hx * {a} + {b}) % {_MINHASH_P} for hx in h])"
        for a, b in minhash_params(_MINHASH_K)
    )


def oracle_sql() -> dict[str, str]:
    return {
        "minhash_lsh_pairs": rf"""
            WITH {_SH_CTE}, hs AS (
                SELECT doc_id,
                       [(('0x' || substring(md5(x), 1, 15))::BIGINT % 1073741824)
                        for x in s] AS h
                FROM sh
            ), sigs AS (
                SELECT doc_id, [{_minhash_sig_sql()}] AS sig FROM hs
            ), bands AS (
                SELECT doc_id, j AS bd,
                       md5(array_to_string(sig[j*{_LSH_ROWS}+1 : j*{_LSH_ROWS}+{_LSH_ROWS}], '|')) AS bh
                FROM sigs, (SELECT unnest(range({_LSH_BANDS})) AS j)
            ), bsize AS (
                SELECT bd, bh, count(*) AS c FROM bands GROUP BY bd, bh
            )
            SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
            FROM bands x
            JOIN bands y ON x.bd = y.bd AND x.bh = y.bh AND x.doc_id < y.doc_id
            JOIN bsize z ON z.bd = x.bd AND z.bh = x.bh
            WHERE z.c > 1 AND z.c <= 50
        """,
        "ngram_jaccard": rf"""
            WITH {_SH_CTE}, ex AS (
                SELECT doc_id AS id, unnest(s) AS g FROM sh
            ), sizes AS (
                SELECT id, count(*) AS n FROM ex GROUP BY id
            ), common AS (
                SELECT l.id AS a, r.id AS b, count(*) AS c
                FROM ex l JOIN ex r ON l.g = r.g AND l.id < r.id
                GROUP BY 1, 2
            )
            SELECT a, b,
                   round(CAST(c AS DOUBLE) / (sa.n + sb.n - c), 6) AS jaccard
            FROM common
            JOIN sizes sa ON sa.id = a
            JOIN sizes sb ON sb.id = b
            WHERE CAST(c AS DOUBLE) / (sa.n + sb.n - c) >= 0.5
        """,
        "simhash": _simhash_sql(_SIMHASH_BITS),
        "simhash_near_pairs": _simhash_near_pairs_sql(_SIMHASH_BITS, _SIMHASH_MAXHAM),
        "embedding_near_dup": """
            WITH e AS (
                SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
            )
            SELECT l.vec_id AS a, r.vec_id AS b,
                   round(list_cosine_similarity(l.v, r.v), 4) AS cosine
            FROM e l JOIN e r ON l.vec_id < r.vec_id
            WHERE list_cosine_similarity(l.v, r.v) >= 0.4
        """,
        "doc_fingerprint": rf"""
            WITH {_FP_CTE}
            SELECT doc_id, array_to_string(fp, ',') AS fp_str,
                   CAST(len(fp) AS INT) AS fp_n
            FROM fps
        """,
        "fingerprint_overlap": rf"""
            WITH {_FP_CTE}, ex AS (
                SELECT doc_id AS id, unnest(fp) AS h FROM fps
            ), freq AS (
                SELECT h FROM ex GROUP BY h HAVING count(*) > 20
            ), fil AS (
                SELECT id, h FROM ex WHERE h NOT IN (SELECT h FROM freq)
            )
            SELECT l.id AS a, r.id AS b, count(*) AS common_fp
            FROM fil l JOIN fil r ON l.h = r.h AND l.id < r.id
            GROUP BY 1, 2 HAVING count(*) >= 3
        """,
        "quality_features": r"""
            SELECT doc_id,
                   CAST(length(text) AS INT) AS n_chars_m,
                   CAST(CASE WHEN trim(text) = '' THEN 0
                        ELSE len(regexp_split_to_array(trim(text), '\s+')) END AS INT)
                       AS n_tokens,
                   CAST(len(regexp_extract_all(text,
                        '([A-Za-z]+|[0-9]+|[^A-Za-z0-9\s])', 1)) AS INT) AS n_subtokens,
                   round((length(text) - length(regexp_replace(text, '[^\w\s]', '', 'g')))
                         * 1.0 / greatest(length(text), 1), 6) AS punct_ratio,
                   round((length(text) - length(regexp_replace(text, '\s', '', 'g')))
                         * 1.0 / greatest(length(text), 1), 6) AS space_ratio,
                   round((length(text) - length(regexp_replace(text, '[A-Z]', '', 'g')))
                         * 1.0 / greatest(length(text) - length(regexp_replace(text, '[A-Za-z]', '', 'g')), 1), 6)
                       AS upper_ratio,
                   round((length(regexp_replace(text, '\s', '', 'g')))
                         * 1.0 / greatest(CASE WHEN trim(text) = '' THEN 0
                                   ELSE len(regexp_split_to_array(trim(text), '\s+')) END, 1), 6)
                       AS mean_word_len
            FROM documents
        """,
        "lang_id_stats": _lang_id_sql(),
        "rollup_revenue": """
            SELECT o_orderstatus, o_orderpriority,
                   count(*) AS n_orders,
                   round(sum(o_totalprice), 2) AS revenue
            FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
        """,
        "cube_counts": """
            SELECT o_orderstatus, CAST(year(o_orderdate) AS INT) AS yr,
                   count(*) AS n_orders
            FROM orders GROUP BY CUBE (o_orderstatus, yr)
        """,
        "mask_pii": """
            SELECT c_custkey,
                   repeat('*', greatest(length(c_name) - 4, 0)) ||
                   right(c_name, least(length(c_name), 4)) AS c_name
            FROM customer
        """,
        "cdc_apply_batch": _CDC_REPLAY_ORACLE,
        "cdc_apply_batch_dir": _CDC_REPLAY_ORACLE,
        "cdc_changes_feed": """
            WITH ch AS (
                SELECT CASE WHEN event_type = 'click' THEN 'D' ELSE 'U' END AS op,
                       event_id AS lsn, ts,
                       'conv-' || CAST(user_id AS VARCHAR) AS conv_id,
                       CAST(event_id % 7 AS INT) AS turn_idx,
                       event_type AS role,
                       event_type || '#' || CAST(event_id AS VARCHAR) AS text
                FROM events
            ), mid AS (SELECT MAX(event_id) // 2 AS m FROM events),
            s1 AS (
                SELECT * FROM (
                    SELECT *, row_number() OVER (
                        PARTITION BY conv_id, turn_idx ORDER BY ts DESC, lsn DESC) AS rn
                    FROM ch WHERE lsn <= (SELECT m FROM mid)
                ) WHERE rn = 1 AND op <> 'D'
            ), s2 AS (
                SELECT * FROM (
                    SELECT *, row_number() OVER (
                        PARTITION BY conv_id, turn_idx ORDER BY ts DESC, lsn DESC) AS rn
                    FROM ch
                ) WHERE rn = 1 AND op <> 'D'
            )
            SELECT COALESCE(s2.conv_id, s1.conv_id) AS conv_id,
                   COALESCE(s2.turn_idx, s1.turn_idx) AS turn_idx,
                   s2.role, s2.text, s2.ts, s2.lsn AS _lsn,
                   CASE WHEN s1.lsn IS NULL THEN 'I'
                        WHEN s2.lsn IS NULL THEN 'D'
                        WHEN s2.lsn <> s1.lsn THEN 'U'
                   END AS _change_type
            FROM s2 FULL OUTER JOIN s1
              ON s2.conv_id = s1.conv_id AND s2.turn_idx = s1.turn_idx
            WHERE (CASE WHEN s1.lsn IS NULL THEN 'I'
                        WHEN s2.lsn IS NULL THEN 'D'
                        WHEN s2.lsn <> s1.lsn THEN 'U' END) IS NOT NULL
        """,
        "cdc_stream_apply": _CDC_REPLAY_ORACLE,
        # time travel: LWW replay of ONLY the first lsn-half (the state
        # committed at version v1)
        "cdc_time_travel": """
            WITH mid AS (SELECT MAX(event_id) // 2 AS m FROM events),
            ch AS (
                SELECT CASE WHEN event_type = 'click' THEN 'D' ELSE 'U' END AS op,
                       event_id AS lsn, ts,
                       'conv-' || CAST(user_id AS VARCHAR) AS conv_id,
                       CAST(event_id % 7 AS INT) AS turn_idx,
                       event_type AS role,
                       event_type || '#' || CAST(event_id AS VARCHAR) AS text
                FROM events
                WHERE event_id <= (SELECT m FROM mid)
            ), w AS (
                SELECT *, row_number() OVER (
                    PARTITION BY conv_id, turn_idx ORDER BY ts DESC, lsn DESC) AS rn
                FROM ch
            )
            SELECT conv_id, turn_idx, role, text, ts, lsn AS _lsn
            FROM w WHERE rn = 1 AND op <> 'D'
        """,
        # compaction + snapshot expiry are pure physical rewrites: the
        # logical state is the unchanged full replay
        "cdc_compacted_state": _CDC_REPLAY_ORACLE,
        "cdc_rebucket_state": _CDC_REPLAY_ORACLE,
        # the relay replica must carry the same final state as a direct
        # apply of the full log
        "cdc_relay_state": _CDC_REPLAY_ORACLE,
        # predicate delete: the full replay minus the deleted rows
        "cdc_delete_where": """
            WITH ch AS (
                SELECT CASE WHEN event_type = 'click' THEN 'D' ELSE 'U' END AS op,
                       event_id AS lsn, ts,
                       'conv-' || CAST(user_id AS VARCHAR) AS conv_id,
                       CAST(event_id % 7 AS INT) AS turn_idx,
                       event_type AS role,
                       event_type || '#' || CAST(event_id AS VARCHAR) AS text
                FROM events
            ), w AS (
                SELECT *, row_number() OVER (
                    PARTITION BY conv_id, turn_idx ORDER BY ts DESC, lsn DESC) AS rn
                FROM ch
            )
            SELECT conv_id, turn_idx, role, text, ts, lsn AS _lsn
            FROM w WHERE rn = 1 AND op <> 'D' AND role <> 'purchase'
        """,
        "asof_join": """
            WITH p AS (
                SELECT user_id, event_id, ts FROM events WHERE event_type = 'purchase'
            ), c AS (
                SELECT user_id, ts, max(event_id) AS click_id
                FROM events WHERE event_type = 'click' GROUP BY user_id, ts
            )
            SELECT p.user_id, p.event_id, p.ts,
                   c.click_id AS last_click_id, c.ts AS last_click_ts
            FROM p ASOF LEFT JOIN c
              ON p.user_id = c.user_id AND p.ts >= c.ts
        """,
        "percentiles": """
            SELECT o_orderpriority,
                   round(quantile_cont(o_totalprice, 0.5), 2) AS p50,
                   round(quantile_cont(o_totalprice, 0.9), 2) AS p90,
                   round(quantile_cont(o_totalprice, 0.99), 2) AS p99
            FROM orders GROUP BY o_orderpriority
        """,
        "csv_roundtrip": """
            SELECT c_mktsegment, count(*) AS n,
                   round(sum(c_acctbal), 2) AS total_bal
            FROM customer GROUP BY c_mktsegment
        """,
        "json_flatten": """
            WITH o AS (SELECT * FROM orders ORDER BY o_orderkey LIMIT 2000)
            SELECT o_orderkey AS id, o_custkey AS cust,
                   CAST(l_linenumber AS INT) AS lines_ln,
                   round(l_quantity, 2) AS qty
            FROM o JOIN lineitem ON o_orderkey = l_orderkey
        """,
        "crypto_roundtrip": """
            SELECT count(*) AS n_rows,
                   CAST(count(*) AS BIGINT) AS n_roundtrip_ok
            FROM customer
        """,
        "clean_standardize": """
            SELECT doc_id, lang AS lang_code, source, n_chars
            FROM documents WHERE doc_id % 10 <> 0
        """,
        "excel_roundtrip": """
            SELECT CAST(n_nationkey AS BIGINT) AS n_nationkey, n_name
            FROM nation ORDER BY n_nationkey
        """,
        "feather_roundtrip": """
            SELECT o_orderstatus, count(*) AS n,
                   round(sum(o_totalprice), 2) AS total_price
            FROM orders GROUP BY o_orderstatus
        """,
        "pdf_tables_roundtrip": """
            SELECT CAST(row_number() OVER (ORDER BY n_nationkey) AS INT)
                       AS row_idx,
                   CAST(n_nationkey AS VARCHAR) AS nk, n_name
            FROM nation
        """,
        "pipeline_end_to_end": """
            SELECT o_orderkey, o_custkey,
                   CASE WHEN o_orderkey % 10 = 0
                        THEN floor(o_totalprice * 0.9 * 100 + 0.5) / 100
                        ELSE floor(o_totalprice * 0.5 * 100 + 0.5) / 100 END AS gross
            FROM orders
        """,
        "grouped_session_stats": """
            WITH g AS (
                SELECT user_id, event_type, value,
                       epoch(ts - lag(ts) OVER (
                           PARTITION BY user_id ORDER BY ts, event_id)) AS gap
                FROM events
            )
            SELECT user_id,
                   CAST(count(*) AS INT) AS n_events,
                   CAST(count(DISTINCT event_type) AS INT) AS n_types,
                   round(coalesce(max(gap), 0.0), 3) AS max_gap_seconds,
                   round(sum(value), 2) AS total_value
            FROM g GROUP BY user_id
        """,
        "media_features": """
            SELECT i AS media_id,
                   CAST(32 * (8 + i % 5) AS INT) AS n_bytes,
                   32 AS out_width, 32 AS out_height,
                   sha256(repeat(upper(sha256('11:' || CAST(i AS VARCHAR))),
                                 8 + i % 5)) AS payload_sha
            FROM range(300) t(i) WHERE i % 3 = 0
        """,
        "frame_sample": """
            WITH v AS (
                SELECT i AS media_id, 1000 * (1 + i % 30) AS duration_ms
                FROM range(300) t(i) WHERE i % 3 = 2
            )
            SELECT media_id,
                   CAST(ceil(duration_ms / 5000.0) AS BIGINT) AS n_frames,
                   CAST(5000 * (ceil(duration_ms / 5000.0) - 1) AS BIGINT)
                       AS last_ms
            FROM v
        """,
        "conversation_validate": """
            WITH tr0 AS (
                SELECT 'conv-' || CAST(user_id AS VARCHAR) AS conv_id,
                       CAST(row_number() OVER (
                           PARTITION BY user_id ORDER BY event_id) - 1 AS INT)
                           AS turn_idx,
                       event_type AS role, ts, event_id
                FROM events
            ), tr AS (
                SELECT conv_id, turn_idx, role, ts
                FROM tr0 WHERE event_id % 13 <> 0
            ), w AS (
                SELECT conv_id, turn_idx, role, ts,
                       lag(role) OVER (
                           PARTITION BY conv_id ORDER BY turn_idx) AS prev_role,
                       epoch(ts - lag(ts) OVER (
                           PARTITION BY conv_id ORDER BY turn_idx)) AS gap
                FROM tr
            )
            SELECT conv_id,
                   CAST(count(*) AS INT) AS n_turns,
                   CAST(max(turn_idx) + 1 - count(DISTINCT turn_idx) AS INT)
                       AS n_missing,
                   CAST(count(*) - count(DISTINCT turn_idx) AS INT) AS n_dup_turns,
                   CAST(coalesce(sum(CASE WHEN role = prev_role THEN 1 END), 0)
                       AS INT) AS role_repeats,
                   round(coalesce(max(gap), 0.0), 3) AS max_gap_seconds,
                   (count(*) = count(DISTINCT turn_idx)
                    AND max(turn_idx) + 1 = count(DISTINCT turn_idx)) AS valid
            FROM w GROUP BY conv_id
        """,
        "sanitize_strings": r"""
            WITH dirty AS (
                SELECT doc_id,
                       '<script>x</script>' || text || chr(1) || chr(2) AS text
                FROM documents
            ), clean AS (
                SELECT doc_id,
                       regexp_replace(
                           regexp_replace(text, '(?i)<script.*?>.*?</script>', '', 'g'),
                           '[\x00-\x08\x0b\x0c\x0e-\x1f]', '', 'g') AS text
                FROM dirty
            )
            SELECT doc_id, md5(text) AS clean_hash,
                   CAST(length(text) AS INT) AS clean_len
            FROM clean
        """,
        "enrich_lookup": """
            SELECT doc_id, lang,
                   CASE lang WHEN 'en' THEN 'English' WHEN 'de' THEN 'German'
                             WHEN 'es' THEN 'Spanish' WHEN 'fr' THEN 'French'
                   END AS language_name
            FROM documents
        """,
        "knn_ivf_full": """
            WITH q AS (
                SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id = 0
            )
            SELECT vec_id,
                   round(list_cosine_similarity(CAST(embedding AS DOUBLE[]),
                                                (SELECT qv FROM q)), 4) AS sim
            FROM embeddings
            WHERE vec_id <> 0
            ORDER BY list_cosine_similarity(CAST(embedding AS DOUBLE[]),
                                            (SELECT qv FROM q)) DESC, vec_id ASC
            LIMIT 10
        """,
        "knn_ivf_stored": """
            WITH q AS (
                SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id = 0
            )
            SELECT vec_id,
                   round(list_cosine_similarity(CAST(embedding AS DOUBLE[]),
                                                (SELECT qv FROM q)), 4) AS sim
            FROM embeddings
            WHERE vec_id <> 0
            ORDER BY list_cosine_similarity(CAST(embedding AS DOUBLE[]),
                                            (SELECT qv FROM q)) DESC, vec_id ASC
            LIMIT 10
        """,
        "filter_project": """
            SELECT l_orderkey, l_linenumber,
                   floor(l_extendedprice * (1 - l_discount) * 100 + 0.5) / 100 AS revenue
            FROM lineitem
            WHERE l_shipdate < TIMESTAMP '1996-01-01' AND l_discount > 0.05
        """,
        "pricing_summary": """
            SELECT l_returnflag, l_linestatus,
                   round(sum(l_quantity), 2) AS sum_qty,
                   round(sum(l_extendedprice), 2) AS sum_base_price,
                   round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
                   round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
                   round(avg(l_quantity), 4) AS avg_qty,
                   round(avg(l_extendedprice), 4) AS avg_price,
                   round(avg(l_discount), 4) AS avg_disc,
                   count(*) AS count_order
            FROM lineitem
            WHERE l_shipdate <= TIMESTAMP '1998-09-02'
            GROUP BY l_returnflag, l_linestatus
        """,
        "group_count": """
            SELECT o_orderstatus,
                   count(*) AS n_orders,
                   count(DISTINCT o_custkey) AS n_customers,
                   round(avg(o_totalprice), 2) AS avg_price
            FROM orders GROUP BY o_orderstatus
        """,
        "monthly_revenue": """
            SELECT strftime(o_orderdate, '%Y-%m') AS order_month,
                   round(sum(o_totalprice), 2) AS revenue,
                   count(*) AS n_orders
            FROM orders GROUP BY 1
        """,
        "topk": """
            SELECT o_orderkey, o_custkey, round(o_totalprice, 2) AS o_totalprice
            FROM orders ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10
        """,
        "join_agg": """
            SELECT c_mktsegment,
                   round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
                   count(DISTINCT o_orderkey) AS n_orders
            FROM lineitem
            JOIN orders ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            GROUP BY c_mktsegment
        """,
        "broadcast_lookup": """
            SELECT r_name AS region, count(*) AS n_customers,
                   round(sum(c_acctbal), 2) AS total_balance
            FROM customer
            JOIN nation ON c_nationkey = n_nationkey
            JOIN region ON n_regionkey = r_regionkey
            GROUP BY r_name
        """,
        "semi_join": """
            SELECT c_custkey, c_mktsegment FROM customer
            WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        """,
        "anti_join": """
            SELECT c_custkey, c_mktsegment FROM customer
            WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                              AND o_orderdate >= TIMESTAMP '1997-06-01')
        """,
        "lww_latest_event": """
            SELECT user_id,
                   max(event_id) AS last_event_id,
                   arg_max(event_type, event_id) AS last_type,
                   round(arg_max(value, event_id), 4) AS last_value
            FROM events GROUP BY user_id
        """,
        "upsert_emulation": """
            SELECT user_id, max(event_id) AS last_event_id,
                   arg_max(event_type, event_id) AS event_type
            FROM events GROUP BY user_id
        """,
        "running_total": """
            SELECT user_id, event_id,
                   round(sum(value) OVER (
                       PARTITION BY user_id ORDER BY event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2)
                   AS running_value
            FROM events
        """,
        "rank_topk_per_group": """
            SELECT o_custkey, o_orderkey, round(o_totalprice, 2) AS o_totalprice,
                   CAST(rk AS INT) AS rk
            FROM (
                SELECT o_custkey, o_orderkey, o_totalprice,
                       row_number() OVER (
                           PARTITION BY o_custkey
                           ORDER BY o_totalprice DESC, o_orderkey ASC) AS rk
                FROM orders
            ) WHERE rk <= 3
        """,
        "union_distinct": """
            SELECT DISTINCT user_id FROM (
                SELECT user_id FROM events WHERE event_type = 'purchase'
                UNION ALL
                SELECT user_id FROM events WHERE event_type = 'signup'
            )
        """,
        "intersect_users": """
            SELECT user_id FROM events WHERE event_type = 'purchase'
            INTERSECT
            SELECT user_id FROM events WHERE event_type = 'click'
        """,
        "scalar_functions": """
            SELECT o_orderkey,
                   concat_ws('-', 'ord', CAST(o_orderkey AS VARCHAR)) AS tag,
                   upper(o_orderpriority) AS prio_upper,
                   CAST(year(o_orderdate) AS INT) AS order_year,
                   CAST(quarter(o_orderdate) AS INT) AS order_quarter,
                   CAST(datediff('day', CAST(o_orderdate AS DATE), DATE '1999-01-01') AS INT)
                       AS days_to_ref,
                   CASE WHEN o_totalprice < 50000 THEN 'small'
                        WHEN o_totalprice < 200000 THEN 'medium'
                        ELSE 'large' END AS size_class,
                   CAST(floor(o_totalprice / 1000) AS BIGINT) AS price_k
            FROM orders
        """,
        "conditional_agg": """
            SELECT o_orderpriority,
                   CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_final,
                   CAST(sum(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS n_open,
                   CAST(sum(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS n_partial,
                   round(sum(CASE WHEN o_orderstatus = 'F' THEN o_totalprice ELSE 0.0 END), 2)
                       AS final_revenue
            FROM orders GROUP BY o_orderpriority
        """,
        "dedup_exact": """
            SELECT md5(text) AS text_hash,
                   min(doc_id) AS survivor_doc_id,
                   count(*) AS n_copies
            FROM documents GROUP BY md5(text)
        """,
        "doc_quality": """
            SELECT doc_id,
                   CAST(length(text) AS INT) AS text_len,
                   CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS INT) AS n_tokens,
                   round(length(text) * 1.0 /
                         len(regexp_split_to_array(trim(text), '\\s+')), 4) AS avg_token_len,
                   (length(text) = n_chars) AS len_consistent
            FROM documents
        """,
        "lang_stats": """
            SELECT lang, count(*) AS n_docs,
                   round(avg(n_chars), 4) AS avg_chars,
                   count(DISTINCT source) AS n_sources
            FROM documents GROUP BY lang
        """,
        "token_stats_by_source": """
            SELECT source,
                   CAST(sum(len(regexp_split_to_array(trim(text), '\\s+'))) AS BIGINT)
                       AS total_tokens,
                   round(avg(len(regexp_split_to_array(trim(text), '\\s+'))), 4) AS avg_tokens
            FROM documents GROUP BY source
        """,
        "knn_cosine": """
            WITH q AS (
                SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id = 0
            )
            SELECT vec_id,
                   round(list_cosine_similarity(CAST(embedding AS DOUBLE[]),
                                                (SELECT qv FROM q)), 4) AS sim
            FROM embeddings
            WHERE vec_id <> 0
            ORDER BY list_cosine_similarity(CAST(embedding AS DOUBLE[]),
                                            (SELECT qv FROM q)) DESC, vec_id ASC
            LIMIT 10
        """,
        "sessionize": """
            WITH g AS (
                SELECT user_id, ts, event_id,
                       CASE WHEN lag(ts) OVER w IS NULL
                                 OR date_diff('second', lag(ts) OVER w, ts) > 3600
                            THEN 1 ELSE 0 END AS new_sess
                FROM events
                WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
            ), s AS (
                SELECT user_id,
                       CAST(sum(new_sess) OVER (
                           PARTITION BY user_id ORDER BY ts, event_id
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
                           AS session_id
                FROM g
            )
            SELECT user_id, max(session_id) AS n_sessions, count(*) AS n_events
            FROM s GROUP BY user_id
        """,
        "fill_forward": """
            WITH nulled AS (
                SELECT user_id, event_id,
                       CASE WHEN event_type <> 'click' THEN value END AS value
                FROM events
            ), f AS (
                SELECT user_id, event_id,
                       coalesce(
                           last_value(value IGNORE NULLS) OVER (
                               PARTITION BY user_id ORDER BY event_id
                               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
                           first_value(value IGNORE NULLS) OVER (
                               PARTITION BY user_id ORDER BY event_id
                               ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
                       ) AS value
                FROM nulled
            )
            SELECT user_id, event_id, round(value, 4) AS value FROM f
        """,
        "calc_program": """
            SELECT o_orderkey,
                   round(o_totalprice * 1.08, 2) AS gross,
                   CASE o_orderstatus WHEN 'O' THEN 'open' WHEN 'F' THEN 'final'
                        WHEN 'P' THEN 'partial' ELSE 'unknown' END AS status_name,
                   150.0 AS handling_fee,
                   CAST(quarter(o_orderdate) AS INT) AS order_quarter
            FROM orders
        """,
    }
