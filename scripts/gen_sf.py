"""Deterministic distributed generator for the TPC-H-ish benchmark star
schema at ARBITRARY scale factor.

The driver ships read-only testdata at sf<=0.1; the r2 verdict's top ask
is proof that the plans hold 10x up. This generator reproduces the same
schemas and (approximate) distributions — table row counts scale
linearly, categorical cardinalities and value ranges match the sf0.1
data — so `bench.py`/the sf-ladder can run the identical queries at sf1+
on data we generate ourselves. Everything derives from `spark.range` +
xxhash64 column expressions (no driver-side materialization, no Python
in the loop), seed-stable across runs and partitionings.

Usage: python scripts/gen_sf.py <sf> <outdir> [cpus]
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

SEED = 42

REGIONS = ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]
NATIONS = [f"NATION{i:02d}" for i in range(25)]
SEGMENTS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
PTYPES = ["anodized", "brushed", "burnished", "plated", "polished", "economy"]
EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]
LANGS = ["en", "de", "es", "fr", "zh"]
# language-marker words + shared domain vocab (mirrors the driver's
# spark-flavored token stream; markers keep language-ID non-degenerate)
LANG_MARKERS = {
    "en": ["the", "and", "of", "to", "in"],
    "de": ["der", "die", "und", "das", "ist"],
    "es": ["el", "la", "de", "que", "los"],
    "fr": ["le", "la", "les", "des", "est"],
    "zh": ["de5", "shi4", "zai4", "he2", "le5"],
}
VOCAB = [
    "batch", "part", "spark", "line", "column", "order", "small", "sort",
    "fast", "value", "scan", "slow", "group", "agg", "filter", "query",
    "big", "key", "window", "row", "table", "stream", "merge", "data",
    "hash", "join", "vector", "customer", "a", "the",
]


def _u(col, salt: str):
    """Deterministic uniform [0,1)."""
    return (
        F.pmod(F.xxhash64(col, F.lit(salt), F.lit(SEED)), F.lit(1_000_000))
        / 1_000_000.0
    )


def _pick(col, salt: str, values: list[str]):
    arr = F.array(*[F.lit(v) for v in values])
    return F.element_at(arr, (F.pmod(F.xxhash64(col, F.lit(salt), F.lit(SEED)), F.lit(len(values))) + 1).cast("int"))


def _rng(spark: SparkSession, n: int, parts: int | None = None) -> DataFrame:
    return spark.range(0, n, 1, parts or max(8, min(64, n // 200_000 + 1)))


def gen_all(spark: SparkSession, sf: float, out: str) -> None:
    i = F.col("id")

    region = spark.createDataFrame(
        [(k, name) for k, name in enumerate(REGIONS)], "r_regionkey int, r_name string"
    )
    nation = spark.createDataFrame(
        [(k, NATIONS[k], k % 5) for k in range(25)],
        "n_nationkey int, n_name string, n_regionkey int",
    )

    n_cust = max(int(150_000 * sf), 100)
    customer = _rng(spark, n_cust).select(
        (i + 1).alias("c_custkey"),
        F.concat(F.lit("Customer#"), F.lpad((i + 1).cast("string"), 9, "0")).alias("c_name"),
        F.pmod(F.xxhash64(i, F.lit("cn"), F.lit(SEED)), F.lit(25)).cast("int").alias("c_nationkey"),
        F.round(_u(i, "cb") * 11_000 - 1_000, 2).alias("c_acctbal"),
        _pick(i, "cs", SEGMENTS).alias("c_mktsegment"),
    )

    n_supp = max(int(10_000 * sf), 20)
    supplier = _rng(spark, n_supp).select(
        (i + 1).alias("s_suppkey"),
        F.concat(F.lit("Supplier#"), F.lpad((i + 1).cast("string"), 9, "0")).alias("s_name"),
        F.pmod(F.xxhash64(i, F.lit("sn"), F.lit(SEED)), F.lit(25)).cast("int").alias("s_nationkey"),
        F.round(_u(i, "sb") * 11_000 - 1_000, 2).alias("s_acctbal"),
    )

    n_part = max(int(200_000 * sf), 50)
    part = _rng(spark, n_part).select(
        (i + 1).alias("p_partkey"),
        _pick(i, "pw1", VOCAB[:20]).alias("_w1"),
        _pick(i, "pw2", VOCAB[10:]).alias("_w2"),
        F.concat(F.lit("Brand#"), (F.pmod(F.xxhash64(i, F.lit("pb"), F.lit(SEED)), F.lit(25)) + 1).cast("string")).alias("p_brand"),
        _pick(i, "pt", PTYPES).alias("p_type"),
        (F.pmod(F.xxhash64(i, F.lit("psz"), F.lit(SEED)), F.lit(50)) + 1).cast("int").alias("p_size"),
        F.round(900 + _u(i, "pr") * 1_200, 2).alias("p_retailprice"),
    ).select(
        "p_partkey",
        F.concat_ws(" ", "_w1", "_w2").alias("p_name"),
        "p_brand", "p_type", "p_size", "p_retailprice",
    )

    n_ord = max(int(1_500_000 * sf), 200)
    orders = _rng(spark, n_ord).select(
        (i + 1).alias("o_orderkey"),
        (F.pmod(F.xxhash64(i, F.lit("oc"), F.lit(SEED)), F.lit(n_cust)) + 1).alias("o_custkey"),
        _pick(i, "os", ["F", "O", "P"]).alias("o_orderstatus"),
        F.round(1_000 + _u(i, "ot") * 450_000, 2).alias("o_totalprice"),
        (
            F.lit("1995-01-01").cast("timestamp")
            + F.make_interval(days=F.pmod(F.xxhash64(i, F.lit("od"), F.lit(SEED)), F.lit(2404)).cast("int"))
        ).alias("o_orderdate"),
        _pick(i, "op", PRIORITIES).alias("o_orderpriority"),
    )

    n_li = max(int(6_000_000 * sf), 500)
    lineitem = _rng(spark, n_li).select(
        (F.pmod(F.xxhash64(i, F.lit("lo"), F.lit(SEED)), F.lit(n_ord)) + 1).alias("l_orderkey"),
        (F.pmod(F.xxhash64(i, F.lit("lp"), F.lit(SEED)), F.lit(n_part)) + 1).alias("l_partkey"),
        (F.pmod(F.xxhash64(i, F.lit("ls"), F.lit(SEED)), F.lit(n_supp)) + 1).alias("l_suppkey"),
        (F.pmod(F.xxhash64(i, F.lit("ln"), F.lit(SEED)), F.lit(7)) + 1).cast("int").alias("l_linenumber"),
        F.round(1 + _u(i, "lq") * 49, 2).alias("l_quantity"),
        F.round(900 + _u(i, "le") * 104_000, 2).alias("l_extendedprice"),
        F.round(_u(i, "ld") * 0.10, 2).alias("l_discount"),
        F.round(_u(i, "lt") * 0.08, 2).alias("l_tax"),
        _pick(i, "lr", ["A", "N", "R"]).alias("l_returnflag"),
        _pick(i, "ll", ["F", "O"]).alias("l_linestatus"),
        (
            F.lit("1995-01-01").cast("timestamp")
            + F.make_interval(days=F.pmod(F.xxhash64(i, F.lit("lsd"), F.lit(SEED)), F.lit(2404)).cast("int"))
        ).alias("l_shipdate"),
    )

    n_ev = max(int(1_000_000 * sf), 200)
    n_users = max(int(15_000 * sf), 50)
    events = _rng(spark, n_ev).select(
        (i + 1).alias("event_id"),
        (
            F.lit("2024-01-01").cast("timestamp")
            + F.make_interval(secs=(F.pmod(F.xxhash64(i, F.lit("ets"), F.lit(SEED)), F.lit(30 * 86_400 * 1000)) / 1000.0))
        ).alias("ts"),
        (F.pmod(F.xxhash64(i, F.lit("eu"), F.lit(SEED)), F.lit(n_users)) + 1).alias("user_id"),
        _pick(i, "ee", EVENT_TYPES).alias("event_type"),
        F.round(_u(i, "ev") * 1_000, 3).alias("value"),
        F.concat(F.lit('{"k": '), F.pmod(F.xxhash64(i, F.lit("ep"), F.lit(SEED)), F.lit(100)).cast("string"), F.lit("}")).alias("props"),
    )

    # documents: 15-100 tokens; ~40% en; per-language marker words mixed
    # in every ~6th position; ~0.3% of docs are EXACT copies of their
    # predecessor (bounded dup clusters -> pair counts scale linearly)
    n_doc = max(int(50_000 * sf), 100)
    # base id: duplicate docs re-generate the predecessor's text (and
    # its lang — the marker words depend on it)
    base = F.when(_u(i, "dd") < 0.003, i - 1).otherwise(i)
    b = F.col("_base")
    lang = F.when(_u(b, "dl") < 0.4, F.lit("en")).otherwise(_pick(b, "dl2", LANGS))
    marker_arr = {
        lg: F.array(*[F.lit(w) for w in LANG_MARKERS[lg]]) for lg in LANGS
    }
    vocab_arr = F.array(*[F.lit(w) for w in VOCAB])

    def token(pos):
        h = F.xxhash64(F.col("_base"), pos, F.lit("dt"), F.lit(SEED))
        word = F.element_at(vocab_arr, (F.pmod(h, F.lit(len(VOCAB))) + 1).cast("int"))
        m = F.lit(None).cast("string")
        for lg in LANGS:
            m = F.when(F.col("lang") == lg, F.element_at(marker_arr[lg], (F.pmod(h, F.lit(5)) + 1).cast("int"))).otherwise(m)
        return F.when(pos % 6 == F.lit(0), m).otherwise(word)

    documents = (
        _rng(spark, n_doc)
        .select(i.alias("doc_id"), base.alias("_base"))
        .withColumn("lang", lang)
        .withColumn(
            "_ntok",
            (F.pmod(F.xxhash64(b, F.lit("dn2"), F.lit(SEED)), F.lit(86)) + 15).cast("int"),
        )
        .withColumn(
            "text",
            F.concat_ws(" ", F.transform(F.sequence(F.lit(1), F.col("_ntok")), token)),
        )
        .select(
            "doc_id",
            "text",
            "lang",
            F.concat(
                F.lit("src"),
                F.pmod(F.xxhash64(F.col("doc_id"), F.lit("dsrc"), F.lit(SEED)), F.lit(20)).cast("string"),
            ).alias("source"),
            F.length("text").cast("long").alias("n_chars"),
        )
    )

    # embeddings: 64-dim, 10 cluster centers + noise (gives IVF/near-dup
    # structure); ~1% near-duplicate pairs via tiny-noise copies
    n_emb = max(int(20_000 * sf), 100)
    dims = F.sequence(F.lit(0), F.lit(63))
    near_dup = _u(i, "end") < 0.01
    src_id = F.when(near_dup, i - 1).otherwise(i)

    def dim_val(d):
        # near-dup copies REPRODUCE the source vector (center of the
        # source's cluster + the source's noise) and add tiny jitter —
        # so cosine(copy, source) ~ 0.999 while unrelated pairs sit far
        # lower; gives the near-dup operators real structure.
        center = (
            F.pmod(F.xxhash64(F.col("_lbl"), d, F.lit("ec"), F.lit(SEED)), F.lit(2001)) - 1000
        ) / 1000.0
        noise = (
            (F.pmod(F.xxhash64(F.col("_sid"), d, F.lit("en"), F.lit(SEED)), F.lit(2001)) - 1000)
            / 1000.0
        ) * 0.6
        jitter = F.when(
            F.col("_isdup"),
            (
                (F.pmod(F.xxhash64(F.col("vec_id"), d, F.lit("ej"), F.lit(SEED)), F.lit(2001)) - 1000)
                / 1000.0
            )
            * 0.02,
        ).otherwise(F.lit(0.0))
        return (center + noise + jitter).cast("float")

    embeddings = (
        _rng(spark, n_emb)
        .select(i.alias("vec_id"), src_id.alias("_sid"), near_dup.alias("_isdup"))
        .withColumn(
            "_lbl",
            F.pmod(F.xxhash64(F.col("_sid"), F.lit("el"), F.lit(SEED)), F.lit(10)).cast("int"),
        )
        .select(
            "vec_id",
            F.transform(dims, dim_val).alias("embedding"),
            F.col("_lbl").alias("label"),
        )
    )

    for name, df in [
        ("region", region), ("nation", nation), ("customer", customer),
        ("supplier", supplier), ("part", part), ("orders", orders),
        ("lineitem", lineitem), ("events", events), ("documents", documents),
        ("embeddings", embeddings),
    ]:
        df.write.mode("overwrite").parquet(f"{out}/{name}.parquet")
        print(f"[gen_sf] wrote {name}", file=sys.stderr)


def main() -> int:
    sf = float(sys.argv[1])
    out = sys.argv[2]
    cpus = sys.argv[3] if len(sys.argv) > 3 else "32"
    from etl_framework_spark.session import get_spark

    spark = get_spark(app_name=f"gen_sf{sf}", master=f"local[{cpus}]")
    gen_all(spark, sf, out)
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
