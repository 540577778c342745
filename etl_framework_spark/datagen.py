"""Deterministic, distributed synthetic CDC change-log generator.

Everything is generated JVM-side from ``spark.range`` + column expressions
(xxhash64-keyed pseudo-randomness), so generation scales with the cluster —
no driver-side materialization, no Python in the loop. A fixed ``seed``
makes every run byte-identical (reference determinism pattern:
reference:tests/fixtures/data/test_data_factory.py:52-55).

Properties required by the north rule / test plan:

- **Zipf-ish hot-conversation skew**: a configurable fraction of events
  lands on a small set of hot conv_ids (drives the salting path).
- **Out-of-order timestamps**: ``ts`` gets a ±``jitter_s`` perturbation
  relative to LSN order, so arrival order != event-time order.
- **Duplicate deliveries**: a deterministic ~``dup_rate`` sample of events
  is re-delivered byte-identically (same lsn) for idempotence tests.
- **Schema evolution batches**: ``gen_changes(..., evolved=True)`` emits
  the widened schema (turn_idx long + tool_meta column).

Replay semantics (shared with the oracle in tests): the final state of key
``(conv_id, turn_idx)`` is decided by the event with the maximum
``(ts, lsn)``; if that winner is a delete the row is absent, otherwise it
is present with the winner's payload. Inserts and updates are both
upserts — matching MERGE ``WHEN MATCHED UPDATE / WHEN NOT MATCHED INSERT``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_framework_spark.schemas import CHANGE_SCHEMA, CHANGE_SCHEMA_EVOLVED

BASE_TS = "2026-01-01 00:00:00"


def _u(col, salt: str, seed: int):
    """Deterministic uniform [0,1) from a column + salt + seed."""
    return F.pmod(F.xxhash64(col, F.lit(salt), F.lit(seed)), F.lit(1_000_000)) / 1_000_000.0


def gen_changes(
    spark: SparkSession,
    n_events: int,
    n_convs: int = 1000,
    max_turns: int = 50,
    seed: int = 42,
    hot_frac: float = 0.30,
    n_hot: int = 3,
    delete_rate: float = 0.05,
    dup_rate: float = 0.02,
    jitter_s: int = 300,
    lsn_start: int = 1,
    evolved: bool = False,
    partitions: int | None = None,
) -> DataFrame:
    """Generate ``n_events`` change events (plus ~``dup_rate`` duplicates).

    LSNs are ``lsn_start .. lsn_start+n_events-1`` so consecutive calls with
    advancing ``lsn_start`` model a continuously tailed binlog.
    """
    rng = spark.range(0, n_events, 1, partitions or spark.sparkContext.defaultParallelism)
    i = F.col("id")

    # Skewed conversation choice: hot_frac of events hit one of n_hot
    # hot conversations, the rest are uniform over the remainder.
    is_hot = _u(i, "conv", seed) < F.lit(hot_frac)
    hot_id = F.pmod(F.xxhash64(i, F.lit("hotpick"), F.lit(seed)), F.lit(n_hot))
    cold_id = F.lit(n_hot) + F.pmod(
        F.xxhash64(i, F.lit("coldpick"), F.lit(seed)), F.lit(max(n_convs - n_hot, 1))
    )
    conv_num = F.when(is_hot, hot_id).otherwise(cold_id)

    # Event time: monotone in lsn plus bounded ± jitter -> out-of-order.
    jitter = F.pmod(F.xxhash64(i, F.lit("jit"), F.lit(seed)), F.lit(2 * jitter_s + 1)) - jitter_s

    u_op = _u(i, "op", seed)
    op = (
        F.when(u_op < F.lit(delete_rate), F.lit("D"))
        .when(u_op < F.lit(delete_rate + 0.45), F.lit("U"))
        .otherwise(F.lit("I"))
    )
    role = F.element_at(
        F.array(F.lit("user"), F.lit("assistant"), F.lit("system"), F.lit("tool")),
        (F.pmod(F.xxhash64(i, F.lit("role"), F.lit(seed)), F.lit(4)) + 1).cast("int"),
    )
    tool = F.when(
        role == "tool",
        F.element_at(
            F.array(F.lit("search"), F.lit("bash"), F.lit("browser"), F.lit("python")),
            (F.pmod(F.xxhash64(i, F.lit("tname"), F.lit(seed)), F.lit(4)) + 1).cast("int"),
        ),
    )

    df = (
        rng.select(
            op.alias("op"),
            (i + F.lit(lsn_start)).alias("lsn"),
            F.timestamp_seconds(
                F.unix_timestamp(F.lit(BASE_TS).cast("timestamp")) + i + jitter
            ).alias("ts"),
            F.concat(F.lit("conv-"), F.lpad(conv_num.cast("string"), 8, "0")).alias("conv_id"),
            F.pmod(F.xxhash64(i, F.lit("turn"), F.lit(seed)), F.lit(max_turns))
            .cast("int")
            .alias("turn_idx"),
            role.alias("role"),
            tool.alias("tool"),
        )
        # Deletes carry no after-image; payload text is a deterministic
        # function of (key, lsn) so replay comparisons are byte-stable.
        .withColumn(
            "text",
            F.when(
                F.col("op") != "D",
                F.concat(
                    F.lit("turn "),
                    F.col("turn_idx").cast("string"),
                    F.lit(" of "),
                    F.col("conv_id"),
                    F.lit(" rev "),
                    F.col("lsn").cast("string"),
                    F.lit(" :: "),
                    F.repeat(
                        F.lit("lorem ipsum dolor sit amet "),
                        (F.pmod(F.xxhash64(F.col("lsn"), F.lit("len")), F.lit(8)) + 1).cast(
                            "int"
                        ),
                    ),
                ),
            ),
        )
        .withColumn("role", F.when(F.col("op") != "D", F.col("role")))
        .withColumn("tool", F.when(F.col("op") != "D", F.col("tool")))
    )

    if evolved:
        df = df.withColumn(
            "tool_meta",
            F.when(
                F.col("tool").isNotNull(),
                F.concat(
                    F.lit('{"v":'), F.pmod(F.col("lsn"), F.lit(100)).cast("string"), F.lit("}")
                ),
            ),
        )
        schema = CHANGE_SCHEMA_EVOLVED
    else:
        schema = CHANGE_SCHEMA

    df = df.select(*[F.col(f.name).cast(f.dataType).alias(f.name) for f in schema.fields])

    if dup_rate > 0:
        # Byte-identical re-deliveries of a deterministic sample (same lsn).
        mod = max(int(round(1.0 / dup_rate)), 1)
        dups = df.where(F.pmod(F.xxhash64("lsn", F.lit("dup"), F.lit(seed)), F.lit(mod)) == 0)
        df = df.unionByName(dups)
    return df


def write_change_log(
    spark: SparkSession,
    out_dir: str,
    n_events: int,
    n_batches: int = 10,
    seed: int = 42,
    evolved_from_batch: int | None = None,
    **kw,
) -> list[str]:
    """Materialize a change log as ``n_batches`` parquet batch directories.

    Batches model binlog segments: each holds a contiguous LSN range, and
    batches >= ``evolved_from_batch`` (if set) switch to the evolved
    schema — the mid-stream schema change the north rule tests.
    """
    per = n_events // n_batches
    paths = []
    for b in range(n_batches):
        evolved = evolved_from_batch is not None and b >= evolved_from_batch
        df = gen_changes(
            spark, per, seed=seed + b, lsn_start=1 + b * per, evolved=evolved, **kw
        )
        path = f"{out_dir}/batch={b:05d}"
        df.write.mode("overwrite").parquet(path)
        paths.append(path)
    return paths
