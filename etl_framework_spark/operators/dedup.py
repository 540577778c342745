"""Document deduplication operators (exact + near-dup families).

Training-data pipeline operators over a ``documents(doc_id, text, ...)``
table. All hot-path computation is JVM-side Column expressions (split/
transform/md5/xxhash64) — no Python in the loop — so every operator
scales linearly with executors and shuffles only what the algorithm
requires:

- ``exact_dedup``        — hash-groupBy on a text digest. One shuffle of
  (digest, doc_id); map-side partial agg collapses duplicates early.
- ``minhash_signatures`` — k lexicographic-min md5 signatures over word
  shingles. Embarrassingly parallel (no shuffle).
- ``lsh_candidate_pairs``— band the signature (b bands x r rows), shuffle
  once on (band, band_hash), emit within-bucket pairs. The classic
  MinHash-LSH plan: pair blow-up is bounded per bucket, hot buckets are
  bounded by ``max_bucket`` (skip-and-log, the standard guard against
  degenerate shingles at web scale).
- ``ngram_jaccard_pairs``— exact Jaccard for a candidate set via
  explode + self-join + group. Used to confirm LSH candidates.
- ``simhash64``          — 64-bit SimHash from per-token md5 bits
  (bit-parallel aggregate, no UDF).
- ``embedding_near_dup`` — cosine-threshold pairs; brute within buckets
  from random-hyperplane LSH (scale path) or over a bounded id range
  (oracle path).

The md5-of-string primitives are chosen over xxhash64 where an operator
must be replayable in ANSI SQL (the DuckDB oracle can compute the same
lexicographic min over md5 hex strings); pure-Spark paths use xxhash64
(cheaper, 64-bit native).

Reference parity: the reference's only dedup surface is the
``drop_duplicates`` load flag
(reference:src/etl_framework/core/load_strategy.py:73); this module is the
scale-path generalization the north rule's training-data pipeline needs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# tokenization / shingling (shared by minhash + jaccard so both sides of an
# LSH-confirm pipeline see identical shingles; mirrored 1:1 in oracle SQL)
# ---------------------------------------------------------------------------


def tokens_expr(text_col: str = "text"):
    """Whitespace tokens of trimmed text (deterministic, locale-free)."""
    return F.split(F.trim(F.col(text_col)), r"\s+")


def shingles_expr(text_col: str = "text", n: int = 3):
    """Distinct word n-gram shingles as an array<string> column.

    ``transform(sequence(...))`` keeps shingling inside codegen — no
    explode is materialized unless the consumer asks for it.
    """
    toks = tokens_expr(text_col)
    n_sh = F.greatest(F.size(toks) - (n - 1), F.lit(1))
    # try_element_at: docs shorter than n tokens yield one truncated
    # shingle (concat_ws skips the NULLs) instead of an ANSI error.
    gram = lambda i: F.concat_ws(  # noqa: E731
        " ", *[F.try_element_at(toks, i + F.lit(j)) for j in range(n)]
    )
    return F.array_distinct(F.transform(F.sequence(F.lit(1), n_sh), gram))


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------


def exact_dedup(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """One survivor (min id) per exact text digest.

    groupBy(md5) gets map-side partial aggregation: at 100 TB each
    executor collapses its local copies before the single shuffle, so
    shuffle volume ~ |distinct texts|, not |docs|.
    """
    return docs.groupBy(F.md5(F.col(text_col)).alias("text_hash")).agg(
        F.min(id_col).alias("survivor_" + id_col),
        F.count("*").alias("n_copies"),
    )


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------


def minhash_signatures(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 16,
    shingle_n: int = 3,
) -> DataFrame:
    """(id, sig: array<string>[num_hashes]) MinHash signatures.

    Permutation j is "order shingles by md5(shingle || '#j')"; the min
    md5 hex string is the signature component. String mins are ~2x the
    bytes of int64 mins but replay identically in any SQL engine —
    signatures are an artifact other systems must be able to recompute.
    """
    sh = shingles_expr(text_col, shingle_n).alias("_sh")
    sig = F.array(
        *[
            F.array_min(
                F.transform(
                    F.col("_sh"),
                    lambda s, j=j: F.md5(F.concat(s, F.lit(f"#{j}"))),
                )
            )
            for j in range(num_hashes)
        ]
    )
    return docs.select(F.col(id_col), sh).select(id_col, sig.alias("sig"))


def lsh_candidate_pairs(
    sigs: DataFrame,
    id_col: str = "doc_id",
    bands: int = 4,
    rows_per_band: int = 4,
    max_bucket: int = 50,
) -> DataFrame:
    """Near-dup candidate pairs (a < b) from banded MinHash signatures.

    One shuffle on (band, band_hash); a self-join inside each bucket
    emits pairs. Buckets larger than ``max_bucket`` are dropped — at web
    scale a degenerate bucket (empty docs, boilerplate) would emit
    O(n^2) pairs and dominate the stage; candidates lost this way are
    boilerplate by construction.
    """
    assert bands * rows_per_band <= 256
    band = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(b).alias("band"),
                    F.md5(
                        F.concat_ws(
                            "|",
                            *[
                                F.element_at("sig", b * rows_per_band + r + 1)
                                for r in range(rows_per_band)
                            ],
                        )
                    ).alias("bh"),
                )
                for b in range(bands)
            ]
        )
    )
    buckets = sigs.select(F.col(id_col).alias("id"), band.alias("b")).select(
        "id", F.col("b.band").alias("band"), F.col("b.bh").alias("bh")
    )
    grouped = buckets.groupBy("band", "bh").agg(F.collect_list("id").alias("ids"))
    bounded = grouped.where(
        (F.size("ids") > 1) & (F.size("ids") <= max_bucket)
    ).select(F.array_sort("ids").alias("ids"))
    pairs = bounded.select(
        F.explode(
            F.flatten(
                F.transform(
                    F.sequence(F.lit(1), F.size("ids") - 1),
                    lambda i: F.transform(
                        F.sequence(i + 1, F.size("ids")),
                        lambda j: F.struct(
                            F.element_at("ids", i).alias("a"),
                            F.element_at("ids", j).alias("b"),
                        ),
                    ),
                )
            )
        ).alias("p")
    )
    return pairs.select("p.a", "p.b").distinct()


def ngram_jaccard_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_n: int = 3,
    threshold: float = 0.5,
    candidates: DataFrame | None = None,
) -> DataFrame:
    """Exact n-gram Jaccard similarity for pairs (a < b) >= threshold.

    Plan: explode distinct shingles, self-join on shingle (one shuffle,
    partial-agg'd), count common, then |A u B| = |A| + |B| - common.
    ``candidates`` (from LSH) restricts the join to candidate pairs —
    the 100 TB path; without it this is exact all-pairs (test scale).
    """
    sh = docs.select(
        F.col(id_col).alias("id"), F.explode(shingles_expr(text_col, shingle_n)).alias("s")
    )
    sizes = sh.groupBy("id").agg(F.count("*").alias("n"))
    a, b = sh.alias("l"), sh.alias("r")
    common = (
        a.join(b, (F.col("l.s") == F.col("r.s")) & (F.col("l.id") < F.col("r.id")))
        .groupBy(F.col("l.id").alias("a"), F.col("r.id").alias("b"))
        .agg(F.count("*").alias("common"))
    )
    if candidates is not None:
        common = common.join(candidates, ["a", "b"], "left_semi")
    sa = sizes.select(F.col("id").alias("a"), F.col("n").alias("na"))
    sb = sizes.select(F.col("id").alias("b"), F.col("n").alias("nb"))
    return (
        common.join(sa, "a")
        .join(sb, "b")
        .select(
            "a",
            "b",
            (F.col("common") / (F.col("na") + F.col("nb") - F.col("common"))).alias("jaccard"),
        )
        .where(F.col("jaccard") >= threshold)
    )


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


def simhash64(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text", bits: int = 16
) -> DataFrame:
    """(id, simhash) — ``bits``-bit SimHash over whitespace tokens.

    Per-token hash = first 16 md5 hex chars as int64 (SQL-replayable).
    For bit k: sum over tokens of (+1 if bit set else -1); simhash bit k
    = sign. Implemented as one aggregate over an array of per-bit votes
    (aggregate/zip_with) — stays in codegen, zero UDFs.

    16 bits (default) keeps the oracle cheap; production would use 64
    (same expression, bits=64).
    """
    toks = tokens_expr(text_col)
    # hash every token ONCE (md5 is the expensive part), then vote per
    # bit over the hash array. Bit masks are Python-int literals so the
    # whole expression stays static for codegen.
    hashes = F.transform(
        toks, lambda t: F.conv(F.substring(F.md5(t), 1, 15), 16, 10).cast("long")
    ).alias("_h")
    vote = lambda k: F.aggregate(  # noqa: E731
        F.col("_h"),
        F.lit(0).cast("long"),
        lambda acc, hv: acc
        + F.when(hv.bitwiseAND(F.lit(1 << k)) != 0, 1).otherwise(-1).cast("long"),
    )
    with_h = docs.select(F.col(id_col), hashes)
    sim = sum(
        [
            F.when(vote(k) > 0, F.lit(1 << k).cast("long")).otherwise(F.lit(0).cast("long"))
            for k in range(bits)
        ],
        F.lit(0).cast("long"),
    )
    return with_h.select(F.col(id_col), sim.alias("simhash"))


def simhash_near_pairs(
    hashes: DataFrame, id_col: str = "doc_id", max_hamming: int = 3, bits: int = 16
) -> DataFrame:
    """Pairs (a < b) with Hamming distance <= max_hamming.

    Scale path: block on the high half of the hash (near-dups almost
    always share it when max_hamming << bits/2 — the standard
    Charikar-style banding), pair within blocks, then exact popcount
    filter. One shuffle on the block key.
    """
    half = bits // 2
    blocked = hashes.select(
        F.col(id_col).alias("id"),
        F.col("simhash"),
        F.shiftright("simhash", half).alias("block"),
    )
    l, r = blocked.alias("l"), blocked.alias("r")
    pairs = l.join(
        r, (F.col("l.block") == F.col("r.block")) & (F.col("l.id") < F.col("r.id"))
    )
    xor = F.col("l.simhash").bitwiseXOR(F.col("r.simhash"))
    hamming = sum(
        [F.shiftright(xor, k).bitwiseAND(F.lit(1)).cast("int") for k in range(bits)],
        F.lit(0),
    )
    return pairs.select(
        F.col("l.id").alias("a"), F.col("r.id").alias("b"), hamming.alias("hamming")
    ).where(F.col("hamming") <= max_hamming)


# ---------------------------------------------------------------------------
# embedding near-dup
# ---------------------------------------------------------------------------


def cosine_expr(a, b):
    """Cosine similarity of two array<double> columns, pure codegen."""
    dot = F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda s, x: s + x)
    na = F.sqrt(F.aggregate(F.transform(a, lambda x: x * x), F.lit(0.0), lambda s, x: s + x))
    nb = F.sqrt(F.aggregate(F.transform(b, lambda x: x * x), F.lit(0.0), lambda s, x: s + x))
    return dot / (na * nb)


def embedding_near_dup(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    lsh_bits: int = 0,
    seed: int = 42,
) -> DataFrame:
    """Vector pairs (a < b) with cosine >= threshold.

    ``lsh_bits=0``: exact all-pairs (bounded inputs / oracle parity).
    ``lsh_bits>0``: random-hyperplane LSH — sign-pattern bucket key from
    ``lsh_bits`` deterministic pseudo-hyperplanes (hash-derived, no
    driver-side randomness), pair only within buckets. Recall is
    tunable by re-running with rotated seeds and unioning.
    """
    v = F.col(vec_col).cast("array<double>")
    base = emb.select(F.col(id_col).alias("id"), v.alias("v"))
    if lsh_bits > 0:
        # hyperplane h_k[d] = centered hash of (seed, k, d): deterministic,
        # computed inline; sign bits -> bucket string.
        dim = F.size("v")
        bit = lambda k: F.when(  # noqa: E731
            F.aggregate(
                F.zip_with(
                    F.col("v"),
                    F.transform(
                        F.sequence(F.lit(0), dim - 1),
                        lambda d: (
                            F.pmod(
                                F.xxhash64(F.lit(seed), F.lit(k), d), F.lit(2001)
                            ).cast("double")
                            - 1000.0
                        ),
                    ),
                    lambda x, h: x * h,
                ),
                F.lit(0.0),
                lambda s, x: s + x,
            )
            > 0,
            F.lit("1"),
        ).otherwise(F.lit("0"))
        base = base.withColumn("bucket", F.concat(*[bit(k) for k in range(lsh_bits)]))
        l, r = base.alias("l"), base.alias("r")
        pairs = l.join(
            r, (F.col("l.bucket") == F.col("r.bucket")) & (F.col("l.id") < F.col("r.id"))
        )
    else:
        l, r = base.alias("l"), base.alias("r")
        pairs = l.join(r, F.col("l.id") < F.col("r.id"))
    sim = cosine_expr(F.col("l.v"), F.col("r.v"))
    return pairs.select(
        F.col("l.id").alias("a"), F.col("r.id").alias("b"), sim.alias("cosine")
    ).where(F.col("cosine") >= threshold)
