"""Training-data pipeline operators: dedup, text, similarity, multimodal.

Pattern follows the reference's golden-recompute style
(reference:tests/functional/workflows/test_business_workflow.py:71-90):
plant known structure (duplicates, near-duplicates, known strings),
assert the operator recovers exactly it.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from etl_framework_spark.operators import (
    embedding_near_dup,
    exact_dedup,
    fingerprint,
    fingerprint_overlap_pairs,
    ivf_build,
    knn_brute,
    knn_ivf,
    language_id,
    lsh_candidate_pairs,
    minhash_signatures,
    ngram_jaccard_pairs,
    quality_features,
    simhash64,
    simhash_near_pairs,
)
from etl_framework_spark.operators.multimodal import (
    gen_media,
    image_features,
    sample_frames,
)

BASE = (
    "the quick brown fox jumps over the lazy dog while the cat watches "
    "from the warm windowsill in the afternoon sun"
)
NEAR = BASE.replace("afternoon", "evening")  # one token differs
OTHER = "completely different content about database engines and vectorized execution plans"


@pytest.fixture(scope="module")
def docs(spark):
    rows = [(0, BASE), (1, BASE), (2, NEAR), (3, OTHER), (4, "tiny"), (5, "")]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_dedup_groups_identical_texts(docs):
    out = exact_dedup(docs).collect()
    by_copies = {r["n_copies"]: r for r in out}
    assert len(out) == 5  # 6 docs, one exact dup pair
    assert by_copies[2]["survivor_doc_id"] == 0


def test_minhash_identical_docs_identical_sigs(docs):
    sigs = {r["doc_id"]: r["sig"] for r in minhash_signatures(docs).collect()}
    assert sigs[0] == sigs[1]
    assert sigs[0] != sigs[3]
    assert len(sigs[0]) == 16


def test_lsh_finds_exact_and_near_duplicates(docs):
    sigs = minhash_signatures(docs, num_hashes=16)
    pairs = {(r["a"], r["b"]) for r in lsh_candidate_pairs(sigs, bands=8, rows_per_band=2).collect()}
    assert (0, 1) in pairs  # identical: all bands collide
    assert (0, 2) in pairs or (1, 2) in pairs  # near-dup: high sig overlap
    assert (0, 3) not in pairs  # unrelated


def test_ngram_jaccard_exact_values(docs):
    pairs = {(r["a"], r["b"]): r["jaccard"] for r in ngram_jaccard_pairs(docs, threshold=0.1).collect()}
    assert pairs[(0, 1)] == pytest.approx(1.0)
    # "afternoon" is token 20 of 21 -> appears in exactly 2 of the 19
    # distinct trigrams: |A∩B| = 17, |A∪B| = 21
    assert pairs[(0, 2)] == pytest.approx(17 / 21, abs=1e-6)
    assert (0, 3) not in pairs


def test_simhash_identity_and_near_pairs(docs):
    hashes = simhash64(docs, bits=16)
    vals = {r["doc_id"]: r["simhash"] for r in hashes.collect()}
    assert vals[0] == vals[1]
    assert all(0 <= v < 2**16 for v in vals.values())
    pairs = {(r["a"], r["b"]): r["hamming"] for r in simhash_near_pairs(hashes, max_hamming=3, bits=16).collect()}
    assert pairs[(0, 1)] == 0


def test_fingerprint_dups_and_overlap(docs):
    fps = fingerprint(docs)
    vals = {r["doc_id"]: r["fp"] for r in fps.collect()}
    assert vals[0] == vals[1]
    assert sorted(vals[0]) == list(vals[0])
    pairs = {(r["a"], r["b"]) for r in fingerprint_overlap_pairs(fps, min_common=3, max_df=5).collect()}
    assert (0, 1) in pairs
    assert (0, 3) not in pairs


def test_quality_features_known_string(spark):
    df = spark.createDataFrame([(1, "Hello, world! ABC 42")], "doc_id long, text string")
    r = quality_features(df).collect()[0]
    assert r["n_tokens"] == 4
    # Hello , world ! ABC 42
    assert r["n_subtokens"] == 6
    assert r["n_chars_m"] == 20
    # punct: , ! -> 2/20 ; spaces: 3/20 ; upper: H ABC -> 4 of 13 letters
    assert r["punct_ratio"] == pytest.approx(2 / 20)
    assert r["space_ratio"] == pytest.approx(3 / 20)
    assert r["upper_ratio"] == pytest.approx(4 / 13)


def test_language_id_routes_by_stopwords(spark):
    df = spark.createDataFrame(
        [
            (1, "the cat and the dog sat in a corner of the room"),
            (2, "der hund und die katze sind nicht in der wohnung"),
            (3, "le chien et le chat sont dans la maison pour un moment"),
            (4, "xyzzy plugh qwerty"),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r["lang_pred"] for r in language_id(df).collect()}
    assert out[1] == "en" and out[2] == "de" and out[3] == "fr" and out[4] == "unknown"


# ---------------------------------------------------------------------------
# embeddings
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def vecs(spark):
    import numpy as np

    rng = np.random.default_rng(7)
    base = rng.normal(size=(20, 8))
    rows = [(i, [float(x) for x in base[i]]) for i in range(20)]
    # vec 20 = near-copy of vec 0
    rows.append((20, [float(x) + 0.01 for x in base[0]]))
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_embedding_near_dup_exact_and_lsh(vecs):
    exact = {(r["a"], r["b"]) for r in embedding_near_dup(vecs, threshold=0.99).collect()}
    assert exact == {(0, 20)}
    lsh = {(r["a"], r["b"]) for r in embedding_near_dup(vecs, threshold=0.99, lsh_bits=2).collect()}
    assert lsh == {(0, 20)}  # near-identical vectors share all sign bits


def test_knn_brute_and_vectorized_agree(vecs):
    q = [float(x) for x in vecs.where("vec_id = 0").head()["embedding"]]
    a = [(r["vec_id"], round(r["sim"], 9)) for r in knn_brute(vecs, q, k=5, exclude_ids=[0]).collect()]
    b = [(r["vec_id"], round(r["sim"], 9)) for r in knn_brute(vecs, q, k=5, exclude_ids=[0], vectorized=True).collect()]
    assert [x[0] for x in a] == [x[0] for x in b]
    assert a[0][0] == 20 and a[0][1] == pytest.approx(1.0, abs=1e-3)


def test_knn_ivf_full_probe_matches_brute(vecs):
    q = [float(x) for x in vecs.where("vec_id = 1").head()["embedding"]]
    assigned, cents = ivf_build(vecs, n_centroids=4)
    brute = [r["vec_id"] for r in knn_brute(vecs, q, k=5).collect()]
    ivf_all = [r["vec_id"] for r in knn_ivf(assigned, cents, q, k=5, nprobe=4).collect()]
    assert ivf_all == brute  # probing every centroid == exact
    ivf_1 = [r["vec_id"] for r in knn_ivf(assigned, cents, q, k=5, nprobe=1).collect()]
    assert 1 in ivf_1  # query vector itself lives in the probed cell


# ---------------------------------------------------------------------------
# multimodal plumbing
# ---------------------------------------------------------------------------


def test_media_features_deterministic_and_typed(spark):
    m = gen_media(spark, 30, seed=9)
    f1 = image_features(m).orderBy("media_id").collect()
    f2 = image_features(gen_media(spark, 30, seed=9)).orderBy("media_id").collect()
    assert [r["sha256"] for r in f1] == [r["sha256"] for r in f2]
    assert len(f1) == 10  # ids 0,3,..,27 are images
    r = f1[0]
    assert r["out_width"] == 32 and len(r["embedding"]) == 16
    assert 0.0 <= r["mean_luma"] <= 255.0


def test_media_null_payload_yields_null_features(spark):
    m = gen_media(spark, 3, seed=1).withColumn(
        "payload", F.when(F.col("media_id") == 0, None).otherwise(F.col("payload"))
    )
    rows = {r["media_id"]: r for r in image_features(m).collect()}
    assert rows[0]["sha256"] is None  # decode failure -> null features, row kept


def test_image_features_custom_decoder_injected(spark):
    # A user-supplied decoder flows through the same Arrow-batch stage:
    # constant-gray frames -> luma coefficients sum to 1.0 -> mean_luma
    # equals the gray level exactly, which the stub could never produce.
    def flat_gray(payload, target):
        if payload is None:
            raise ValueError("cannot decode null payload")
        return np.full((target[1], target[0], 3), 100, dtype=np.uint8)

    m = gen_media(spark, 12, seed=9)
    rows = image_features(m, decoder=flat_gray).collect()
    assert rows and all(abs(r["mean_luma"] - 100.0) < 1e-9 for r in rows)
    # and a decoder failure still yields a null-feature row, not a dead task
    def picky(payload, target):
        raise ValueError("corrupt")

    rows = image_features(m, decoder=picky).collect()
    assert rows and all(r["sha256"] is None for r in rows)
    # real codecs raise their OWN classes on corrupt payloads (e.g.
    # PIL.UnidentifiedImageError is an OSError) — same contract applies
    def oserror_codec(payload, target):
        raise OSError("cannot identify image file")

    rows = image_features(m, decoder=oserror_codec).collect()
    assert rows and all(r["sha256"] is None for r in rows)


def test_pil_image_decoder_both_arms(spark):
    import importlib.util

    from etl_framework_spark.operators.multimodal import pil_image_decoder

    if importlib.util.find_spec("PIL") is None:
        with pytest.raises(ImportError, match="Pillow"):
            pil_image_decoder()
        return
    # PIL-present arm: decode a real 2x2 PNG through the full stage
    import io

    from PIL import Image

    buf = io.BytesIO()
    Image.new("RGB", (2, 2), (10, 20, 30)).save(buf, format="PNG")
    m = gen_media(spark, 3, seed=1).withColumn("payload", F.lit(buf.getvalue()))
    r = image_features(m, decoder=pil_image_decoder()).collect()
    assert r and all(row["sha256"] is not None for row in r)


def test_sample_frames_custom_extractor_injected(spark):
    import hashlib

    m = gen_media(spark, 30, seed=9)
    frames = sample_frames(m, every_ms=5000, frame_extractor=lambda p, ms, i: b"x").collect()
    want = hashlib.sha256(b"x").hexdigest()
    assert frames and all(r["frame_sha256"] == want for r in frames)


def test_frame_sampling_counts_match_duration(spark):
    m = gen_media(spark, 30, seed=9)
    frames = sample_frames(m, every_ms=5000)
    per = frames.groupBy("media_id").count().collect()
    metas = {r["media_id"]: r["meta"] for r in m.collect()}
    for row in per:
        meta = metas[row["media_id"]]
        assert meta["media_type"] == "video"
        expect = len(range(0, meta["duration_ms"], 5000))
        assert row["count"] == expect


def test_asof_join_backward_and_forward(spark):
    from etl_framework_spark.operators.asof import asof_join

    trades = spark.createDataFrame(
        [("A", 1, 100.0), ("A", 5, 101.0), ("A", 9, 99.0), ("B", 3, 50.0)],
        "sym string, t long, px double",
    )
    quotes = spark.createDataFrame(
        [("A", 0, 99.5), ("A", 4, 100.5), ("A", 5, 100.7), ("B", 10, 49.0)],
        "sym string, t long, bid double",
    )
    back = {(r["sym"], r["t"]): (r["bid"], r["t_r"]) for r in asof_join(
        trades, quotes, on=["sym"], left_ts="t", right_ts="t").collect()}
    # latest quote at-or-before each trade; equal ts is visible
    assert back[("A", 1)] == (99.5, 0)
    assert back[("A", 5)] == (100.7, 5)
    assert back[("A", 9)] == (100.7, 5)
    assert back[("B", 3)] == (None, None)
    fwd = {(r["sym"], r["t"]): r["t_r"] for r in asof_join(
        trades, quotes, on=["sym"], left_ts="t", right_ts="t",
        direction="forward").collect()}
    assert fwd[("A", 1)] == 4 and fwd[("A", 9)] is None and fwd[("B", 3)] == 10


def test_asof_join_null_right_field_stays_row_atomic(spark):
    from etl_framework_spark.operators.asof import asof_join

    left = spark.createDataFrame([("K", 10)], "k string, t long")
    right = spark.createDataFrame(
        [("K", 1, "old"), ("K", 5, None)], "k string, t long, v string"
    )
    # nearest right row (t=5) has v=NULL; the join must NOT splice v from
    # the older row — the whole right row is carried atomically
    r = asof_join(left, right, on=["k"], left_ts="t", right_ts="t").head()
    assert r["t_r"] == 5 and r["v"] is None


def test_lsh_degenerate_bucket_bounded_before_collect(spark):
    """A degenerate bucket (10^5 identical docs) must be dropped by the
    pre-aggregated size guard BEFORE collect_list materializes it —
    completing quickly with zero pairs rather than buffering 10^5 ids."""
    n = 100_000
    df = spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.lit("boilerplate text repeated on every single page").alias("text"),
    )
    sigs = minhash_signatures(df, num_hashes=4)
    out = lsh_candidate_pairs(sigs, bands=2, rows_per_band=2, max_bucket=50)
    assert out.count() == 0


def test_simhash_multiblock_full_recall(spark):
    """Multi-block candidates must be COMPLETE for hamming <= max_hamming
    — including pairs whose differing bits all sit in the high half (the
    recall hole of the old single-high-half blocking)."""
    import itertools

    h0 = 0x0123456789ABCDE
    rows = [
        (0, h0),
        (1, h0 ^ (1 << 58)),              # 1 high bit — old scheme missed this
        (2, h0 ^ 0b111),                  # 3 low bits
        (3, h0 ^ (1 << 59) ^ 1),          # split high+low
        (4, h0 ^ 0x3FF),                  # hamming 10 from h0: excluded
    ]
    df = spark.createDataFrame(rows, "doc_id long, simhash long")
    got = {
        (r["a"], r["b"]): r["hamming"]
        for r in simhash_near_pairs(df, max_hamming=3, bits=60).collect()
    }
    exact = {
        (i, j): bin(a ^ b).count("1")
        for (i, a), (j, b) in itertools.combinations(rows, 2)
        if bin(a ^ b).count("1") <= 3
    }
    assert got == exact
    assert (0, 1) in got


def test_simhash_wide_keys_bound_join_fanout(spark):
    """Manku combination tables (r2 verdict ask #2): a corpus that is
    pathologically hot on one narrow block — every doc shares the same
    low 15 bits, which under the minimal 4-block scheme is exactly one
    join key holding ALL n docs (quadratic fan-out) — must spread over
    the 30-bit combination keys with bounded per-key group size."""
    from pyspark.sql import functions as F

    from etl_framework_spark.operators.dedup import simhash_key_expr, simhash_tables

    n = 2000
    # deterministic pseudo-random high 45 bits, fixed low 15 bits
    rows = [(i, ((i * 2_654_435_761) % (1 << 45)) << 15 | 0x1234) for i in range(n)]
    df = spark.createDataFrame(rows, "doc_id long, simhash long")

    tables = simhash_tables(60, 3)
    assert len(tables) == 20 and all(len(t) == 3 for t in tables)
    # every combination key spans >= 20 pseudo-random bits here, so no
    # key value may collect more than a handful of docs
    exploded = df.select(
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(t).alias("tbl"), simhash_key_expr(tbl).alias("kv"))
                    for t, tbl in enumerate(tables)
                ]
            )
        ).alias("b")
    ).select("b.tbl", "b.kv")
    max_group = (
        exploded.groupBy("tbl", "kv").count().agg(F.max("count")).collect()[0][0]
    )
    assert max_group <= 10, f"hot-block corpus produced a {max_group}-row join key"
    # sanity: the minimal scheme's single low-block key WOULD have been
    # one n-row group (all docs share the low 15 bits by construction)
    assert df.select((F.col("simhash") % (1 << 15)).alias("lo")).distinct().count() == 1

    # true degenerate corpora (identical hashes) are handled by the
    # explicit max_key_rows guard, traded against recall
    dup = spark.createDataFrame([(i, 7) for i in range(100)], "doc_id long, simhash long")
    assert simhash_near_pairs(dup, max_hamming=3, bits=60).count() == 100 * 99 // 2
    assert simhash_near_pairs(dup, max_hamming=3, bits=60, max_key_rows=50).count() == 0


def test_ngram_jaccard_candidate_pushdown_matches_unrestricted(spark, docs):
    """With a candidate set, results must equal the unrestricted run
    filtered to those pairs (the semi-join moved before the self-join
    must not change semantics)."""
    cands = spark.createDataFrame([(0, 2)], "a long, b long")
    full = {
        (r["a"], r["b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(docs, threshold=0.1).collect()
    }
    restricted = {
        (r["a"], r["b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(docs, threshold=0.1, candidates=cands).collect()
    }
    assert restricted == {(0, 2): full[(0, 2)]}


def test_embedding_near_dup_bucket_guard(spark):
    """Dense-cluster corpora make hyperplane buckets quadratic; the
    max_bucket guard drops oversized buckets before the join (sf-ladder
    finding, round 3). Small buckets are unaffected."""
    from pyspark.sql import functions as F

    from etl_framework_spark.operators.dedup import embedding_near_dup

    # 200 near-identical vectors (one dense cluster) + 20 dispersed
    dense = spark.range(200).select(
        F.col("id").alias("vec_id"),
        F.transform(
            F.sequence(F.lit(0), F.lit(15)),
            lambda d: (d + 1.0 + (F.col("id") % 3) * 1e-4).cast("double"),
        ).alias("embedding"),
    )
    sparse = spark.range(200, 220).select(
        F.col("id").alias("vec_id"),
        F.transform(
            F.sequence(F.lit(0), F.lit(15)),
            lambda d: ((F.xxhash64(F.col("id"), d) % 1000) / 500.0 - 1.0).cast("double"),
        ).alias("embedding"),
    )
    emb = dense.unionByName(sparse)
    unguarded = embedding_near_dup(emb, threshold=0.99, lsh_bits=8).count()
    assert unguarded >= 200 * 199 // 2  # dense cluster emits quadratic pairs
    guarded = embedding_near_dup(emb, threshold=0.99, lsh_bits=8, max_bucket=50).count()
    assert guarded < 200  # oversized bucket dropped before the join
