"""Multimodal (image/audio/video) column plumbing.

Media travel as opaque ``binary`` columns plus a typed metadata struct;
all per-byte work happens in Arrow-batched ``mapInPandas`` stages so the
Python boundary is crossed once per batch, never per row. The actual
codec calls (PIL/libav) are STUBBED — the container has no media libs —
behind ``_decode_image_stub``/``_decode_audio_stub``: deterministic fakes
with the real output shapes, so the Spark-side contract (schemas, batch
iteration, partition sizing, null handling) is fully real and tested and
a production deploy only swaps the stub body.

Layout rule at 100 TB: media rows are orders of magnitude wider than
text rows — repartition by size budget (``repartition_for_media``), not
row count, so one straggler partition of 4K videos doesn't pin a stage.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: typed metadata carried next to every media blob.
MEDIA_META = T.StructType(
    [
        T.StructField("media_type", T.StringType(), False),  # image|audio|video
        T.StructField("format", T.StringType(), True),  # png|wav|mp4|...
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("sample_rate", T.IntegerType(), True),
        T.StructField("duration_ms", T.LongType(), True),
    ]
)

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("meta", MEDIA_META, True),
    ]
)

IMAGE_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("sha256", T.StringType(), True),
        T.StructField("n_bytes", T.IntegerType(), True),
        T.StructField("out_width", T.IntegerType(), True),
        T.StructField("out_height", T.IntegerType(), True),
        T.StructField("mean_luma", T.DoubleType(), True),
        T.StructField("embedding", T.ArrayType(T.FloatType()), True),
    ]
)

FRAME_SAMPLE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("frame_idx", T.IntegerType(), False),
        T.StructField("frame_ms", T.LongType(), False),
        T.StructField("frame_sha256", T.StringType(), True),
    ]
)


def _decode_image_stub(payload: bytes, target: tuple[int, int]) -> np.ndarray:
    """STUB decode+resize (the DEFAULT decoder — deterministic, so the
    driver oracle and exact-value tests stay stable). Production swaps
    in ``pil_image_decoder()`` (or any ``(payload, (w, h)) -> HxWx3
    uint8 array`` callable) via ``image_features(decoder=...)`` — same
    Arrow-batch stage, zero plumbing changes. Raises on None like a
    real decoder would."""
    if payload is None:
        raise ValueError("cannot decode null payload")
    seed = int.from_bytes(hashlib.sha256(payload).digest()[:8], "big")
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(target[1], target[0], 3), dtype=np.uint8)


def pil_image_decoder():
    """A REAL image decoder for ``image_features`` — import-gated like
    the xlsx/pdf codecs: returns a ``(payload, (w, h)) -> np.ndarray``
    callable backed by Pillow, or raises ImportError when Pillow is not
    installed (this container ships none; the test suite exercises both
    arms). Executors must also have Pillow — the closure pickles the
    module by reference, the normal cluster-deps contract."""
    try:
        import io

        from PIL import Image
    except ImportError as e:  # pragma: no cover - env-dependent arm
        raise ImportError(
            "Pillow not installed; omit `decoder` to use the deterministic stub"
        ) from e

    def decode(payload: bytes, target: tuple[int, int]) -> np.ndarray:
        if payload is None:
            raise ValueError("cannot decode null payload")
        img = Image.open(io.BytesIO(payload)).convert("RGB").resize(target)
        return np.asarray(img, dtype=np.uint8)

    return decode


def gen_media(spark, n: int, seed: int = 42, partitions: int | None = None) -> DataFrame:
    """Deterministic fake media table (payload = seeded bytes)."""

    def make(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            ids = b["id"].to_numpy()
            rows = []
            for i in ids:
                h = hashlib.sha256(f"{seed}:{i}".encode()).digest()
                rows.append(
                    {
                        "media_id": int(i),
                        "payload": h * (8 + int(i) % 5),
                        "meta": {
                            "media_type": ["image", "audio", "video"][int(i) % 3],
                            "format": ["png", "wav", "mp4"][int(i) % 3],
                            "width": 64 + int(i) % 64 if int(i) % 3 == 0 else None,
                            "height": 64 + int(i) % 32 if int(i) % 3 == 0 else None,
                            "sample_rate": 16000 if int(i) % 3 == 1 else None,
                            "duration_ms": 1000 * (1 + int(i) % 30)
                            if int(i) % 3 != 0
                            else None,
                        },
                    }
                )
            yield pd.DataFrame(rows)

    rng = spark.range(0, n, 1, partitions or spark.sparkContext.defaultParallelism)
    return rng.mapInPandas(make, schema=MEDIA_SCHEMA)


def repartition_for_media(df: DataFrame, payload_col: str = "payload", target_mb: int = 64) -> DataFrame:
    """Repartition by cumulative payload *size* instead of row count.

    Estimates total bytes from ONE aggregate over a 1% sample
    (count + byte sum in the same job — no separate full count pass);
    falls back to one full-data aggregate only if the sample came back
    empty. At real scale this sits before any decode stage so Arrow
    batches stay ~target_mb."""
    s = (
        df.sample(0.01, seed=7)
        .agg(F.count("*").alias("n"), F.sum(F.length(payload_col)).alias("bytes"))
        .collect()[0]
    )
    if s["n"]:
        est_total = (s["bytes"] or 0) / 0.01
    else:  # table too small for the sample — one exact pass is cheap
        f = df.agg(F.sum(F.length(payload_col)).alias("bytes")).collect()[0]
        est_total = f["bytes"] or 0
    parts = max(1, int(est_total / (target_mb * 1024 * 1024)))
    return df.repartition(parts)


def image_features(
    media: DataFrame,
    target: tuple[int, int] = (32, 32),
    emb_dim: int = 16,
    decoder=None,
) -> DataFrame:
    """Decode -> resize -> luma + tiny embedding, one Arrow batch at a
    time. The embedding is the channel-mean grid flattened and l2-normed
    (stub for a real vision encoder; identical plumbing).

    ``decoder``: ``(payload: bytes, (w, h)) -> HxWx3 uint8 ndarray``.
    Default is the deterministic stub; pass ``pil_image_decoder()`` for
    real PNG/JPEG decoding when Pillow is available. A decoder failure
    (ValueError) yields a null-feature row, never a dead task."""
    tw, th = target
    decode = decoder or _decode_image_stub

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            out = []
            for _, row in b.iterrows():
                if row["meta"] is None or row["meta"]["media_type"] != "image":
                    continue
                payload = row["payload"]
                try:
                    img = decode(
                        None if payload is None else bytes(payload), (tw, th)
                    )
                except Exception:
                    # ANY decoder failure → null-feature row. Real codecs
                    # raise their own classes on corrupt payloads (e.g.
                    # PIL.UnidentifiedImageError, an OSError) — at scale
                    # one bad byte-string must not kill the task.
                    out.append(
                        {
                            "media_id": row["media_id"],
                            "sha256": None,
                            "n_bytes": None,
                            "out_width": None,
                            "out_height": None,
                            "mean_luma": None,
                            "embedding": None,
                        }
                    )
                    continue
                luma = img @ np.array([0.2126, 0.7152, 0.0722])
                pooled = luma.reshape(4, th // 4, 4, tw // 4).mean(axis=(1, 3)).ravel()
                emb = pooled[:emb_dim].astype(np.float64)
                emb = emb / (np.linalg.norm(emb) + 1e-12)
                out.append(
                    {
                        "media_id": row["media_id"],
                        "sha256": hashlib.sha256(bytes(payload)).hexdigest(),
                        "n_bytes": len(bytes(payload)),
                        "out_width": tw,
                        "out_height": th,
                        "mean_luma": float(luma.mean()),
                        "embedding": emb.astype(np.float32).tolist(),
                    }
                )
            yield pd.DataFrame(
                out,
                columns=[f.name for f in IMAGE_FEATURES_SCHEMA.fields],
            )

    return media.mapInPandas(run, schema=IMAGE_FEATURES_SCHEMA)


def _extract_frame_stub(payload: bytes, frame_ms: int, frame_idx: int) -> bytes:
    """STUB frame extraction: deterministic bytes per (payload, index).
    Production: an ffmpeg/libav seek-and-decode callable with the same
    signature, injected via ``sample_frames(frame_extractor=...)``."""
    return payload + frame_idx.to_bytes(4, "big")


def sample_frames(
    media: DataFrame, every_ms: int = 5000, frame_extractor=None
) -> DataFrame:
    """Frame sampling for video rows: emit one row per sampled frame
    (UDTF-shaped: 1 -> N). Timing/layout logic is real; frame content
    comes from ``frame_extractor(payload, frame_ms, frame_idx) ->
    bytes`` (default: deterministic stub; inject an ffmpeg-backed
    callable in production — same Arrow-batch stage)."""
    extract = frame_extractor or _extract_frame_stub

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            out = []
            for _, row in b.iterrows():
                meta = row["meta"]
                if meta is None or meta["media_type"] != "video" or meta["duration_ms"] is None:
                    continue
                for idx, ms in enumerate(range(0, int(meta["duration_ms"]), every_ms)):
                    out.append(
                        {
                            "media_id": row["media_id"],
                            "frame_idx": idx,
                            "frame_ms": ms,
                            "frame_sha256": hashlib.sha256(
                                extract(bytes(row["payload"]), ms, idx)
                            ).hexdigest(),
                        }
                    )
            yield pd.DataFrame(
                out, columns=[f.name for f in FRAME_SAMPLE_SCHEMA.fields]
            )

    return media.mapInPandas(run, schema=FRAME_SAMPLE_SCHEMA)
