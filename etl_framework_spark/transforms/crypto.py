"""Column encryption / masking — vectorized, never per-row Python.

The reference encrypts with Fernet via a per-value ``Series.apply``
(reference:src/etl_framework/security/encryption.py:50-68) — per-row
Python. Two Spark-native paths here:

- **builtin (default)**: ``F.aes_encrypt``/``aes_decrypt`` — JVM-side,
  whole-stage codegen, zero Python. GCM mode is randomized; for the
  deterministic roundtrip tests we use ECB-mode only in tests.
- **fernet**: Arrow-vectorized ``pandas_udf`` wrapping ``cryptography``'s
  Fernet over whole ``pd.Series`` batches (the BASELINE "vectorized Arrow
  UDFs, no per-row Python" requirement; Fernet itself is per-value but
  executes inside one Arrow batch per ~10k rows, not one Python call per
  row over py4j).
"""

from __future__ import annotations

import re
from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: Name patterns the reference treats as sensitive
#: (reference:src/etl_framework/security/encryption.py:112-155).
SENSITIVE_PATTERNS = [
    r"ssn",
    r"social",
    r"credit",
    r"card",
    r"email",
    r"phone",
    r"passport",
    r"salary",
    r"dob",
    r"birth",
]


def detect_sensitive_columns(df: DataFrame) -> list[str]:
    pat = re.compile("|".join(SENSITIVE_PATTERNS), re.I)
    return [c for c in df.columns if pat.search(c)]


def _pad_key(key: str) -> bytes:
    k = key.encode()[:32]
    return k.ljust(16 if len(k) <= 16 else (24 if len(k) <= 24 else 32), b"0")


def encrypt_columns(
    df: DataFrame,
    columns: Sequence[str],
    key: str,
    method: str = "aes",
    mode: str = "GCM",
) -> DataFrame:
    """Encrypt string columns null-safely (null in -> null out,
    reference:encryption.py:64-66)."""
    if method == "aes":
        k = F.lit(_pad_key(key))
        for c in columns:
            df = df.withColumn(
                c,
                F.when(
                    F.col(c).isNotNull(),
                    F.base64(
                        F.aes_encrypt(
                            F.col(c).cast("string").cast("binary"), k, F.lit(mode)
                        )
                    ),
                ),
            )
        return df
    if method == "fernet":
        fernet_udf = _fernet_udf(key, decrypt=False)
        for c in columns:
            df = df.withColumn(c, fernet_udf(F.col(c).cast("string")))
        return df
    raise ValueError(f"unknown encryption method: {method}")


def decrypt_columns(
    df: DataFrame,
    columns: Sequence[str],
    key: str,
    method: str = "aes",
    mode: str = "GCM",
) -> DataFrame:
    if method == "aes":
        k = F.lit(_pad_key(key))
        for c in columns:
            df = df.withColumn(
                c,
                F.when(
                    F.col(c).isNotNull(),
                    F.aes_decrypt(F.unbase64(F.col(c)), k, F.lit(mode)).cast("string"),
                ),
            )
        return df
    if method == "fernet":
        fernet_udf = _fernet_udf(key, decrypt=True)
        for c in columns:
            df = df.withColumn(c, fernet_udf(F.col(c)))
        return df
    raise ValueError(f"unknown encryption method: {method}")


def _fernet_udf(key: str, decrypt: bool):
    """Arrow-batched Fernet. Import-gated: raises a clear error if the
    ``cryptography`` wheel is absent on executors."""
    import base64 as _b64
    import hashlib

    import pandas as pd  # noqa: F401

    fkey = _b64.urlsafe_b64encode(hashlib.sha256(key.encode()).digest())

    @F.pandas_udf(T.StringType())
    def _apply(s):
        from cryptography.fernet import Fernet

        f = Fernet(fkey)
        if decrypt:
            return s.map(
                lambda v: None if v is None else f.decrypt(v.encode()).decode()
            )
        return s.map(lambda v: None if v is None else f.encrypt(v.encode()).decode())

    return _apply


def mask_column(
    df: DataFrame, column: str, keep_last: int = 4, mask_char: str = "*"
) -> DataFrame:
    """Mask all but the last N chars (reference:demo/09_encryption_demo.py:272),
    as a single regexp_replace — no UDF."""
    return df.withColumn(
        column,
        F.when(
            F.col(column).isNotNull(),
            F.concat(
                F.regexp_replace(
                    F.expr(
                        f"substring({column}, 1, greatest(length({column}) - {keep_last}, 0))"
                    ),
                    r".",
                    mask_char,
                ),
                F.expr(f"substring({column}, -least(length({column}), {keep_last}), {keep_last})"),
            ),
        ),
    )


def sanitize_strings(df: DataFrame, columns: Sequence[str]) -> DataFrame:
    """Strip control chars + script tags
    (reference:src/etl_framework/security/input_validator.py:340-374)."""
    for c in columns:
        df = df.withColumn(
            c,
            F.regexp_replace(
                F.regexp_replace(F.col(c), r"(?i)<script.*?>.*?</script>", ""),
                r"[\x00-\x08\x0b\x0c\x0e-\x1f]",
                "",
            ),
        )
    return df
