"""Content hashing: sha256 verification (the per-row invariant vs the
reference data, BASELINE.json input_hint) and rolling-hash document
fingerprints.  All vectorized pandas UDFs — Arrow batches, no per-row Python
in the Spark plan."""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import LongType, StringType

FP_BASE = np.uint64(1099511628211)  # FNV prime as the rolling base


@pandas_udf(StringType())
def sha256_udf(content: pd.Series) -> pd.Series:
    return content.map(lambda s: hashlib.sha256(s.encode("utf-8")).hexdigest())


def verify_content_sha256(
    repos: DataFrame, expected_col: str = "content_sha256"
) -> DataFrame:
    """Rows whose recomputed sha256 disagrees with the stored column — must be
    empty (the per-row invariant).  Also usable as a data-integrity scan."""
    return repos.withColumn("computed_sha256", sha256_udf(F.col("content"))).where(
        F.col("computed_sha256") != F.col(expected_col)
    )


def polynomial_fingerprint(s: str) -> int:
    """Deterministic polynomial rolling hash over UTF-8 bytes, mod 2^64
    (natural uint64 wraparound) masked to 63 bits — a document fingerprint for
    cheap near-identity bucketing.  Fully NumPy-vectorized: byte array times a
    multiply-accumulated power ladder, no per-byte Python."""
    b = np.frombuffer(s.encode("utf-8"), dtype=np.uint8).astype(np.uint64)
    if b.size == 0:
        return 0
    with np.errstate(over="ignore"):
        pows = np.multiply.accumulate(np.full(b.size, FP_BASE, dtype=np.uint64))
        h = np.uint64(np.sum(b * pows[::-1], dtype=np.uint64))
    return int(h & np.uint64(0x7FFFFFFFFFFFFFFF))


@pandas_udf(LongType())
def rolling_fingerprint(text: pd.Series) -> pd.Series:
    return text.map(polynomial_fingerprint)
