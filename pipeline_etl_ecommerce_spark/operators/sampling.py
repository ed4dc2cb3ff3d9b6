"""Deterministic sampling & splitting for training-data pipelines.

A 100 TB corpus pipeline needs reproducible, engine-independent answers to
"which split is this document in?" and "is this row in the p% sample?" —
`df.sample()` (seeded RNG, partition-dependent) cannot give either. These
operators decide per-row from a hash of the row's OWN identity, so:

- assignment is stable across runs, engines, partitionings, and cluster
  sizes (a doc never migrates from test to train after a re-shard);
- delta ingests are consistent: new docs join the same split scheme with
  no coordination or state;
- any engine with md5 + substring reproduces the decision bit-for-bit
  (same cross-engine determinism contract as the dedup family).

Mechanism: the first 8 hex chars of md5(identity) are a uniform draw from
[0, 16^8); comparing against ``fraction * 16^8`` AS A HEX STRING keeps the
whole decision in string-land — no 64-bit unsigned conversions that differ
between engines. All map-only expressions: zero shuffles, zero UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _hex_threshold(fraction: float) -> str:
    """8-hex-char threshold such that P[hash8 < threshold] == fraction.
    fraction >= 1.0 returns 'g', which compares greater than every hex
    string (hex digits are 0-9a-f), so everything passes."""
    f = max(float(fraction), 0.0)
    if f >= 1.0:
        return "g"
    return format(int(f * 16**8), "08x")


def _hash8(*cols: Column) -> Column:
    return F.substring(F.md5(F.concat_ws("|", *cols).cast("binary")), 1, 8)


def deterministic_split(
    df: DataFrame,
    id_col: str,
    *,
    train: float = 0.8,
    val: float = 0.1,
    split_col: str = "split",
) -> DataFrame:
    """Assign every row to 'train' / 'val' / 'test' by identity hash.
    Proportions are (train, val, 1 - train - val); assignment depends only
    on the row id, never on data layout or run order."""
    h = _hash8(F.col(id_col).cast("string"))
    split = (
        F.when(h < _hex_threshold(train), "train")
        .when(h < _hex_threshold(train + val), "val")
        .otherwise("test")
    )
    return df.withColumn(split_col, split)


def stratified_sample(
    df: DataFrame, strata_col: str, id_col: str, *, fraction: float
) -> DataFrame:
    """Keep ~``fraction`` of the rows of EVERY stratum. The hash mixes the
    stratum into the identity, so per-stratum draws are independent — a
    stratum is never over/under-sampled because its ids cluster in hash
    space shared with another stratum."""
    h = _hash8(F.col(strata_col).cast("string"), F.col(id_col).cast("string"))
    return df.filter(h < _hex_threshold(fraction))


def downsample_by_weight(
    df: DataFrame, strata_col: str, id_col: str, weights: dict[str, float], *, default: float = 1.0
) -> DataFrame:
    """Per-stratum keep-rates (e.g. downweight a dominant language):
    ``weights`` maps stratum value -> fraction kept; unlisted strata keep
    ``default``. Same identity-hash determinism as ``stratified_sample``."""
    h = _hash8(F.col(strata_col).cast("string"), F.col(id_col).cast("string"))
    thr: Column = F.lit(_hex_threshold(default))
    for value, frac in weights.items():
        thr = F.when(F.col(strata_col) == value, F.lit(_hex_threshold(frac))).otherwise(thr)
    return df.filter(h < thr)
