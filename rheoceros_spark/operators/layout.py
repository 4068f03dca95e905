"""Data-layout operators: Z-order (Morton) clustering for
multi-dimensional scan locality.

A 100 TB table is pruned by file-level min/max statistics; sorting by
one column gives locality on that column only.  Interleaving the bits
of several key columns into one Morton key and range-partitioning +
sorting by it clusters rows that are close in EVERY key dimension
into the same files, so predicates on any subset of the dimensions
prune to a small file set (the technique behind Delta/Iceberg
``ZORDER BY``; public literature: Morton 1966).

Everything here is pure JVM column arithmetic (``shiftright`` /
``shiftleft`` / bitwise and) — whole-stage-codegen'd, no UDFs — plus
one ``repartitionByRange`` (a range shuffle with a driver-side sample
pass, the same cost as any global sort).
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["zorder_key", "zorder_write"]


def zorder_key(cols: Sequence, bits: int = 16) -> Column:
    """Morton key: interleave the low ``bits`` bits of each column.

    Column i contributes its bit b to output bit ``b*n_cols + i`` —
    for two columns x,y: ``y1 x1 y0 x0``.  Inputs must already be
    non-negative integers of < 2**bits (bucket/quantize first; values
    at or above 2**bits would alias — only the low bits participate).
    Output fits a bigint for ``bits * n_cols <= 63``.
    """
    n = len(cols)
    if n * bits > 63:
        raise ValueError(f"{n} cols x {bits} bits exceeds a bigint")
    cs = [F.col(c) if isinstance(c, str) else c for c in cols]
    key = F.lit(0).cast("bigint")
    for b in range(bits):
        for i, c in enumerate(cs):
            bit = F.shiftright(c.cast("bigint"), b).bitwiseAND(F.lit(1))
            key = key + F.shiftleft(bit, b * n + i)
    return key


def zorder_key_sql(cols: Sequence[str], bits: int = 16) -> str:
    """The identical Morton key as portable ANSI SQL (DuckDB-ready) —
    the oracle twin of :func:`zorder_key`."""
    n = len(cols)
    terms = [
        f"(((CAST({c} AS BIGINT) >> {b}) & 1) << {b * n + i})"
        for b in range(bits)
        for i, c in enumerate(cols)
    ]
    return " + ".join(terms)


def zorder_write(
    df: DataFrame,
    path: str,
    cols: Sequence[str],
    bits: int = 16,
    n_files: Optional[int] = None,
    data_format: str = "parquet",
) -> None:
    """Write ``df`` Z-ordered on ``cols``: range-partition by the
    Morton key (each output file owns a contiguous key range → tight
    per-file min/max on every participating dimension), sort within
    partitions, drop the key, write.

    ``n_files`` defaults to Spark's range-partition heuristic; set it
    to ``ceil(bytes / target_file_size)`` in production.
    """
    keyed = df.withColumn("__zkey", zorder_key(list(cols), bits))
    parts = (
        keyed.repartitionByRange(n_files, "__zkey")
        if n_files
        else keyed.repartitionByRange("__zkey")
    )
    (
        parts.sortWithinPartitions("__zkey")
        .drop("__zkey")
        .write.format(data_format)
        .mode("overwrite")
        .save(path)
    )
