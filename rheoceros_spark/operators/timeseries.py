"""Row-grain time-series operators: as-of join, range (interval)
join, and gap-based sessionization.

The reference resolves temporal alignment at *partition* granularity
(`nearest_the_tip_in_range`, ``signal.py:523-560`` — pick the newest
existing partition); these operators are the row-granular
counterparts a training-data pipeline needs (align events to the
latest preceding state, window events to intervals, group activity
into sessions).  All three are single-shuffle compositions of
built-in DataFrame ops — no UDFs, no driver loops.

Scale design (100 TB):

* ``asof_join`` is the union+window formulation: tag both sides, one
  shuffle on the ``by`` key, one sort on (ts, side), carry the build
  side forward with ``last(ignorenulls)``.  A naive formulation is a
  non-equi join (BroadcastNestedLoop at best, per-key row explosion
  at worst); this one is linear in rows and AQE-skew-splittable.
* ``range_join`` turns the pure interval predicate — which Spark can
  only plan as a nested-loop — into an equi-join on a time *bucket*
  key (right rows bucket once; left rows fan out only to the buckets
  its interval overlaps), with the exact predicate re-applied after.
  Candidate volume is O(rows x interval/bucket_width), not O(n x m).
* ``sessionize`` is one window pass: gap flags via ``lag``, session
  ids via running sum — the standard two-scan-free formulation.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["asof_join", "range_join", "sessionize"]


def _epoch_seconds(col: Column) -> Column:
    """Epoch seconds (fractional) for any timestamp-ish column.

    Spark 4 reads tz-naive parquet timestamps as TIMESTAMP_NTZ, and
    ``CAST(TIMESTAMP_NTZ AS DOUBLE)`` is an AnalysisException
    (DATATYPE_MISMATCH.CAST_WITHOUT_SUGGESTION).  NTZ -> LTZ is legal
    and, with the session timezone pinned to UTC (session.py), value
    preserving — so route every epoch conversion through an LTZ cast.
    DOUBLE/LONG inputs pass through unchanged (cast is a no-op chain).
    """
    return col.cast("timestamp").cast("double")


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str = "ts",
    by: Sequence[str] = ("user_id",),
    suffix: str = "_matched",
    tolerance_seconds: Optional[float] = None,
) -> DataFrame:
    """Left as-of join: for every left row, the newest right row with
    ``right.on <= left.on`` within the same ``by`` group (pandas
    ``merge_asof`` / DuckDB ``ASOF LEFT JOIN`` semantics).

    Every right column outside ``by`` + ``on`` is emitted with
    ``suffix`` appended; right's ``on`` itself arrives as
    ``{on}{suffix}``.  Rows with no preceding match keep NULLs.
    ``tolerance_seconds`` additionally NULLs matches older than the
    given horizon (pandas ``tolerance=``).

    Ties on ``on`` between a left and right row count as a match
    (<=); ties *among* right rows resolve to the last one in
    (``on``,) order — pre-aggregate the right side if that matters.
    """
    value_cols = [c for c in right.columns if c not in set(by) | {on}]
    clash = [f"{c}{suffix}" for c in value_cols + [on] if f"{c}{suffix}" in left.columns]
    if clash:
        raise ValueError(f"asof_join output columns already exist on left: {clash}")

    r = right.select(
        *by,
        F.col(on),
        F.col(on).alias(f"{on}{suffix}"),
        *[F.col(c).alias(f"{c}{suffix}") for c in value_cols],
    ).withColumn("__side", F.lit(0))
    l = left.withColumn("__side", F.lit(1))
    # right rows sort before left rows at equal ts => inclusive match
    combined = l.unionByName(r, allowMissingColumns=True)
    w = (
        Window.partitionBy(*by)
        .orderBy(F.col(on).asc(), F.col("__side").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    out_cols = [f"{on}{suffix}"] + [f"{c}{suffix}" for c in value_cols]
    for c in out_cols:
        combined = combined.withColumn(c, F.last(c, ignorenulls=True).over(w))
    result = combined.where(F.col("__side") == 1).drop("__side")
    if tolerance_seconds is not None:
        stale = (
            _epoch_seconds(F.col(on)) - _epoch_seconds(F.col(f"{on}{suffix}"))
        ) > F.lit(float(tolerance_seconds))
        # one projection for ALL matched columns: sequential withColumn
        # would null the matched timestamp first and then evaluate the
        # staleness predicate of the remaining columns against the
        # already-nulled value, leaking stale payloads through
        result = result.withColumns(
            {c: F.when(stale, F.lit(None)).otherwise(F.col(c)) for c in out_cols}
        )
    return result


def range_join(
    left: DataFrame,
    right: DataFrame,
    left_ts: str = "ts",
    right_ts: str = "ts",
    lower_seconds: float = 0.0,
    upper_seconds: float = 3600.0,
    by: Optional[Sequence[str]] = None,
    bucket_seconds: Optional[float] = None,
) -> DataFrame:
    """Interval join: pairs where ``left_ts + lower < right_ts <=
    left_ts + upper`` (and ``by`` keys equal, when given).

    Without an equi-key, Spark plans a raw interval predicate as a
    BroadcastNestedLoopJoin — O(n x m) comparisons.  Bucketing by
    ``bucket_seconds`` (default: the interval width) makes it a hash
    equi-join: each right row lands in one bucket, each left row
    probes only the ceil(width/bucket)+1 buckets its interval spans,
    and a candidate pair meets in exactly one bucket (the right
    row's), so no post-join dedup is needed.  The exact predicate is
    re-applied on the candidates.

    Column names must be disjoint (pre-select/rename the sides).
    """
    width = float(upper_seconds - lower_seconds)
    if width <= 0:
        raise ValueError("upper_seconds must exceed lower_seconds")
    bucket = float(bucket_seconds or width)
    overlap = (set(left.columns) & set(right.columns)) - set(by or ())
    if overlap:
        raise ValueError(f"range_join requires disjoint column names, both sides have: {sorted(overlap)}")

    r = right.withColumn(
        "__bkt", F.floor(_epoch_seconds(F.col(right_ts)) / F.lit(bucket))
    )
    lo = _epoch_seconds(F.col(left_ts)) + F.lit(float(lower_seconds))
    hi = _epoch_seconds(F.col(left_ts)) + F.lit(float(upper_seconds))
    l = left.withColumn(
        "__bkt",
        F.explode(F.sequence(F.floor(lo / F.lit(bucket)), F.floor(hi / F.lit(bucket)))),
    )
    keys = ["__bkt", *(by or ())]
    rts = _epoch_seconds(F.col(right_ts))
    return (
        l.join(r, on=keys)
        .where((rts > lo) & (rts <= hi))
        .drop("__bkt")
    )


def sessionize(
    df: DataFrame,
    ts_col: str = "ts",
    by: Sequence[str] = ("user_id",),
    gap_seconds: float = 1800.0,
    tiebreak: Optional[str] = None,
    out_col: str = "session_id",
) -> DataFrame:
    """Assign 1-based per-``by`` session ids: a new session starts at
    every row whose gap from the previous row exceeds ``gap_seconds``.

    One window pass (shuffle on ``by``, sort on ``ts``): gap flag via
    ``lag``, id via running sum — the batch twin of the streaming
    sessionizer (streaming/stream.py sessionize_stream), same
    semantics on a static frame.
    """
    order = [F.col(ts_col).asc()] + ([F.col(tiebreak).asc()] if tiebreak else [])
    w = Window.partitionBy(*by).orderBy(*order)
    prev = F.lag(F.col(ts_col)).over(w)
    # two projections, ONE window (same partitioning+ordering): Catalyst
    # plans a single sort+Window node, no extra shuffle
    flagged = df.withColumn(
        "__new_sess",
        F.when(
            prev.isNull()
            | ((_epoch_seconds(F.col(ts_col)) - _epoch_seconds(prev)) > F.lit(float(gap_seconds))),
            F.lit(1),
        ).otherwise(F.lit(0)),
    )
    running = w.rowsBetween(Window.unboundedPreceding, 0)
    return flagged.withColumn(out_col, F.sum("__new_sess").over(running)).drop("__new_sess")
