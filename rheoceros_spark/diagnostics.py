"""Metrics + alarming — the diagnostics signal algebra (SURVEY §2.9 S11).

Re-expresses the reference's CloudWatch-shaped metric/alarm model
(reference ``src/intelliflow/core/signal_processing/signal_source.py:
1242-1638`` and ``definitions/metric_alarm_defs.py``) as plain
DataFrame transforms:

* a **metric** is any DataFrame with a timestamp column and a value
  column (plus id dimensions) — e.g. an append-only metric-emission
  table;
* **statistics over period-aligned windows** (SampleCount / Average /
  Sum / Minimum / Maximum / pNN — reference
  ``metric_alarm_defs.py:55-133``) become
  ``groupBy(window(ts, period))`` aggregates;
* **metric math** (reference ``MetricExpression``,
  ``metric_alarm_defs.py:162-170``) becomes a SQL expression over the
  joined per-period frames;
* an **alarm** (comparison + threshold + M-of-N evaluation periods —
  reference ``metric_alarm_defs.py:271-285``) becomes a sliding
  ``Window.orderBy(period).rowsBetween(-N+1, 0)`` count of breaches;
* **AlarmRule AND/OR/INVERT trees and composite alarms** (reference
  ``metric_alarm_defs.py:331-409``; ``Signal.__and__/__or__/__invert__``
  overloads at ``signal.py:268-294``) become boolean column algebra
  over the full-outer-joined alarm-state frames.

Scale notes: every construct here is a windowed aggregate or a window
function partitioned by the metric identity — at 100 TB the shuffle
key is (metric dims, period), which is naturally well-distributed;
composite evaluation joins tiny per-period state frames.
"""

from __future__ import annotations

from dataclasses import dataclass
from enum import Enum
from functools import reduce
from typing import Optional, Sequence, Union

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


class MetricStatistic(str, Enum):
    """reference metric_alarm_defs.py:55-133"""

    SAMPLE_COUNT = "SampleCount"
    AVERAGE = "Average"
    SUM = "Sum"
    MINIMUM = "Minimum"
    MAXIMUM = "Maximum"


_STAT_FN = {
    MetricStatistic.SAMPLE_COUNT: lambda c: F.count(c),
    MetricStatistic.AVERAGE: lambda c: F.avg(c),
    MetricStatistic.SUM: lambda c: F.sum(c),
    MetricStatistic.MINIMUM: lambda c: F.min(c),
    MetricStatistic.MAXIMUM: lambda c: F.max(c),
}


def metric_period_stats(
    df: DataFrame,
    period: str = "1 hour",
    ts_col: str = "ts",
    value_col: str = "value",
    dims: Sequence[str] = (),
    stats: Sequence[Union[MetricStatistic, str]] = tuple(MetricStatistic),
    percentiles: Sequence[float] = (),
) -> DataFrame:
    """Period-aligned statistics: one row per (dims, period).

    ``percentiles`` adds exact interpolated percentiles (``pNN``
    columns; Spark ``percentile`` — use ``approx_percentile`` yourself
    at extreme cardinality if a sketch is acceptable)."""
    aggs: list[Column] = []
    for s in stats:
        s = MetricStatistic(s)
        aggs.append(_STAT_FN[s](F.col(value_col)).alias(s.value))
    for p in percentiles:
        aggs.append(
            F.percentile(F.col(value_col), F.lit(p)).alias(f"p{str(p).replace('.', '_')}")
        )
    return df.groupBy(
        *dims, F.window(ts_col, period).start.alias("period_start")
    ).agg(*aggs)


def metric_math(
    frames: dict[str, DataFrame],
    expression: str,
    on: Sequence[str] = ("period_start",),
    alias: str = "value",
) -> DataFrame:
    """Metric-math expression over aligned per-period frames (reference
    ``MetricExpression``): each frame's value column is addressable by
    its dict key; frames are full-outer joined on ``on``.

    Each input frame must carry the join columns and a ``value``
    column (rename before calling); e.g.
    ``metric_math({"m1": errs, "m2": total}, "m1 / m2 * 100")``.
    """
    renamed = [
        df.select(*on, F.col("value").alias(name)) for name, df in frames.items()
    ]
    joined = reduce(lambda a, b: a.join(b, list(on), "full_outer"), renamed)
    return joined.select(*on, F.expr(expression).alias(alias))


class AlarmState(str, Enum):
    OK = "OK"
    ALARM = "ALARM"
    INSUFFICIENT_DATA = "INSUFFICIENT_DATA"


_COMPARISON = {
    ">": lambda c, t: c > t,
    ">=": lambda c, t: c >= t,
    "<": lambda c, t: c < t,
    "<=": lambda c, t: c <= t,
}


def alarm_state(
    metric_df: DataFrame,
    metric_col: str,
    threshold: float,
    comparison: str = ">",
    evaluation_periods: int = 1,
    datapoints_to_alarm: Optional[int] = None,
    period_col: str = "period_start",
    dims: Sequence[str] = (),
    period_seconds: Optional[int] = None,
) -> DataFrame:
    """Alarm evaluation: breach per period, then M-of-N over the last
    ``evaluation_periods`` periods (reference
    ``number_of_evaluation_periods`` / ``number_of_datapoint_periods``,
    ``metric_alarm_defs.py:271-285``).

    Adds ``breach`` (0/1), ``breaches_in_window``, ``state``
    (OK / ALARM / INSUFFICIENT_DATA — the latter while fewer than N
    periods have been observed and the alarm has not yet fired).

    The default window slides over the last N *rows*, which equals the
    last N *periods* only when every period emits a row.  For sparse
    metrics (rows only when something happens) pass ``period_seconds``:
    the window then becomes an event-time ``rangeBetween`` over the
    period timestamps, so three breach rows days apart can no longer
    masquerade as 3-of-3 consecutive breaches (CloudWatch
    missing-data = not-breaching semantics)."""
    m = datapoints_to_alarm if datapoints_to_alarm is not None else evaluation_periods
    breach = F.when(
        _COMPARISON[comparison](F.col(metric_col), F.lit(threshold)), F.lit(1)
    ).otherwise(F.lit(0))
    out = metric_df.withColumn("breach", breach)
    if period_seconds is not None:
        from rheoceros_spark.operators.timeseries import _epoch_seconds

        epoch = _epoch_seconds(F.col(period_col)).cast("bigint")
        out = out.withColumn("__epoch", epoch)
        span = int(period_seconds) * (evaluation_periods - 1)
        w = Window.partitionBy(*dims).orderBy("__epoch").rangeBetween(-span, 0)
        wp = (
            Window.partitionBy(*dims)
            .orderBy("__epoch")
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        out = (
            out.withColumn("breaches_in_window", F.sum("breach").over(w))
            .withColumn(
                # periods of HISTORY the window spans (capped at N) —
                # absent periods count as observed-not-breaching
                "periods_in_window",
                F.least(
                    F.lit(evaluation_periods),
                    (
                        (F.col("__epoch") - F.first("__epoch").over(wp))
                        / F.lit(int(period_seconds))
                    ).cast("bigint")
                    + F.lit(1),
                ),
            )
            .drop("__epoch")
        )
    else:
        w = (
            Window.partitionBy(*dims)
            .orderBy(period_col)
            .rowsBetween(-(evaluation_periods - 1), 0)
        )
        out = out.withColumn("breaches_in_window", F.sum("breach").over(w)).withColumn(
            "periods_in_window", F.count("breach").over(w)
        )
    return out.withColumn(
        "state",
        F.when(F.col("breaches_in_window") >= m, F.lit(AlarmState.ALARM.value))
        .when(
            F.col("periods_in_window") < evaluation_periods,
            F.lit(AlarmState.INSUFFICIENT_DATA.value),
        )
        .otherwise(F.lit(AlarmState.OK.value)),
    )


class AlarmRule:
    """AND/OR/INVERT tree over named alarms (reference
    ``metric_alarm_defs.py:331-409``; operator overloads mirror the
    reference's ``Signal.__and__/__or__/__invert__``).

    Leaves name alarm-state frames; :meth:`evaluate` full-outer joins
    them per period and composes the boolean algebra (a missing period
    or non-ALARM state counts as not-in-alarm)."""

    def __init__(self, op: str, operands: Sequence["AlarmRule"] = (), leaf: Optional[str] = None):
        self.op = op  # 'LEAF' | 'AND' | 'OR' | 'NOT'
        self.operands = list(operands)
        self.leaf = leaf

    @classmethod
    def of(cls, name: str) -> "AlarmRule":
        return cls("LEAF", leaf=name)

    def __and__(self, other: "AlarmRule") -> "AlarmRule":
        return AlarmRule("AND", [self, other])

    def __or__(self, other: "AlarmRule") -> "AlarmRule":
        return AlarmRule("OR", [self, other])

    def __invert__(self) -> "AlarmRule":
        return AlarmRule("NOT", [self])

    def leaf_names(self) -> list[str]:
        if self.op == "LEAF":
            return [self.leaf]
        out: list[str] = []
        for o in self.operands:
            for n in o.leaf_names():
                if n not in out:
                    out.append(n)
        return out

    def _column(self) -> Column:
        if self.op == "LEAF":
            return F.coalesce(
                F.col(f"__alarm_{self.leaf}") == AlarmState.ALARM.value, F.lit(False)
            )
        if self.op == "AND":
            return reduce(lambda a, b: a & b, (o._column() for o in self.operands))
        if self.op == "OR":
            return reduce(lambda a, b: a | b, (o._column() for o in self.operands))
        if self.op == "NOT":
            return ~self.operands[0]._column()
        raise ValueError(self.op)

    def evaluate(
        self,
        frames: dict[str, DataFrame],
        on: Sequence[str] = ("period_start",),
        alias: str = "state",
    ) -> DataFrame:
        """Composite alarm state per period: full-outer join every leaf
        frame (must carry ``on`` + ``state``), evaluate the tree."""
        names = self.leaf_names()
        missing = [n for n in names if n not in frames]
        if missing:
            raise KeyError(f"alarm frames missing for {missing}")
        renamed = [
            frames[n].select(*on, F.col("state").alias(f"__alarm_{n}")) for n in names
        ]
        joined = reduce(lambda a, b: a.join(b, list(on), "full_outer"), renamed)
        return joined.select(
            *on,
            F.when(self._column(), F.lit(AlarmState.ALARM.value))
            .otherwise(F.lit(AlarmState.OK.value))
            .alias(alias),
        )


# ---------------------------------------------------------------------------
# application-facing metric/alarm declaration sugar (reference api surface:
# app.create_metric()["NAME"][MetricStatistic.SUM][MetricPeriod.MINUTES(5)])
# ---------------------------------------------------------------------------

class MetricPeriod:
    """Period helpers mirroring the reference's ``MetricPeriod``
    (``definitions/metric_alarm_defs.py``) — values are plain seconds."""

    @staticmethod
    def SECONDS(n: int) -> int:
        return int(n)

    @staticmethod
    def MINUTES(n: int) -> int:
        return int(n) * 60

    @staticmethod
    def HOURS(n: int) -> int:
        return int(n) * 3600


@dataclass(frozen=True)
class MetricSelector:
    """Fully-qualified metric series: (metric group, name, statistic,
    period).  Built by indexing: ``metric["ERRORS"][stat][period]``."""

    metric_id: str
    name: str
    stat: Optional[str] = None
    period_secs: Optional[int] = None

    def __getitem__(self, key) -> "MetricSelector":
        from dataclasses import replace

        if self.stat is None:
            return replace(self, stat=MetricStatistic(key).value)
        if self.period_secs is None:
            return replace(self, period_secs=int(key))
        raise TypeError(f"metric selector already complete: {self}")

    def require_complete(self) -> "MetricSelector":
        if self.stat is None or self.period_secs is None:
            raise ValueError(
                f"metric selector needs [statistic][period]: {self} "
                "(e.g. metric['ERRORS'][MetricStatistic.SUM][MetricPeriod.MINUTES(5)])"
            )
        return self


class MetricDef:
    """Handle returned by ``Application.create_metric`` — index by
    metric NAME to start a selector chain."""

    def __init__(self, metric_id: str):
        self.metric_id = metric_id

    def __getitem__(self, name: str) -> MetricSelector:
        return MetricSelector(self.metric_id, str(name))

    def __repr__(self) -> str:
        return f"MetricDef({self.metric_id!r})"


#: reference AlarmComparisonOperator names → operator strings
COMPARISON_ALIASES = {
    "GreaterThanThreshold": ">",
    "GreaterThanOrEqualToThreshold": ">=",
    "LessThanThreshold": "<",
    "LessThanOrEqualToThreshold": "<=",
}
