"""rheoceros_spark — a PySpark-native dataflow/analytics engine.

A from-scratch re-expression of the query and data-processing
capabilities of amzn/rheoceros (reference: /root/reference, package
``intelliflow``) on idiomatic PySpark:

* the reference's **dimensional dataflow algebra** (signals over
  partition-dimension domains, filter chaining, multi-input trigger
  joins with range / nearest / reference semantics) is implemented as
  pure-Python plan construction that compiles to partition-pruned
  DataFrame reads;
* the reference's **data plane** (partition scans, unions, managed
  partitioned writes, schema persistence, completion markers) is
  implemented directly on the Spark DataFrame API so Catalyst /
  Tungsten own the physical plan;
* **beyond-the-reference operators** for large-scale training-data
  pipelines (dedup, similarity search, text analysis, multimodal
  columns) live in :mod:`rheoceros_spark.operators`.

Design stance: DataFrame-first, no RDDs in the hot path, built-in
``pyspark.sql.functions`` over UDFs, broadcast hints for dimension
tables, AQE on by default.  See SURVEY.md in the repo root for the
full blueprint and reference citations.
"""

from rheoceros_spark.dimensions import (  # noqa: F401
    ANY,
    Dimension,
    DimensionFilter,
    DimensionSpec,
    DimensionType,
    AnyVariant,
    DateVariant,
    LongVariant,
    RelativeVariant,
    StringVariant,
)
from rheoceros_spark.signals import Signal, SignalDimensionLink, SignalLinkNode  # noqa: F401
from rheoceros_spark.sources.datasets import (  # noqa: F401
    AvroDataset,
    CsvDataset,
    DatasetType,
    GlueTable,
    JsonDataset,
    LibSVMDataset,
    OrcDataset,
    ParquetDataset,
)
from rheoceros_spark.compute import (  # noqa: F401
    ComputeInternalError,
    ComputeKilledError,
    ComputeRetryableInternalError,
    InlinedCompute,
    PrestoSQL,
    Spark,
    SparkSQL,
    python_module,
    scala_script,
    sql_module,
)
from rheoceros_spark.notifications import EMAIL, Slack  # noqa: F401
from rheoceros_spark.application import (  # noqa: F401
    Application,
    ComputeRecord,
    ComputeRecordState,
    RouteRetention,
)
from rheoceros_spark.diagnostics import (  # noqa: F401
    AlarmRule,
    AlarmState,
    MetricDef,
    MetricPeriod,
    MetricSelector,
    MetricStatistic,
    alarm_state,
    metric_math,
    metric_period_stats,
)
from rheoceros_spark.session import get_session  # noqa: F401

__version__ = "0.1.0"
