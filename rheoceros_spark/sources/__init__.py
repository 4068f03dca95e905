from rheoceros_spark.sources.datasets import (  # noqa: F401
    CsvDataset,
    DatasetDescriptor,
    DatasetType,
    GlueTable,
    JsonDataset,
    ParquetDataset,
)
from rheoceros_spark.sources.io import load_signal, write_dataset  # noqa: F401
