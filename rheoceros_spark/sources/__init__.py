from rheoceros_spark.sources.datasets import (  # noqa: F401
    CsvDataset,
    DatasetDescriptor,
    DatasetType,
    GlueTable,
    JsonDataset,
    ParquetDataset,
)
from rheoceros_spark.sources.io import (  # noqa: F401
    load_content,
    load_signal,
    save_content,
    write_dataset,
    write_pandas,
)
