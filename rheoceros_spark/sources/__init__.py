from rheoceros_spark.sources.datasets import (  # noqa: F401
    AvroDataset,
    CsvDataset,
    DatasetDescriptor,
    DatasetType,
    GlueTable,
    JsonDataset,
    LibSVMDataset,
    OrcDataset,
    ParquetDataset,
)
from rheoceros_spark.sources.io import (  # noqa: F401
    load_content,
    load_signal,
    save_content,
    write_dataset,
    write_pandas,
)
from rheoceros_spark.sources.warc import (  # noqa: F401
    WarcRecord,
    encode_warc,
    load_warc,
    scan_warc_stream,
    warc_records,
)
