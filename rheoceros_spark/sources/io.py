"""Partition-pruned loader and managed writer (the data plane).

Implements SURVEY §2.1's scan/sink inventory Spark-first:

* S1/S2 — one **multi-path read** per signal (``spark.read.format(f)
  .load(*paths)``), never N reads + union: the reference itself
  special-cases batch parquet reads this way
  (``glueetl_default_ABI.py:255-261,286-289``); on Spark a multi-path
  load gives scan coalescing, parallel file listing, and per-file
  partition pruning for free.
* S4 — missing-partition policy: skip-if-allowed, raise when
  ``range_check_required`` (``glueetl_default_ABI.py:225-241``).
* S5 — nearest/as-of: newest→oldest, first **existing** partition
  wins (``glueetl_default_ABI.py:283-284``).
* S6 — partition union is subsumed by the multi-path read (positional
  ``unionAll`` parity not needed — schema comes from the dataset).
* S12-S16 — managed write: ``overwrite`` + ``partitionBy`` + schema
  JSON + ``_SUCCESS`` marker + record count
  (``glueetl_default_ABI.py:383-413``).

Scale notes: existence checks are driver-side path probes (O(paths),
not O(rows)); reads stay declarative so Catalyst applies pushdown and
column pruning; at 1000 executors the multi-path read parallelizes by
file split with no engine involvement.
"""

from __future__ import annotations

import json
import os
import re
from typing import Optional

from pyspark.sql import DataFrame, SparkSession

from rheoceros_spark.dimensions import DimensionFilter
from rheoceros_spark.signals import Signal
from rheoceros_spark.sources.datasets import (
    DatasetDescriptor,
    GlueTable,
    IntegrityProtocol,
)

SCHEMA_FILE = "_SCHEMA.json"
METADATA_FILE = "_METADATA.json"

#: Parquet footers probed by :func:`normalize_ns_timestamps`, keyed by
#: sample path → frozenset of TIMESTAMP(NANOS) column names.  The probe
#: is a driver-side O(1) footer read, but uncached it repeats on every
#: ``load_table`` call in a query loop — memoize per path.
#: (probe_file, mtime_ns, size) → ns-timestamp column set; the file
#: identity in the key makes overwrites self-invalidating
_NS_SCHEMA_CACHE: dict[tuple, frozenset] = {}


def ensure_read_confs(spark: SparkSession) -> None:
    """Make the data plane self-sufficient on ANY SparkSession.

    The test parquet (and any pandas/arrow-written parquet) carries
    TIMESTAMP(NANOS) columns, which vanilla Spark refuses to read
    (``PARQUET_TYPE_ILLEGAL``).  ``spark.sql.legacy.parquet.nanosAsLong``
    is runtime-settable, so set it here — at read time — instead of
    relying on the engine's own session factory, so callers with a plain
    ``SparkSession.builder.getOrCreate()`` session work too.
    """
    if spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", "false") != "true":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")


def _is_schemed(path: str) -> bool:
    """True when the path names a filesystem scheme (``s3a://…``,
    ``hdfs://…``, single-slash ``file:/…``) and must go through the
    JVM Hadoop FileSystem.  The SAME test everywhere — a path that
    existence-checks via Hadoop must read/write via Hadoop too, or
    ``file:/x`` would probe /x but write a literal ``./file:`` dir."""
    return re.match(r"^[A-Za-z][A-Za-z0-9+.-]*:/", path) is not None


def _fs_exists(spark: SparkSession, path: str) -> bool:
    """Hadoop-FS existence probe — works for local/HDFS/S3A URIs.

    Any scheme-qualified path (``s3a://…``, ``hdfs://…``, and the
    single-slash ``file:/…`` Hadoop emits) routes through the JVM
    FileSystem; bare local paths short-circuit to ``os.path``.
    """
    # scheme must be followed by "/" ("s3a://…", "file:/…") so Windows
    # drive paths (C:\x) and colon-bearing relative paths stay on os.path
    if not _is_schemed(path):
        return os.path.exists(path)
    jvm = spark.sparkContext._jvm
    conf = spark.sparkContext._jsc.hadoopConfiguration()
    p = jvm.org.apache.hadoop.fs.Path(path)
    return p.getFileSystem(conf).exists(p)


def partition_ready(spark: SparkSession, descriptor: DatasetDescriptor, path: str) -> bool:
    """Existence + completion protocol (reference analysis.py:21-80).

    Catalog tables have no filesystem path — ``catalog://db/tbl/…``
    would crash the Hadoop FileSystem with an unknown-scheme error —
    so their existence probe is a predicate-pruned ``LIMIT 1`` scan
    against the table (metastore partition pruning makes this a
    partition-listing-sized query, not a data scan)."""
    if isinstance(descriptor, GlueTable):
        vals = descriptor.extract_dimensions(path)
        if vals is None:
            return False
        filt = DimensionFilter.load_raw(
            descriptor.spec, [vals[d.name] for d in descriptor.spec]
        )
        pred = filt.to_sql_predicate()
        probe = spark.table(descriptor.qualified_name)
        if pred != "TRUE":
            probe = probe.where(pred)
        return len(probe.limit(1).take(1)) > 0
    if not _fs_exists(spark, path):
        return False
    if descriptor.integrity == IntegrityProtocol.SUCCESS_FILE:
        return _fs_exists(spark, path.rstrip("/") + "/_SUCCESS")
    if descriptor.integrity == IntegrityProtocol.MANIFEST:
        return _fs_exists(spark, path.rstrip("/") + "/manifest")
    return True


def partition_exists(spark: SparkSession, descriptor: DatasetDescriptor, path: str) -> bool:
    """Read-time EXISTENCE probe — deliberately weaker than
    :func:`partition_ready`: the completion protocol (``_SUCCESS`` /
    manifest) is the *orchestration* layer's gate (reference
    analysis.py runs it before compute is ever submitted), while the
    generated job script only verifies the partition object exists
    before reading (``glueetl_default_ABI.py:225-241,269-277``
    ``check_object``).  Keeping the read-time check at existence lets a
    trigger proven complete by EVENT INGESTION (advanced_input_modes
    range-check scenarios — e.g. S3-list eventual consistency hides a
    fresh ``_SUCCESS``) load data the storage probe cannot yet attest."""
    if isinstance(descriptor, GlueTable):
        return partition_ready(spark, descriptor, path)
    return _fs_exists(spark, path)


_S3_BUCKET_RE = re.compile(r"^s3[an]?://([^/]+)/")


def apply_encryption_confs(spark: SparkSession, desc: DatasetDescriptor) -> None:
    """S7 — client-side-encryption scan: when a dataset declares an
    ``encryption_key``, set the filesystem CSE hadoop confs before the
    read (reference sets ``fs.s3.cse.*`` the same way per input,
    ``glueetl_default_ABI.py:185-194``).  Conf names are the public
    EMRFS/S3A client-side-encryption knobs; on local FS they are inert.

    The hadoop conf is session-global and DataFrame reads are LAZY —
    the FileSystem is instantiated at action time, after every input's
    confs were applied.  So for s3 paths the key is scoped with the
    per-bucket conf form (``fs.s3.bucket.<name>.cse.*``): inputs on
    different buckets cannot override each other, and an unencrypted
    input never needs to clear another input's key.  Datasets without
    a key therefore set nothing at all (clearing globals here was the
    bug: it raced the earlier encrypted input's deferred read).  Two
    datasets with DIFFERENT keys on the SAME bucket remain impossible
    to express — as in the reference — and the second set wins."""
    conf = spark.sparkContext._jsc.hadoopConfiguration()
    key = desc.options.get("encryption_key")
    if not key:
        return
    m = _S3_BUCKET_RE.match(desc.path_format or "")
    prefix = f"fs.s3.bucket.{m.group(1)}.cse." if m else "fs.s3.cse."
    conf.set(prefix + "enabled", "true")
    conf.set(prefix + "encryptionMaterialsProvider",
             "com.amazon.ws.emr.hadoop.fs.cse.KMSEncryptionMaterialsProvider")
    conf.set(prefix + "kms.keyId", str(key))


def load_signal(spark: SparkSession, signal: Signal) -> DataFrame:
    """Load a materialized signal as ONE DataFrame (S1-S8)."""
    desc: DatasetDescriptor = signal.source
    if desc is None:
        raise ValueError(f"signal {signal.alias!r} has no source descriptor")
    ensure_read_confs(spark)
    apply_encryption_confs(spark, desc)

    if isinstance(desc, GlueTable):
        df = spark.table(desc.qualified_name)
        if signal.nearest_in_range:
            # S5 for catalog tables: newest→oldest per branch, first
            # branch with data wins (same TIP-first order as paths)
            for branch in signal.filter.finalize().branches:
                bf = DimensionFilter(signal.filter.spec, [branch])
                pred = bf.to_sql_predicate()
                candidate = df.where(pred) if pred != "TRUE" else df
                if len(candidate.limit(1).take(1)) > 0:
                    return candidate
            raise FileNotFoundError(
                f"nearest: no partition of {signal.alias!r} has data in "
                f"{desc.qualified_name}"
            )
        if signal.range_check_required:
            # every branch of the declared range must have data
            for branch in signal.filter.finalize().branches:
                bf = DimensionFilter(signal.filter.spec, [branch])
                pred = bf.to_sql_predicate()
                probe = df.where(pred) if pred != "TRUE" else df
                if len(probe.limit(1).take(1)) == 0:
                    raise FileNotFoundError(
                        f"range_check: missing partition {pred!r} of "
                        f"{signal.alias!r} in {desc.qualified_name}"
                    )
        pred = signal.filter.to_sql_predicate()
        return df.where(pred) if pred != "TRUE" else df

    paths = desc.materialize_paths(signal.filter)

    if signal.nearest_in_range:
        # S5: iterate newest→oldest (paths are TIP-first), first
        # COMPLETE partition wins.  Unlike the range-check branch below
        # (existence only — orchestration already proved the exact
        # range it triggered on), nearest picks its own partition at
        # read time, so it must apply the completion protocol itself:
        # an existence-only probe would let a mid-write tip partition
        # shadow the older complete one the trigger's own nearest
        # check verified.
        for p in paths:
            if partition_ready(spark, desc, p):
                paths = [p]
                break
        else:
            raise FileNotFoundError(
                f"nearest: no partition of {signal.alias!r} exists in range {paths}"
            )
    elif len(desc.spec) > 0:
        existing = [p for p in paths if partition_exists(spark, desc, p)]
        missing = [p for p in paths if p not in set(existing)]
        if missing and signal.range_check_required:
            raise FileNotFoundError(
                f"range_check: missing partitions for {signal.alias!r}: {missing[:5]}"
            )
        # S4: skip silently-missing partitions when allowed
        paths = existing
        if not paths:
            raise FileNotFoundError(f"no partitions exist for {signal.alias!r} in {missing[:5]}")

    if desc.data_format == "avro":
        from rheoceros_spark.sources.datasets import AvroDataset

        if not AvroDataset.runtime_available(spark):
            raise RuntimeError(
                "AvroDataset needs the external spark-avro module on the "
                "classpath; launch with --packages org.apache.spark:spark-avro_2.13:<spark-version>"
            )
    reader = spark.read.format(desc.data_format)
    schema = desc.spark_schema()
    options = desc.spark_options()
    inferred_key = None
    if schema is not None:
        reader = reader.schema(schema)
    else:
        # Schema-inference memo (r14, guide §5 driver latency): a
        # RuleExecutor sweep over all benched queries showed
        # ResolveDataSource — footer-read schema inference, fired once
        # per spark.read — costing 14.4 s of the 26.9 s TOTAL rule time
        # (~85 ms/read locally; object-store listings cost far more).
        # The memo stores only the inferred StructType, keyed on every
        # concrete path's (mtime_ns, size) — the _NS_SCHEMA_CACHE
        # discipline — so any rewrite/append at the path changes the
        # key and re-infers.  File LISTING is untouched: the reader
        # below always re-resolves the paths, so new files are seen.
        inferred_key = _schema_memo_key(desc.data_format, paths, options)
        cached = (
            _INFERRED_SCHEMA_CACHE.get(inferred_key) if inferred_key else None
        )
        if cached is not None:
            reader = reader.schema(cached)
    for k, v in options.items():
        reader = reader.option(k, v)
    # S2/S6: single multi-path read — scan coalescing + one scan node
    df = reader.load(paths if len(paths) > 1 else paths[0])
    if inferred_key is not None:
        _INFERRED_SCHEMA_CACHE[inferred_key] = df.schema
    if desc.data_format == "parquet" and schema is None:
        df = normalize_ns_timestamps(df, paths[0])
    return df


#: (format, options, ((path, mtime_ns, size), ...)) -> StructType
_INFERRED_SCHEMA_CACHE: dict = {}


def _schema_memo_key(data_format: str, paths, options: dict):
    """Stat-keyed memo key for inferred schemas, or None when any path
    is remote/unstattable (no safe invalidation there)."""
    parts = []
    for p in paths:
        lp = p
        m = re.match(r"^file:(?://)?(/.*)$", lp)
        if m:
            lp = m.group(1)
        elif _is_schemed(lp):
            return None
        try:
            st = os.stat(lp)
            part = [(lp, st.st_mtime_ns, st.st_size)]
            if os.path.isdir(lp):
                # dir mtime covers entry add/remove; also pin the first
                # data file so an in-place rewrite re-keys too
                files = sorted(
                    f for f in os.listdir(lp) if not f.startswith(("_", "."))
                )
                if files:
                    fp = os.path.join(lp, files[0])
                    fst = os.stat(fp)
                    part.append((fp, fst.st_mtime_ns, fst.st_size))
        except OSError:
            return None
        parts.extend(part)
    return (data_format, tuple(sorted(options.items())), tuple(parts))


def normalize_ns_timestamps(df: DataFrame, sample_path: str) -> DataFrame:
    """Parquet TIMESTAMP(NANOS) columns arrive as LongType under
    ``spark.sql.legacy.parquet.nanosAsLong``; cast them back to real
    timestamps (lossless for µs-precision data).  One footer read on
    the driver — O(1) regardless of data size."""
    from pyspark.sql import functions as F

    probe_path = sample_path
    m = re.match(r"^file:(?://)?(/.*)$", probe_path)
    if m:
        probe_path = m.group(1)
    elif _is_schemed(probe_path):
        import warnings

        warnings.warn(
            f"normalize_ns_timestamps: cannot probe remote parquet footer "
            f"{probe_path!r} driver-side; TIMESTAMP(NANOS) columns (if any) "
            "stay as bigint epoch-nanos — declare an explicit schema or "
            "normalize upstream",
            RuntimeWarning,
            stacklevel=2,
        )
        return df
    try:
        if os.path.isdir(probe_path):
            files = [f for f in os.listdir(probe_path) if f.endswith(".parquet")]
            if not files:
                return df
            probe_path = os.path.join(probe_path, files[0])
        st = os.stat(probe_path)
        # keyed on (file, mtime, size): an in-process REPLACE overwrite
        # at the same path (node re-execution with a changed schema)
        # produces a new file identity, so the stale entry never matches
        cache_key = (probe_path, st.st_mtime_ns, st.st_size)
    except OSError:
        return df
    ns_cols = _NS_SCHEMA_CACHE.get(cache_key)
    if ns_cols is None:
        try:
            import pyarrow.parquet as pq

            arrow_schema = pq.read_schema(probe_path)
        except Exception:
            return df
        ns_cols = frozenset(
            name
            for name, typ in zip(arrow_schema.names, arrow_schema.types)
            if str(typ) == "timestamp[ns]"
        )
        _NS_SCHEMA_CACHE[cache_key] = ns_cols
    for c in ns_cols:
        if c in df.columns and dict(df.dtypes).get(c) == "bigint":
            # integer `div`, NOT `/`: epoch-nanos (~1.7e18) exceed a
            # double's 53-bit mantissa, so float division rounds some
            # values off by 1µs; `div` truncates exactly like every
            # ns→µs parquet reader (duckdb/pyarrow)
            df = df.withColumn(c, F.timestamp_micros(F.expr(f"`{c}` div 1000")))
    return df


def load_table(spark: SparkSession, dir_path: str, name: str) -> DataFrame:
    """Convenience: load ``<dir>/<name>.parquet`` through the engine's
    data plane (pruned read + ns-timestamp normalization)."""
    from rheoceros_spark.sources.datasets import ParquetDataset

    desc = ParquetDataset(f"{dir_path.rstrip('/')}/{name}.parquet")
    sig = Signal(name, desc, desc.spec)
    return load_signal(spark, sig)


def write_dataset(
    df: DataFrame,
    path: str,
    data_format: str = "parquet",
    partition_by: Optional[list[str]] = None,
    mode: str = "overwrite",
    options: Optional[dict[str, str]] = None,
    persist_schema: bool = True,
    record_count: bool = True,
) -> dict:
    """Managed sink S12-S16.

    ``mode='overwrite'`` matches the reference's managed write
    (``glueetl_default_ABI.py:383-395``); for APPEND datasets pass
    ``mode='append'``.  ``_SUCCESS`` is emitted by Spark's output
    committer natively (S15).  Returns the persisted metadata dict.
    """
    obs = None
    if record_count:
        # S16: record-count metadata, observed DURING the write — a
        # post-hoc df.count() would re-execute the whole upstream plan
        # (nothing caches it) and could even disagree with the written
        # rows for non-deterministic transforms
        from pyspark.sql import Observation
        from pyspark.sql import functions as F

        obs = Observation()
        df = df.observe(obs, F.count(F.lit(1)).alias("n"))
    writer = df.write.format(data_format).mode(mode)
    for k, v in (options or {}).items():
        writer = writer.option(k, v)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.save(path)

    meta: dict = {"path": path, "format": data_format}
    if persist_schema:
        # S13: schema JSON persisted beside data (glueetl_default_ABI.py:397-409)
        _write_sidecar(df.sparkSession, path, SCHEMA_FILE, df.schema.json())
    if obs is not None:
        meta["record_count"] = obs.get["n"]
        _write_sidecar(df.sparkSession, path, METADATA_FILE, json.dumps(meta))
    return meta


def load_content(spark: SparkSession, path: str, deserialize: bool = True):
    """S8 — raw-content load: fetch an opaque artifact (model file,
    pickled object) from storage as bytes, optionally unpickling
    (reference deserializes pickled "content" from internal storage,
    ``glueetl_default_ABI.py:165-179``).  One driver-side FS read —
    artifacts are small by contract; datasets go through
    ``load_signal``.

    Unpickling only engages when the bytes carry the pickle
    protocol-2+ magic (``b'\\x80'`` — what :func:`save_content`
    emits), so raw artifacts are returned verbatim and a genuinely
    corrupt pickle RAISES instead of silently degrading to garbage
    bytes.  Trust requirement: ``pickle.loads`` executes code — only
    load artifacts from stores the pipeline itself writes."""
    if not _is_schemed(path):
        with open(path, "rb") as f:
            raw = f.read()
    else:
        jvm = spark.sparkContext._jvm
        conf = spark.sparkContext._jsc.hadoopConfiguration()
        p = jvm.org.apache.hadoop.fs.Path(path)
        fs = p.getFileSystem(conf)
        stream = fs.open(p)
        try:
            raw = bytes(jvm.org.apache.commons.io.IOUtils.toByteArray(stream))
        finally:
            stream.close()
    if deserialize and raw[:1] == b"\x80":
        import pickle

        return pickle.loads(raw)
    return raw


def save_content(spark: SparkSession, obj, path: str) -> None:
    """S8 companion: pickle + persist an artifact to storage."""
    import pickle

    raw = obj if isinstance(obj, (bytes, bytearray)) else pickle.dumps(obj)
    if not _is_schemed(path):
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        with open(path, "wb") as f:
            f.write(raw)
        return
    jvm = spark.sparkContext._jvm
    conf = spark.sparkContext._jsc.hadoopConfiguration()
    p = jvm.org.apache.hadoop.fs.Path(path)
    out = p.getFileSystem(conf).create(p, True)
    out.write(bytearray(raw))
    out.close()


def write_pandas(
    spark: SparkSession,
    pdf,
    path: str,
    data_format: str = "parquet",
    **kwargs,
) -> dict:
    """S14 — pandas sink: a driver-side pandas DataFrame written
    through the managed sink as a single file (reference emits
    csv/parquet from pandas outputs, ``glueetl_default_ABI.py:416-432``).
    ``coalesce(1)`` mirrors the single-file semantic — pandas outputs
    are driver-sized by definition, so one task is correct, not a
    bottleneck."""
    df = spark.createDataFrame(pdf).coalesce(1)
    return write_dataset(df, path, data_format=data_format, **kwargs)


def _write_sidecar(spark: SparkSession, dir_path: str, name: str, content: str) -> None:
    if not _is_schemed(dir_path):
        os.makedirs(dir_path, exist_ok=True)
        with open(os.path.join(dir_path, name), "w") as f:
            f.write(content)
        return
    jvm = spark.sparkContext._jvm
    conf = spark.sparkContext._jsc.hadoopConfiguration()
    p = jvm.org.apache.hadoop.fs.Path(dir_path.rstrip("/") + "/" + name)
    fs = p.getFileSystem(conf)
    out = fs.create(p, True)
    out.write(bytearray(content.encode("utf-8")))
    out.close()
