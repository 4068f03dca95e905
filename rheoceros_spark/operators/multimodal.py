"""Multimodal (image/audio/video) column plumbing.

Media are **opaque binary columns + a typed metadata struct**; all
Spark-side plumbing (schemas, Arrow-batched ``mapInPandas``, row
explosion for frame sampling, partition sizing) is real and tested.
The actual codec work is stubbed: the decode step raises
``NotImplementedError`` unless the optional codec libs (PIL /
soundfile / av) are importable — they are NOT in this container —
while :func:`extract_features` uses a deterministic sha256-based
feature so pipelines are end-to-end verifiable without codecs.

Scale notes: binary payloads ride Arrow record batches
(``mapInPandas``), so tune ``spark.sql.execution.arrow.
maxRecordsPerBatch`` down for large blobs (10 MB images → batches of
~100).  Keep blob columns OUT of shuffle keys; metadata-only
projections never deserialize payloads thanks to parquet column
pruning.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_META_TYPE = T.StructType(
    [
        T.StructField("media_type", T.StringType(), False),   # image | audio | video
        T.StructField("mime", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.LongType(), True),
        T.StructField("n_bytes", T.LongType(), False),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("n_bytes", T.LongType(), False),
        T.StructField("sha_prefix", T.StringType(), False),
        T.StructField("feat0", T.LongType(), False),
    ]
)


def attach_media(df: DataFrame, content_col: str, media_type: str = "image") -> DataFrame:
    """Wrap a binary column into (content, meta) — the canonical
    multimodal row shape."""
    return df.withColumn(
        "meta",
        F.struct(
            F.lit(media_type).alias("media_type"),
            F.lit(None).cast("string").alias("mime"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("bigint").alias("duration_ms"),
            F.length(F.col(content_col)).cast("bigint").alias("n_bytes"),
        ),
    )


def decode_image(blob: bytes):
    """Decode an image payload.  STUB: the codec library is not in
    this container; the Spark-side plumbing around this call is real."""
    try:
        from PIL import Image  # noqa: F401
    except ImportError as e:
        raise NotImplementedError(
            "image decode requires PIL; container ships no codec libs — "
            "plumbing (schema/batching/partitioning) is real, decode is stubbed"
        ) from e
    import io

    from PIL import Image

    return Image.open(io.BytesIO(blob))  # pragma: no cover


def extract_features(df: DataFrame, content_col: str = "content", id_col: str = "doc_id") -> DataFrame:
    """Arrow-batched feature extraction over binary payloads.

    The feature is a deterministic sha256-based surrogate (equals
    ``sha256(content)`` computable by any SQL oracle), but the
    execution path — ``mapInPandas`` over Arrow record batches,
    column-pruned input, typed output schema — is exactly what a real
    embedding/decode stage uses.
    """
    pruned = df.select(id_col, content_col)

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            blobs = pdf[content_col]
            digests = [hashlib.sha256(bytes(b)).hexdigest() for b in blobs]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "n_bytes": blobs.map(len).astype("int64"),
                    "sha_prefix": [d[:16] for d in digests],
                    "feat0": [int(d[:15], 16) for d in digests],
                }
            )

    return pruned.mapInPandas(batches, schema=FEATURE_SCHEMA)


def resize_images(
    df: DataFrame,
    width: int,
    height: int,
    content_col: str = "content",
    id_col: str = "doc_id",
) -> DataFrame:
    """Arrow-batched image resize plumbing.  The pixel work is stubbed
    (no PIL in container): without the codec lib each batch degrades to
    a deterministic passthrough that stamps the *target* dimensions
    into ``meta`` — schema, batching, and partition shape are the real
    resize pipeline's."""
    pruned = df.select(id_col, content_col)
    out_schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType(), False),
            T.StructField("content", T.BinaryType(), True),
            T.StructField("meta", MEDIA_META_TYPE, False),
        ]
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        try:
            from PIL import Image  # noqa: F401

            have_codec = True
        except ImportError:
            have_codec = False
        for pdf in it:
            blobs = pdf[content_col]
            if have_codec:  # pragma: no cover - no codec libs in container
                raise NotImplementedError("real resize path exercised only with PIL present")
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "content": blobs,
                    "meta": [
                        {
                            "media_type": "image",
                            "mime": None,
                            "width": width,
                            "height": height,
                            "duration_ms": None,
                            "n_bytes": len(b),
                        }
                        for b in blobs
                    ],
                }
            )

    return pruned.mapInPandas(batches, schema=out_schema)


def sample_frames(df: DataFrame, id_col: str = "doc_id", n_frames: int = 4) -> DataFrame:
    """Frame-sampling plumbing for video rows: explode each media row
    into ``n_frames`` (frame_idx, byte_offset) rows.  Offsets are a
    deterministic placeholder for the real demuxer (stubbed — no `av`
    in container); the explode/partition shape is the real one."""
    return df.select(
        id_col,
        F.col("meta.n_bytes").alias("n_bytes"),
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(n_frames - 1)),
                lambda i: F.floor(F.col("meta.n_bytes") * i / F.lit(n_frames)).cast("bigint"),
            )
        ).alias("frame_idx", "byte_offset"),
    )
