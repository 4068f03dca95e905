"""Honest multimodal decode path: pure-Python PPM (P6) decode →
nearest-neighbor resize → re-encode, end-to-end through the Arrow
``mapInPandas`` plumbing — real pixels in, real pixels out, no codec
libs required.  Import guards for real codecs (PIL) are unchanged.
"""

import pytest
from pyspark.sql import types as T

from rheoceros_spark.operators.multimodal import (
    RawImage,
    decode_image,
    decode_ppm,
    encode_ppm,
    resize_images,
)


def _gradient(width: int, height: int) -> bytes:
    """Deterministic RGB gradient: pixel (x, y) = (x*16 % 256, y*16 % 256, 128)."""
    px = bytearray()
    for y in range(height):
        for x in range(width):
            px += bytes(((x * 16) % 256, (y * 16) % 256, 128))
    return bytes(px)


class TestPpmCodec:
    def test_round_trip(self):
        pixels = _gradient(8, 6)
        blob = encode_ppm(8, 6, pixels)
        img = decode_ppm(blob)
        assert (img.width, img.height, img.mode) == (8, 6, "RGB")
        assert img.pixels == pixels

    def test_header_comments_and_whitespace(self):
        pixels = _gradient(2, 2)
        blob = b"P6\n# a comment\n 2  # inline\n2\n255\n" + pixels
        img = decode_ppm(blob)
        assert (img.width, img.height) == (2, 2)
        assert img.pixels == pixels

    def test_truncated_raises(self):
        with pytest.raises(ValueError, match="truncated"):
            decode_ppm(b"P6\n4 4\n255\n" + b"\x00" * 10)

    def test_non_ppm_raises(self):
        with pytest.raises(ValueError, match="P6"):
            decode_ppm(b"\x89PNG....")

    def test_decode_image_falls_back_to_ppm(self):
        # container has no PIL → PPM fallback is the decode path
        blob = encode_ppm(3, 2, _gradient(3, 2))
        img = decode_image(blob)
        assert isinstance(img, RawImage)
        assert (img.width, img.height) == (3, 2)

    def test_decode_image_non_ppm_still_stubbed(self):
        with pytest.raises(NotImplementedError, match="PIL"):
            decode_image(b"\xff\xd8\xff\xe0 jpeg-ish")


class TestResizePixels:
    def test_end_to_end_resize_through_spark(self, spark):
        # three real 8x6 gradients → 4x3: decode the RESULT content and
        # assert actual pixel dims + nearest-neighbor values
        rows = [(i, encode_ppm(8, 6, _gradient(8, 6))) for i in range(3)]
        df = spark.createDataFrame(
            rows,
            T.StructType(
                [
                    T.StructField("doc_id", T.LongType(), False),
                    T.StructField("content", T.BinaryType(), False),
                ]
            ),
        )
        out = resize_images(df, width=4, height=3).orderBy("doc_id").collect()
        assert len(out) == 3
        for r in out:
            assert (r["meta"]["width"], r["meta"]["height"]) == (4, 3)
            img = decode_ppm(bytes(r["content"]))
            assert (img.width, img.height) == (4, 3)
            # nearest-neighbor: out pixel (x,y) = src pixel (2x, 2y)
            for y in range(3):
                for x in range(4):
                    got = img.pixels[(y * 4 + x) * 3 : (y * 4 + x) * 3 + 3]
                    assert got == bytes(((2 * x * 16) % 256, (2 * y * 16) % 256, 128))

    def test_non_ppm_blob_passthrough_stamps_target_dims(self, spark):
        df = spark.createDataFrame(
            [(1, b"\x00\x01\x02 not an image")],
            T.StructType(
                [
                    T.StructField("doc_id", T.LongType(), False),
                    T.StructField("content", T.BinaryType(), False),
                ]
            ),
        )
        [r] = resize_images(df, width=16, height=16).collect()
        assert bytes(r["content"]) == b"\x00\x01\x02 not an image"
        assert (r["meta"]["width"], r["meta"]["height"]) == (16, 16)
        assert r["meta"]["mime"] is None
