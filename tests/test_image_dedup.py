"""Perceptual image dedup (round 13): dHash through the real P6
decode path + banded guaranteed-detection near-dup pairs — hand-built
geometry, loud rejects, the pigeonhole recall bound, and decode
sensitivity (one pixel must flip the hash)."""

import pytest
from pyspark.sql import functions as F

from rheoceros_spark.operators.multimodal import (
    dhash_pairs,
    encode_ppm,
    image_dhash,
)


def _img(fn):
    """18x16 P6 image, pixel (x, y, c) = fn(x, y, c) % 256."""
    px = bytes(
        fn(x, y, c) % 256 for y in range(16) for x in range(18) for c in range(3)
    )
    return encode_ppm(18, 16, px)


def _hashes(spark, blobs):
    df = spark.createDataFrame(
        list(enumerate(blobs)), "doc_id bigint, content binary"
    )
    return {
        r.doc_id: (r.dhash_hi, r.dhash_lo) for r in image_dhash(df).collect()
    }


def test_hand_computed_gradient_hash(spark):
    """A strict left-to-right luma gradient sets EVERY adjacent-mean
    bit: hash halves are all-ones (2^32 - 1 each).  The flat image
    sets none."""
    h = _hashes(
        spark,
        [_img(lambda x, y, c: x * 14), _img(lambda x, y, c: 77)],
    )
    assert h[0] == (4294967295, 4294967295)
    assert h[1] == (0, 0)


def test_one_pixel_decode_sensitivity(spark):
    """The real-decode gate: when adjacent block means sit close (the
    shallow gradient below steps by 2 luma units), a single mis-read
    pixel shifts its block's floor mean by +32 and flips the
    neighboring comparisons — so any decode error surfaces in the
    hash.  (A STEEP gradient absorbs the same bump — that robustness
    is dHash's design, covered by the fixture's variant semantics.)"""
    base = lambda x, y, c: (x // 2) * 2
    bump = lambda x, y, c: base(x, y, c) + (128 if (x, y) == (8, 8) else 0)
    h = _hashes(spark, [_img(base), _img(bump)])
    assert h[0] != h[1]


def test_exact_dups_pair_at_hamming_zero(spark):
    f = lambda x, y, c: (x // 2) * 31 + (y // 2) * 7 + c
    df = spark.createDataFrame(
        [(0, _img(f)), (1, _img(f)), (2, _img(lambda x, y, c: x * 14))],
        "doc_id bigint, content binary",
    )
    pairs = dhash_pairs(image_dhash(df), max_hamming=2).collect()
    assert [(r.a, r.b, r.hamming) for r in pairs] == [(0, 1, 0)]


def test_pigeonhole_guarantee_and_recall_bound(spark):
    """Hamming ≤ 3 is ALWAYS found (3 flips can't touch all 4 16-bit
    bands); a pair engineered to differ once in EVERY band is
    invisible to the banded join — the documented recall bound, not a
    bug."""
    rows = [
        (0, 0, 0),
        # 3 bits flipped, all within the low band → found
        (1, 0, 7),
        # one bit in each 16-bit band → hamming 4, all bands differ
        (2, 1 | (1 << 16), 1 | (1 << 16)),
    ]
    hashes = spark.createDataFrame(
        rows, "doc_id bigint, dhash_hi bigint, dhash_lo bigint"
    )
    got = {
        (r.a, r.b): r.hamming
        for r in dhash_pairs(hashes, max_hamming=3).collect()
    }
    assert got[(0, 1)] == 3
    assert (0, 2) not in got and (1, 2) not in got


class TestIncrementalImageIndex:
    """The image member of the incremental-index family: build once,
    append batches, gate new images without re-decoding old bytes."""

    def _media(self, spark, specs):
        """specs: [(doc_id, fn)] → (doc_id, content) frame."""
        return spark.createDataFrame(
            [(i, _img(fn)) for i, fn in specs], "doc_id bigint, content binary"
        )

    def test_gate_flags_dups_and_passes_novel(self, spark, tmp_path):
        from rheoceros_spark.operators.multimodal import (
            dedup_images_against_index,
            dhash_index_write,
        )

        grad = lambda x, y, c: x * 14
        flat = lambda x, y, c: 77
        corpus = self._media(spark, [(0, grad), (1, flat)])
        idx = dhash_index_write(corpus, str(tmp_path / "idx"))
        batch = self._media(
            spark,
            [
                (10, grad),  # exact perceptual dup of 0
                # alternating stripes: ~half the bits set — far from
                # both the all-ones gradient and the all-zeros flat
                (11, lambda x, y, c: 255 * ((x // 2) % 2)),
            ],
        )
        out = {r.doc_id: r for r in dedup_images_against_index(batch, idx).collect()}
        assert out[10].dup_of == 0 and out[10].min_hamming == 0
        assert out[11].dup_of is None and out[11].min_hamming is None

    def test_append_equals_rebuild(self, spark, tmp_path):
        from rheoceros_spark.operators.multimodal import dhash_index_write

        a = self._media(spark, [(0, lambda x, y, c: x * 14)])
        b = self._media(spark, [(1, lambda x, y, c: 77)])
        p1, p2 = str(tmp_path / "grown"), str(tmp_path / "full")
        dhash_index_write(a, p1)
        grown = dhash_index_write(b, p1, mode="append")
        full = dhash_index_write(a.unionByName(b), p2)
        key = lambda df: sorted(
            (r.doc_id, r.dhash_hi, r.dhash_lo, r.dhash_algo) for r in df.collect()
        )
        assert key(grown) == key(full)

    def test_scheme_mismatch_rejects_loudly(self, spark):
        import pytest as _pytest

        from rheoceros_spark.operators.multimodal import (
            dedup_images_against_index,
        )

        bad = spark.createDataFrame(
            [(0, 1, 2, "dhash-v0:other-scheme")],
            "doc_id bigint, dhash_hi bigint, dhash_lo bigint, dhash_algo string",
        )
        batch = self._media(spark, [(1, lambda x, y, c: 77)])
        with _pytest.raises(ValueError, match="another"):
            dedup_images_against_index(batch, bad)
        with _pytest.raises(ValueError, match="missing"):
            dedup_images_against_index(batch, bad.drop("dhash_lo"))

    def test_stream_gate_matches_batch(self, spark, tmp_path):
        from rheoceros_spark.operators.multimodal import (
            dedup_images_against_index,
            dhash_index_write,
        )
        from rheoceros_spark.streaming import stream_image_dedup_gate

        corpus = self._media(spark, [(0, lambda x, y, c: x * 14)])
        idx = dhash_index_write(corpus, str(tmp_path / "idx")).localCheckpoint()
        batch = self._media(
            spark, [(10, lambda x, y, c: x * 14), (11, lambda x, y, c: 9)]
        )
        src = str(tmp_path / "src")
        batch.write.parquet(src)
        sdf = spark.readStream.schema("doc_id bigint, content binary").parquet(src)
        gated = stream_image_dedup_gate(sdf, idx)
        out = str(tmp_path / "out")
        q = (
            gated.writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", str(tmp_path / "ck"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        got = sorted(
            (r.doc_id, r.dup_of, r.min_hamming)
            for r in spark.read.parquet(out).collect()
        )
        want = sorted(
            (r.doc_id, r.dup_of, r.min_hamming)
            for r in dedup_images_against_index(batch, idx).collect()
        )
        assert got == want and len(got) == 2


class TestExactDupGroupingAndBucketCap:
    """The r14 scale fix: h identical hashes must produce h-1 star
    pairs through ONE hash-group window, never an h² banded self-join;
    hot band buckets of DISTINCT hashes star-pair through the bucket
    anchor (the _capped_candidates contract)."""

    def test_ten_thousand_exact_dups_emit_linear_pairs(self, spark):
        hashes = spark.range(10_000).select(
            F.col("id").alias("doc_id"),
            F.lit(0).cast("bigint").alias("dhash_hi"),
            F.lit(0).cast("bigint").alias("dhash_lo"),
        )
        rows = dhash_pairs(hashes, max_hamming=2).collect()
        # all-pairs would be C(10k, 2) ≈ 5e7; the grouped shape emits
        # exactly one (rep, member, 0) star pair per non-minimal member
        assert len(rows) == 9_999
        assert all(r.a == 0 and r.hamming == 0 for r in rows)
        assert sorted(r.b for r in rows) == list(range(1, 10_000))

    def test_exact_dup_groups_still_meet_near_neighbors(self, spark):
        # two exact-dup groups whose hashes differ by 1 bit: members
        # star to their rep, reps pair across groups
        rows = [(i, 0, 0) for i in range(3)] + [(10 + i, 0, 1) for i in range(3)]
        hashes = spark.createDataFrame(
            rows, "doc_id bigint, dhash_hi bigint, dhash_lo bigint"
        )
        got = sorted(
            (r.a, r.b, r.hamming) for r in dhash_pairs(hashes, max_hamming=2).collect()
        )
        assert got == [
            (0, 1, 0),
            (0, 2, 0),
            (0, 10, 1),
            (10, 11, 0),
            (10, 12, 0),
        ]

    def test_hot_band_bucket_stars_through_anchor(self, spark):
        # 12 DISTINCT hashes share three 16-bit band values (lo = 0,
        # hi < 2^16 with ≤ 2 bits set); cap 8 → every oversized bucket
        # pairs members with the anchor rep only
        his = [0, 1, 2, 4, 8, 3, 5, 6, 9, 10, 12, 17]
        hashes = spark.createDataFrame(
            [(i, h, 0) for i, h in enumerate(sorted(his))],
            "doc_id bigint, dhash_hi bigint, dhash_lo bigint",
        )
        capped = {
            (r.a, r.b): r.hamming
            for r in dhash_pairs(hashes, max_hamming=2, max_bucket=8).collect()
        }
        # anchor is the (hi=0) group's rep, doc 0: only (0, b) pairs
        assert capped and all(a == 0 for a, _ in capped)
        full = {
            (r.a, r.b): r.hamming
            for r in dhash_pairs(hashes, max_hamming=2, max_bucket=None).collect()
        }
        # the uncapped twin keeps non-anchor pairs (e.g. hi=1 vs hi=3)
        assert set(capped) < set(full)
        for k, v in capped.items():
            assert full[k] == v

    def test_capped_plan_broadcasts_the_bucket_tag(self, spark):
        hashes = spark.createDataFrame(
            [(0, 0, 0), (1, 1, 0)], "doc_id bigint, dhash_hi bigint, dhash_lo bigint"
        )
        plan = (
            dhash_pairs(hashes, max_hamming=2)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "CartesianProduct" not in plan
        # the oversized-bucket tag must broadcast, never shuffle the
        # banded stream an extra time
        assert "BroadcastHashJoin" in plan

    def test_index_probe_dedupes_both_sides(self, spark, tmp_path):
        from rheoceros_spark.operators.multimodal import (
            dedup_images_against_index,
            dhash_index_write,
        )

        def img(fn):
            return _img(fn)

        grad = lambda x, y, c: x * 14
        # index holds THREE byte-identical images; the verdict must
        # carry the smallest indexed id (what min(ham, iid) picked
        # before the distinct-hash reduction)
        corpus = spark.createDataFrame(
            [(7, img(grad)), (3, img(grad)), (9, img(grad))],
            "doc_id bigint, content binary",
        )
        idx = dhash_index_write(corpus, str(tmp_path / "idx"))
        batch = spark.createDataFrame(
            [(100, img(grad)), (101, img(grad))], "doc_id bigint, content binary"
        )
        out = {r.doc_id: r for r in dedup_images_against_index(batch, idx).collect()}
        assert len(out) == 2
        for nid in (100, 101):
            assert out[nid].dup_of == 3 and out[nid].min_hamming == 0


def test_loud_rejects(spark):
    df = spark.createDataFrame(
        [(0, encode_ppm(5, 5, bytes(75)))], "doc_id bigint, content binary"
    )
    with pytest.raises(ValueError, match="64 bits"):
        image_dhash(df, grid_w=4, grid_h=4)
    with pytest.raises(Exception, match="does not tile"):
        image_dhash(df).collect()  # 5x5 doesn't tile 9x8
    hashes = spark.createDataFrame(
        [(0, 0, 0)], "doc_id bigint, dhash_hi bigint, dhash_lo bigint"
    )
    with pytest.raises(ValueError, match="pigeonhole"):
        dhash_pairs(hashes, max_hamming=4)
