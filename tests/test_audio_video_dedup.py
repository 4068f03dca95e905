"""Perceptual audio (and video) dedup edges the staged fixtures can't
exercise: undecodable payloads, stereo/8-bit PCM, quantizer
exactness, the nibble-vs-bit distance semantics, and the exact-dup
grouping's linearity guarantee."""

import io
import struct
import wave

import pytest

from rheoceros_spark.operators.multimodal import (
    AUDIO_PHASH_SEGMENTS,
    audio_phash,
    audio_phash_pairs,
)


def _wav(frames: bytes, channels: int = 1, width: int = 2, rate: int = 8000) -> bytes:
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(channels)
        w.setsampwidth(width)
        w.setframerate(rate)
        w.writeframes(frames)
    return buf.getvalue()


def _square(bands, frames_per_seg: int = 32) -> bytes:
    """16-segment square wave whose segment s has amplitude
    bands[s]*2048 + 1024 — 16*rms lands exactly on bands[s] + 0.5."""
    out = b""
    for b in bands:
        v = b * 2048 + 1024
        out += (struct.pack("<h", v) + struct.pack("<h", -v)) * (frames_per_seg // 2)
    return out


def _hashes(spark, rows):
    df = spark.createDataFrame(rows, "doc_id bigint, content binary")
    return audio_phash(df)


class TestAudioPhash:
    def test_hand_computed_bands_and_packing(self, spark):
        bands = [(3 * s + 1) % 16 for s in range(16)]
        out = _hashes(spark, [(0, _wav(_square(bands)))]).collect()
        assert len(out) == 1
        lo = sum(bands[s] << (4 * s) for s in range(8))
        hi = sum(bands[s] << (4 * (s - 8)) for s in range(8, 16))
        assert (out[0].aph_hi, out[0].aph_lo) == (hi, lo)

    def test_quantizer_never_straddles_with_midpoint_amplitudes(self, spark):
        """Every band value 0..15 round-trips exactly: amplitude
        band*2048+1024 puts 16*rms at band + 0.5, the farthest point
        from both floor boundaries."""
        bands = list(range(16))
        out = _hashes(spark, [(0, _wav(_square(bands)))]).collect()[0]
        got = [
            (out.aph_lo >> (4 * s)) & 15 if s < 8 else (out.aph_hi >> (4 * (s - 8))) & 15
            for s in range(16)
        ]
        assert got == bands

    def test_stereo_and_8bit_paths(self, spark):
        """Channel-interleaved samples fold into one RMS stream; the
        8-bit unsigned path recenters on 128."""
        # stereo: both channels the same square wave -> same bands
        bands = [5] * 16
        mono = _square(bands)
        stereo = b"".join(
            mono[i : i + 2] * 2 for i in range(0, len(mono), 2)
        )
        m = _hashes(spark, [(0, _wav(mono))]).collect()[0]
        st = _hashes(spark, [(0, _wav(stereo, channels=2))]).collect()[0]
        assert (m.aph_hi, m.aph_lo) == (st.aph_hi, st.aph_lo)
        # 8-bit: amplitude 96/128 = 0.75 -> band floor(12.0) boundary
        # avoided with 0.75*16 = 12 exactly... use 100 -> 12.5
        pcm8 = bytes(([128 + 100, 128 - 100] * 8) * AUDIO_PHASH_SEGMENTS)
        e = _hashes(spark, [(1, _wav(pcm8, width=1))]).collect()[0]
        assert ((e.aph_lo >> 0) & 15) == 12  # floor(16*100/128) = 12

    def test_bad_payloads_are_skipped_not_fatal(self, spark):
        good = _wav(_square([7] * 16))
        rows = [
            (0, None),
            (1, b"not audio at all"),
            (2, good[:40]),  # truncated RIFF
            (3, good),
            (4, b"RIFF\x00\x00\x00\x00WAVEjunk"),
            (5, _wav(b"\x00\x00" * 8)),  # 8 samples < 16 segments
        ]
        out = _hashes(spark, rows).collect()
        assert [r.doc_id for r in out] == [3]

    def test_null_id_rows_dropped(self, spark):
        rows = [(None, _wav(_square([1] * 16))), (7, _wav(_square([1] * 16)))]
        df = spark.createDataFrame(rows, "doc_id bigint, content binary")
        assert [r.doc_id for r in audio_phash(df).collect()] == [7]


class TestAudioPhashPairs:
    def _pairs(self, spark, packs, **kw):
        rows = [(i, hi, lo) for i, (hi, lo) in enumerate(packs)]
        df = spark.createDataFrame(rows, "doc_id bigint, aph_hi bigint, aph_lo bigint")
        return audio_phash_pairs(df, **kw).collect()

    def test_nibble_distance_not_bit_hamming(self, spark):
        """One segment shifted 0 -> 15 flips FOUR bits but is ONE
        segment: the pair must qualify at max_seg_diff=1 (bit Hamming
        would call it 4 and lose it)."""
        a = (0, 0)
        b = (0, 15)  # segment 0 band 15, all others 0
        out = self._pairs(spark, [a, b], max_seg_diff=1)
        assert [(p.a, p.b, p.seg_diff) for p in out] == [(0, 1, 1)]

    def test_pigeonhole_detects_three_spread_segments(self, spark):
        """Diffs in 3 different bands still leave one band exact."""
        base = (0, 0)
        # segments 0 (band 0 of lo), 4 (band 1 of lo), 8 (band 0 of hi)
        pert = (9, 9 | (9 << 16))
        out = self._pairs(spark, [base, pert], max_seg_diff=3)
        assert [(p.a, p.b, p.seg_diff) for p in out] == [(0, 1, 3)]

    def test_exact_dups_star_pair_linearly(self, spark):
        """h identical fingerprints yield exactly h-1 star pairs (the
        r14 dhash grouping discipline) — not h^2 banded candidates."""
        packs = [(42, 99)] * 200
        out = self._pairs(spark, packs)
        assert len(out) == 199
        assert all(p.a == 0 and p.seg_diff == 0 for p in out)
        assert sorted(p.b for p in out) == list(range(1, 200))

    def test_validation_is_loud(self, spark):
        with pytest.raises(ValueError, match="max_seg_diff"):
            self._pairs(spark, [(0, 0)], max_seg_diff=4)

    def test_end_to_end_base_variant_fixture(self, spark):
        """The staged-fixture semantics through the real decode: same
        class twice (exact dup) + a one-segment variant (near dup)."""
        bands = [(5 * s + 2) % 16 for s in range(16)]
        var = list(bands)
        var[5] = (var[5] + 8) % 16
        rows = [
            (0, _wav(_square(bands))),
            (1, _wav(_square(bands))),
            (2, _wav(_square(var))),
        ]
        out = audio_phash_pairs(_hashes(spark, rows)).collect()
        got = sorted((p.a, p.b, p.seg_diff) for p in out)
        assert got == [(0, 1, 0), (0, 2, 1)]


# ---------------------------------------------------------------------------
# video: per-frame dHash sets + Jaccard verify
# ---------------------------------------------------------------------------

from rheoceros_spark.operators.multimodal import (  # noqa: E402
    encode_ppm,
    video_dedup_pairs,
    video_frame_dhash,
)


def _frame(tag: int) -> bytes:
    """18x16 block-constant P6 frame whose dHash is a deterministic
    function of ``tag`` (distinctness across tags verified offline
    for the range used here)."""
    px = bytearray()
    for y in range(16):
        j = y // 2
        for x in range(18):
            i = x // 2
            for c in range(3):
                px.append((17 * tag + 13 * i + 11 * j + 7 * i * j + 5 * c
                           + i * i * (tag + 1)) % 256)
    return encode_ppm(18, 16, bytes(px))


def _video(tags) -> bytes:
    return b"".join(_frame(t) for t in tags)


def _vdf(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, content binary")


class TestVideoFrameDhash:
    def test_demux_hashes_every_frame_once(self, spark):
        out = video_frame_dhash(_vdf(spark, [(0, _video([1, 2, 3]))])).collect()
        assert [r.frame_idx for r in sorted(out, key=lambda r: r.frame_idx)] == [0, 1, 2]
        assert len({(r.dhash_hi, r.dhash_lo) for r in out}) == 3

    def test_identical_frames_get_identical_hashes(self, spark):
        out = video_frame_dhash(_vdf(spark, [(0, _video([5, 5]))])).collect()
        assert len(out) == 2
        assert out[0].dhash_hi == out[1].dhash_hi
        assert out[0].dhash_lo == out[1].dhash_lo

    def test_bad_payloads_and_odd_frames_skip_not_fail(self, spark):
        # a 4x2 frame can't tile the 9x8 dhash grid -> skipped, but the
        # well-sized frames of the SAME video still hash
        odd = encode_ppm(4, 2, bytes(24))
        rows = [
            (0, None),
            (1, b"not a video"),
            (2, _frame(1)[:-5]),  # truncated pixel block
            (3, _frame(1) + odd + _frame(2)),
        ]
        out = video_frame_dhash(_vdf(spark, rows)).collect()
        assert sorted(r.frame_idx for r in out) == [0, 2]
        assert all(r.doc_id == 3 for r in out)

    def test_grid_validation_is_loud(self, spark):
        with pytest.raises(ValueError, match="64 bits"):
            video_frame_dhash(_vdf(spark, [(0, _frame(0))]), grid_w=4, grid_h=4)


class TestVideoDedupPairs:
    def test_exact_reuploads_star_pair_linearly(self, spark):
        """h identical videos -> h-1 star rows through the min-id
        representative, jaccard exactly 1.0."""
        rows = [(i, _video([1, 2, 3, 4])) for i in range(30)]
        out = video_dedup_pairs(video_frame_dhash(_vdf(spark, rows))).collect()
        assert len(out) == 29
        assert all(p.video_a == 0 and p.jaccard_r == 1.0 and p.n_shared == 4
                   for p in out)

    def test_one_frame_reedit_is_near_dup(self, spark):
        rows = [(0, _video([1, 2, 3, 4])), (1, _video([1, 2, 9, 4]))]
        out = video_dedup_pairs(video_frame_dhash(_vdf(spark, rows))).collect()
        assert [(p.video_a, p.video_b, p.n_shared, p.jaccard_r) for p in out] == [
            (0, 1, 3, 0.6)
        ]

    def test_repeated_frames_count_once_in_the_set(self, spark):
        """A looping video (frame repeated) must not inflate n_frames
        or n_shared — sets, not bags."""
        rows = [(0, _video([1, 1, 1, 2])), (1, _video([1, 2]))]
        out = video_dedup_pairs(video_frame_dhash(_vdf(spark, rows))).collect()
        # both videos reduce to the SAME distinct set {1,2} -> exact dup
        assert [(p.video_a, p.video_b, p.jaccard_r) for p in out] == [(0, 1, 1.0)]

    def test_max_videos_drops_ubiquitous_intro_frame(self, spark):
        """An intro card on every video must not make everything a
        candidate; after the cap, videos sharing ONLY the intro stop
        pairing."""
        rows = [(i, _video([0, 100 + i])) for i in range(8)]
        capped = video_dedup_pairs(
            video_frame_dhash(_vdf(spark, rows)), threshold=0.4, max_videos=4
        ).collect()
        assert capped == []
        uncapped = video_dedup_pairs(
            video_frame_dhash(_vdf(spark, rows)), threshold=0.3, max_videos=None
        ).collect()
        assert len(uncapped) == 28  # all pairs share the intro at jac 1/3

    def test_threshold_validation_is_loud(self, spark):
        with pytest.raises(ValueError, match="threshold"):
            video_dedup_pairs(
                video_frame_dhash(_vdf(spark, [(0, _video([1]))])), threshold=0.0
            )


# ---------------------------------------------------------------------------
# audio incremental index + gate-at-ingest (the dhash-index family twin)
# ---------------------------------------------------------------------------

from rheoceros_spark.operators.multimodal import (  # noqa: E402
    aphash_index_write,
    dedup_audio_against_index,
)


def _amedia(spark, rows):
    """rows = [(doc_id, bands list)]"""
    return spark.createDataFrame(
        [(i, _wav(_square(b))) for i, b in rows], "doc_id bigint, content binary"
    )


class TestAudioIndex:
    def test_probe_finds_exact_and_near_novel_null(self, spark, tmp_path):
        base = [(3 * s + 1) % 16 for s in range(16)]
        near = list(base)
        near[5] = (near[5] + 8) % 16
        other = [(7 * s + 3) % 16 for s in range(16)]
        idx = aphash_index_write(
            _amedia(spark, [(0, base), (1, base)]), str(tmp_path / "aidx")
        )
        out = {
            r.doc_id: r
            for r in dedup_audio_against_index(
                _amedia(spark, [(10, base), (11, near), (12, other)]), idx
            ).collect()
        }
        assert (out[10].dup_of, out[10].min_seg_diff) == (0, 0)  # smallest id wins
        assert (out[11].dup_of, out[11].min_seg_diff) == (0, 1)
        assert out[12].dup_of is None and out[12].min_seg_diff is None

    def test_append_equals_rebuild(self, spark, tmp_path):
        a = [(5 * s) % 16 for s in range(16)]
        b = [(5 * s + 1) % 16 for s in range(16)]
        p1, p2 = str(tmp_path / "i1"), str(tmp_path / "i2")
        aphash_index_write(_amedia(spark, [(0, a)]), p1)
        aphash_index_write(_amedia(spark, [(1, b)]), p1, mode="append")
        aphash_index_write(_amedia(spark, [(0, a), (1, b)]), p2)
        r1 = sorted(map(tuple, spark.read.parquet(p1).collect()))
        r2 = sorted(map(tuple, spark.read.parquet(p2).collect()))
        assert r1 == r2

    def test_scheme_mismatch_is_loud(self, spark):
        import pyspark.sql.functions as SF

        idx = aphash_index_write(_amedia(spark, [(0, [1] * 16)])).withColumn(
            "aphash_algo", SF.lit("aphash-v0:other-scheme")
        )
        with pytest.raises(ValueError, match="aphash_algo"):
            dedup_audio_against_index(_amedia(spark, [(1, [1] * 16)]), idx)
        bad = spark.createDataFrame([(0, 1)], "doc_id bigint, aph_hi bigint")
        with pytest.raises(ValueError, match="missing"):
            dedup_audio_against_index(_amedia(spark, [(1, [1] * 16)]), bad)

    def test_stream_gate_matches_batch(self, spark, tmp_path):
        from rheoceros_spark.streaming import stream_audio_dedup_gate

        base = [(3 * s + 2) % 16 for s in range(16)]
        near = list(base)
        near[9] = (near[9] + 8) % 16
        other = [(11 * s + 5) % 16 for s in range(16)]
        idx = aphash_index_write(
            _amedia(spark, [(0, base)]), str(tmp_path / "idx")
        ).localCheckpoint()
        batch = _amedia(spark, [(10, base), (11, near), (12, other)])
        src = str(tmp_path / "src")
        batch.write.parquet(src)
        sdf = spark.readStream.schema("doc_id bigint, content binary").parquet(src)
        gated = stream_audio_dedup_gate(sdf, idx)
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
            (r.doc_id, r.dup_of, r.min_seg_diff)
            for r in spark.read.parquet(out).collect()
        )
        want = sorted(
            (r.doc_id, r.dup_of, r.min_seg_diff)
            for r in dedup_audio_against_index(batch, idx).collect()
        )
        assert got == want and len(got) == 3

    def test_stream_gate_tier_cap_is_loud(self, spark, tmp_path):
        from rheoceros_spark.streaming import stream_audio_dedup_gate

        idx = aphash_index_write(
            _amedia(spark, [(i, [(i + s) % 16 for s in range(16)]) for i in range(6)])
        )
        src = str(tmp_path / "src2")
        _amedia(spark, [(99, [1] * 16)]).write.parquet(src)
        sdf = spark.readStream.schema("doc_id bigint, content binary").parquet(src)
        with pytest.raises(ValueError, match="broadcastable tier"):
            stream_audio_dedup_gate(sdf, idx, max_index_rows=3)


# ---------------------------------------------------------------------------
# video incremental index (frame-hash rows, set-level probe)
# ---------------------------------------------------------------------------

from rheoceros_spark.operators.multimodal import (  # noqa: E402
    dedup_videos_against_index,
    video_index_write,
)


class TestVideoIndex:
    def test_probe_reupload_reedit_and_novel(self, spark, tmp_path):
        idx = video_index_write(
            _vdf(spark, [(0, _video([1, 2, 3, 4])), (1, _video([50, 51]))]),
            str(tmp_path / "vidx"),
        )
        out = {
            r.doc_id: r
            for r in dedup_videos_against_index(
                _vdf(
                    spark,
                    [
                        (10, _video([1, 2, 3, 4])),   # exact re-upload
                        (11, _video([1, 2, 9, 4])),   # one-frame re-edit
                        (12, _video([70, 71, 72])),   # novel
                        (13, b"not a video"),          # undecodable
                    ],
                ),
                idx,
            ).collect()
        }
        assert (out[10].dup_of, out[10].jaccard_r, out[10].n_shared) == (0, 1.0, 4)
        assert (out[11].dup_of, out[11].jaccard_r, out[11].n_shared) == (0, 0.6, 3)
        assert out[12].dup_of is None and out[12].n_frames == 3
        assert out[13].dup_of is None and out[13].n_frames == 0

    def test_identical_new_sets_share_one_probe_verdict(self, spark, tmp_path):
        idx = video_index_write(
            _vdf(spark, [(0, _video([1, 2]))]), str(tmp_path / "vidx2")
        )
        out = dedup_videos_against_index(
            _vdf(spark, [(10, _video([1, 2])), (11, _video([1, 2]))]), idx
        ).collect()
        got = sorted((r.doc_id, r.dup_of, r.jaccard_r) for r in out)
        assert got == [(10, 0, 1.0), (11, 0, 1.0)]

    def test_best_match_prefers_higher_jaccard_then_smaller_id(self, spark, tmp_path):
        # indexed 0 shares 1 frame of 3; indexed 1 shares 2 of 3
        idx = video_index_write(
            _vdf(spark, [(0, _video([1, 8, 9])), (1, _video([1, 2, 7]))]),
            str(tmp_path / "vidx3"),
        )
        out = dedup_videos_against_index(
            _vdf(spark, [(10, _video([1, 2, 3]))]), idx, threshold=0.2
        ).collect()
        assert [(r.dup_of, r.n_shared) for r in out] == [(1, 2)]
        # equal-jaccard tie -> smallest indexed id
        idx2 = video_index_write(
            _vdf(spark, [(5, _video([1, 2, 30])), (4, _video([1, 2, 31]))]),
            str(tmp_path / "vidx4"),
        )
        out2 = dedup_videos_against_index(
            _vdf(spark, [(10, _video([1, 2, 3]))]), idx2, threshold=0.2
        ).collect()
        assert out2[0].dup_of == 4

    def test_append_equals_rebuild_and_scheme_reject(self, spark, tmp_path):
        import pyspark.sql.functions as SF

        p1, p2 = str(tmp_path / "i1"), str(tmp_path / "i2")
        video_index_write(_vdf(spark, [(0, _video([1, 2]))]), p1)
        video_index_write(_vdf(spark, [(1, _video([3]))]), p1, mode="append")
        video_index_write(
            _vdf(spark, [(0, _video([1, 2])), (1, _video([3]))]), p2
        )
        assert sorted(map(tuple, spark.read.parquet(p1).collect())) == sorted(
            map(tuple, spark.read.parquet(p2).collect())
        )
        bad = video_index_write(_vdf(spark, [(0, _video([1]))])).withColumn(
            "vset_algo", SF.lit("vset-v0:other")
        )
        with pytest.raises(ValueError, match="vset_algo"):
            dedup_videos_against_index(_vdf(spark, [(1, _video([1]))]), bad)
        with pytest.raises(ValueError, match="threshold"):
            dedup_videos_against_index(
                _vdf(spark, [(1, _video([1]))]),
                video_index_write(_vdf(spark, [(0, _video([1]))])),
                threshold=1.5,
            )
