"""Bloom-filter dedup gate (round 12) — the Dolma/DataComp
memory-bounded dedup state: deterministic md5-derived filter,
no-false-negative guarantee, loud artifact guards, rowfold≡join probe
parity, batch≡stream parity, DuckDB bit-for-bit filter parity."""

import duckdb
import pandas as pd
import pytest
from pyspark.sql import functions as F

from rheoceros_spark.operators.dedup import (
    BLOOM_ALGO,
    bloom_build,
    bloom_duckdb_sql,
    bloom_fill_ratio,
    dedup_bloom_gate,
)


def _fps(spark, n=200, prefix="fp"):
    return spark.createDataFrame(
        [(i, f"{prefix}{i}") for i in range(n)], "doc_id bigint, fp string"
    )


def test_no_false_negatives_every_inserted_fp_flags(spark):
    """The Bloom guarantee: an inserted fingerprint can NEVER probe
    novel — over 500 inserted fps, all 500 must flag maybe_dup=1."""
    df = _fps(spark, 500)
    filt = bloom_build(df, m_bits=1 << 14, k=4)
    out = dedup_bloom_gate(df, filt)
    assert out.where(F.col("maybe_dup") == 0).count() == 0
    assert out.count() == 500


def test_novel_fps_mostly_pass_and_null_is_novel(spark):
    df = _fps(spark, 100)
    filt = bloom_build(df, m_bits=1 << 14, k=4)
    probe = spark.createDataFrame(
        [(1000 + i, f"unseen-{i}") for i in range(100)] + [(2000, None)],
        "doc_id bigint, fp string",
    )
    out = {r.doc_id: r.maybe_dup for r in dedup_bloom_gate(probe, filt).collect()}
    # at 100·4/16384 ≈ 2.4% fill, fpp ≈ (0.024)^4 — statistically zero
    # over 100 novel probes; determinism makes the assertion stable
    assert sum(out[1000 + i] for i in range(100)) == 0
    assert out[2000] == 0  # NULL fingerprint = novel (nothing to match)


def test_rowfold_and_join_paths_agree(spark):
    """The ≤256-word plan-literal fold and the broadcast-join path must
    produce identical verdicts (the sif_embed dual-path rule)."""
    df = _fps(spark, 150)
    probe = spark.createDataFrame(
        [(i, f"fp{i}") for i in range(100, 220)] + [(9999, None)],
        "doc_id bigint, fp string",
    )
    small = bloom_build(df, m_bits=1 << 13, k=4)   # 256 words → rowfold
    # identical positions mod 2^13 require the SAME m; emulate the join
    # path by padding the word count over the rowfold cap with m=2^16
    big = bloom_build(df, m_bits=1 << 16, k=4)     # 2048 words → join
    small_v = {r.doc_id: r.maybe_dup for r in dedup_bloom_gate(probe, small).collect()}
    big_v = {r.doc_id: r.maybe_dup for r in dedup_bloom_gate(probe, big).collect()}
    # inserted fps (100..149) flag on BOTH paths; the guarantee is
    # path-independent.  Novel fps may false-positive on the small
    # filter only (coarser m) — assert the guarantee + big-path purity
    for i in range(100, 150):
        assert small_v[i] == 1 and big_v[i] == 1
    assert all(big_v[i] == 0 for i in range(150, 220))
    assert small_v[9999] == 0 and big_v[9999] == 0


def test_same_m_rowfold_equals_join_exactly(spark):
    """Same (m, k) probed through both code paths — force the join
    path by monkeypatching the rowfold cap — must be bit-identical."""
    import rheoceros_spark.operators.dedup as d

    df = _fps(spark, 150)
    probe = spark.createDataFrame(
        [(i, f"fp{i}") for i in range(120, 260)], "doc_id bigint, fp string"
    )
    filt = bloom_build(df, m_bits=1 << 13, k=4)
    fold = {r.doc_id: r.maybe_dup for r in dedup_bloom_gate(probe, filt).collect()}
    old = d._BLOOM_ROWFOLD_MAX_WORDS
    d._BLOOM_ROWFOLD_MAX_WORDS = 0
    try:
        join = {r.doc_id: r.maybe_dup for r in dedup_bloom_gate(probe, filt).collect()}
    finally:
        d._BLOOM_ROWFOLD_MAX_WORDS = old
    assert fold == join


def test_duplicate_ids_in_batch_keep_per_row_verdicts(spark):
    """Regression (r13): the join path must verdict PER ROW, not per
    id.  A batch probing two different INSERTED fps under one shared
    doc_id used to sum hits across rows (2k != k → maybe_dup=0), a
    false negative violating the Bloom guarantee.  Exercise both code
    paths with shared ids over inserted, novel and NULL fps."""
    import rheoceros_spark.operators.dedup as d

    corpus = _fps(spark, 200)
    filt = bloom_build(corpus, m_bits=1 << 14, k=4)
    # doc_id 7 probes TWO inserted fps + one novel; doc_id 8 probes the
    # SAME inserted fp twice; doc_id 9 mixes an inserted fp with NULL
    probe = spark.createDataFrame(
        [
            (7, "fp1"),
            (7, "fp2"),
            (7, "unseen-a"),
            (8, "fp3"),
            (8, "fp3"),
            (9, "fp4"),
            (9, None),
        ],
        "doc_id bigint, fp string",
    )

    def verdicts():
        rows = dedup_bloom_gate(probe, filt).collect()
        assert len(rows) == 7  # one verdict per probe row, no id collapse
        return sorted(
            ((r.doc_id, r.fp, r.maybe_dup) for r in rows),
            key=lambda t: (t[0], t[1] or "", t[2]),
        )

    fold = verdicts()
    old = d._BLOOM_ROWFOLD_MAX_WORDS
    d._BLOOM_ROWFOLD_MAX_WORDS = 0
    try:
        join = verdicts()
    finally:
        d._BLOOM_ROWFOLD_MAX_WORDS = old
    assert fold == join
    expected = sorted(
        [
            (7, "fp1", 1),
            (7, "fp2", 1),
            (7, "unseen-a", 0),
            (8, "fp3", 1),
            (8, "fp3", 1),
            (9, "fp4", 1),
            (9, None, 0),
        ],
        key=lambda t: (t[0], t[1] or "", t[2]),
    )
    assert fold == expected


def test_build_rejects_bad_params(spark):
    df = _fps(spark, 10)
    with pytest.raises(ValueError, match="power of two"):
        bloom_build(df, m_bits=1000)
    with pytest.raises(ValueError, match="power of two"):
        bloom_build(df, m_bits=32)
    with pytest.raises(ValueError, match="k must be"):
        bloom_build(df, k=0)


def test_probe_guards_are_loud(spark, tmp_path):
    df = _fps(spark, 400)
    path = str(tmp_path / "bloom")
    filt = bloom_build(df, m_bits=1 << 13, k=4, path=path)
    # mixed-stamp append
    mixed = bloom_build(df, m_bits=1 << 14, k=4, path=path, mode="append")
    with pytest.raises(ValueError, match="MIXED"):
        dedup_bloom_gate(df, mixed)
    # foreign scheme tag
    foreign = filt.withColumn("bloom_algo", F.lit("bloom_other_v9"))
    with pytest.raises(ValueError, match="scheme"):
        dedup_bloom_gate(df, foreign)
    # empty filter frame
    with pytest.raises(ValueError, match="empty"):
        dedup_bloom_gate(df, filt.where(F.lit(False)))
    # saturation refusal: tiny m, many inserts → >50% fill
    sat = bloom_build(df, m_bits=1 << 8, k=4)
    assert bloom_fill_ratio(sat) > 0.5
    with pytest.raises(ValueError, match="full"):
        dedup_bloom_gate(df, sat)
    assert BLOOM_ALGO.startswith("bloom_")


def test_filter_matches_duckdb_bit_for_bit(spark):
    rows = [(i, f"fp{i}") for i in range(300)]
    df = spark.createDataFrame(rows, "doc_id bigint, fp string")
    filt = bloom_build(df, m_bits=1 << 13, k=4)
    got = sorted((int(r["word_idx"]), int(r["bits"])) for r in filt.collect())
    b = bloom_duckdb_sql("fp", 1 << 13, 4)
    con = duckdb.connect()
    con.register("t", pd.DataFrame(rows, columns=["doc_id", "fp"]))
    want = con.sql(
        f"WITH pos AS (SELECT unnest({b['positions']}) AS p FROM t "
        f"WHERE fp IS NOT NULL) {b['word_bits']} ORDER BY 1"
    ).fetchall()
    assert got == [tuple(w) for w in want]


def test_two_tier_gate_composes_with_exact_verify(spark):
    """The production shape: bloom maybe-set → exact fp semi-join.
    Definite-novels skip exact state entirely; the verified output
    equals plain exact dedup."""
    corpus = _fps(spark, 200)
    probe = spark.createDataFrame(
        [(500, "fp7"), (501, "brand-new"), (502, "fp199"), (503, "also-new")],
        "doc_id bigint, fp string",
    )
    filt = bloom_build(corpus, m_bits=1 << 14, k=4)
    gated = dedup_bloom_gate(probe, filt)
    maybe = gated.where(F.col("maybe_dup") == 1)
    confirmed = maybe.join(
        corpus.select("fp").distinct(), "fp", "left_semi"
    )
    novel = gated.where(F.col("maybe_dup") == 0).select("doc_id")
    assert {r.doc_id for r in confirmed.collect()} == {500, 502}
    assert {r.doc_id for r in novel.collect()} == {501, 503}


def test_stream_gate_matches_batch(spark, tmp_path):
    from rheoceros_spark.streaming.stream import stream_bloom_gate

    corpus = _fps(spark, 120)
    filt = bloom_build(corpus, m_bits=1 << 13, k=4).localCheckpoint()
    probe = spark.createDataFrame(
        [(i, f"fp{i}") for i in range(100, 160)], "doc_id bigint, fp string"
    )
    src = str(tmp_path / "bloom_src")
    probe.coalesce(2).write.mode("overwrite").parquet(src)
    batch = {
        (r.doc_id, r.maybe_dup) for r in dedup_bloom_gate(probe, filt).collect()
    }
    assert batch, "vacuous"
    sdf = spark.readStream.schema(probe.schema).parquet(src)
    out = []
    q = (
        stream_bloom_gate(sdf, filt)
        .writeStream.foreachBatch(lambda b, i: out.extend(b.collect()))
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt_bloom"))
        .start()
    )
    q.awaitTermination(120)
    assert {(r.doc_id, r.maybe_dup) for r in out} == batch
