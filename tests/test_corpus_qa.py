"""Corpus-QA + diagnostics family (round 11 session 2, staged for
r13): the datasheet rollup, snapshot drift, the SemDeDup keep-list,
and the join-key skew profiler.  Oracle parity runs in
tests/test_staged.py; these pin the hand-checkable edge semantics."""

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from rheoceros_spark.operators.curation import corpus_datasheet, snapshot_drift
from rheoceros_spark.operators.dedup import semantic_dup_pairs, semantic_keep_list
from rheoceros_spark.operators.curation import dedup_keep_list
from rheoceros_spark.operators.scale import skew_report
from rheoceros_spark.sources.io import load_table


# ---------------------------------------------------------------------------
# skew_report
# ---------------------------------------------------------------------------

def test_skew_report_hand_computed(spark):
    # key 'hot' carries 6 of 10 rows; 3 other keys carry 2/1/1
    rows = ["hot"] * 6 + ["b"] * 2 + ["a", None]
    df = spark.createDataFrame([Row(k=v) for v in rows])
    out = {r["key"]: r.asDict() for r in skew_report(df, "k", top=10).collect()}
    assert out["hot"]["rank"] == 1 and out["hot"]["cnt"] == 6
    # share: 6/10 = 600000 ppm; skew: max(6)·keys(4)·1e6 // rows(10)
    assert out["hot"]["share_q"] == 600_000
    assert out["hot"]["skew_q"] == 2_400_000
    assert all(r["n_rows"] == 10 and r["n_keys"] == 4 for r in out.values())
    # NULL is a real profiled key
    assert None in out and out[None]["cnt"] == 1


def test_skew_report_rank_ties_break_on_key_string(spark):
    df = spark.createDataFrame([Row(k=v) for v in ["x", "y", "x", "y", "z"]])
    got = [
        (r["key"], r["rank"])
        for r in skew_report(df, "k", top=2).orderBy("rank").collect()
    ]
    assert got == [("x", 1), ("y", 2)]  # tie on cnt=2 → ascending key


def test_skew_report_top_bounds_output(spark):
    df = spark.createDataFrame([Row(k=i % 7) for i in range(50)])
    assert skew_report(df, "k", top=3).count() == 3
    with pytest.raises(ValueError):
        skew_report(df, "k", top=0)


def test_skew_report_uniform_key_is_1e6(spark):
    df = spark.createDataFrame([Row(k=i % 5) for i in range(25)])
    r = skew_report(df, "k", top=1).collect()[0]
    assert r["skew_q"] == 1_000_000  # perfectly uniform


# ---------------------------------------------------------------------------
# corpus_datasheet
# ---------------------------------------------------------------------------

def _docs(spark):
    return spark.createDataFrame(
        [
            Row(doc_id=1, text="a b c", lang="en", source="s1"),
            Row(doc_id=2, text="a b c", lang="en", source="s1"),  # exact dup
            Row(doc_id=3, text="  A  b   C ", lang="fr", source="s1"),  # dup after norm
            Row(doc_id=4, text=None, lang=None, source="s1"),  # empty
            Row(doc_id=5, text="unique words here", lang="en", source=None),
        ]
    )


def test_datasheet_hand_computed(spark):
    out = {r["source"]: r.asDict() for r in corpus_datasheet(_docs(spark)).collect()}
    s1 = out["s1"]
    assert s1["n_docs"] == 4 and s1["n_empty"] == 1
    # docs 1-3 normalize to 'a b c' (3 tokens each), doc 4 contributes 0
    assert s1["total_tokens"] == 9
    assert s1["n_distinct"] == 1  # one fingerprint; NULL text is not a fp
    assert s1["dup_rate_q"] == 750_000  # (4-1)·1e6 // 4
    assert s1["n_langs"] == 3  # en, fr, (null)
    assert s1["top_lang"] == "en" and s1["top_lang_docs"] == 2
    # NULL source is reported, not dropped
    null_g = out["(null)"]
    assert null_g["n_docs"] == 1 and null_g["dup_rate_q"] == 0
    assert null_g["total_chars"] == len("unique words here")


def test_datasheet_empty_text_counts_zero_tokens(spark):
    df = spark.createDataFrame(
        [Row(doc_id=1, text="   ", lang="en", source="s"),
         Row(doc_id=2, text="", lang="en", source="s")]
    )
    r = corpus_datasheet(df).collect()[0]
    # the string_split('') == [''] trap: empty docs must NOT count 1 token
    assert r["total_tokens"] == 0 and r["n_empty"] == 2


def test_datasheet_top_lang_tie_breaks_ascending(spark):
    df = spark.createDataFrame(
        [Row(doc_id=1, text="x", lang="fr", source="s"),
         Row(doc_id=2, text="y", lang="en", source="s")]
    )
    r = corpus_datasheet(df).collect()[0]
    assert r["top_lang"] == "en" and r["n_langs"] == 2


# ---------------------------------------------------------------------------
# snapshot_drift
# ---------------------------------------------------------------------------

def _snap_docs(spark):
    # snapshot 0: langs {en:2, fr:1}; snapshot 1: {en:1, de:2};
    # snapshot 3 exists but 2 does not → no (2,3) or (3,4) pair
    rows = [
        (0, "en"), (0, "en"), (0, "fr"),
        (1, "en"), (1, "de"), (1, "de"),
        (3, "en"),
    ]
    return spark.createDataFrame(
        [Row(doc_id=i, snapshot=s, text="w " * 5, lang=l)
         for i, (s, l) in enumerate(rows)]
    )


def test_snapshot_drift_hand_computed_chi2(spark):
    out = snapshot_drift(_snap_docs(spark)).collect()
    by = {(r["snap_a"], r["feature"]): r.asDict() for r in out}
    # only the (0,1) pair exists: 2 is absent so (1,2)/(2,3)/(3,4) are out
    assert set(by) == {(0, "lang"), (0, "len_bucket")}
    lang = by[(0, "lang")]
    # en: a=2,b=1 → 1·1e6//3 = 333333; fr: a=1,b=0 → 1e6; de: a=0,b=2 → 2e6
    assert lang["chi2_q"] == 333_333 + 1_000_000 + 2_000_000
    assert lang["n_a"] == 3 and lang["n_b"] == 3
    assert lang["n_values_a"] == 2 and lang["n_values_b"] == 2
    assert lang["snap_b"] == 1
    # all docs share one length bucket → zero drift
    lb = by[(0, "len_bucket")]
    assert lb["chi2_q"] == 0 and lb["n_values_a"] == 1


def test_snapshot_drift_identical_snapshots_zero(spark):
    df = spark.createDataFrame(
        [Row(doc_id=i, snapshot=i % 2, text="a b c", lang="en") for i in range(8)]
    )
    for r in snapshot_drift(df).collect():
        assert r["chi2_q"] == 0


def test_snapshot_drift_rejects_bad_buckets(spark):
    df = _snap_docs(spark)
    with pytest.raises(ValueError):
        snapshot_drift(df, bucket_width=0)
    with pytest.raises(ValueError):
        snapshot_drift(df, max_bucket=0)


def test_snapshot_drift_single_snapshot_is_empty(spark):
    df = spark.createDataFrame(
        [Row(doc_id=i, snapshot=5, text="a", lang="en") for i in range(3)]
    )
    assert snapshot_drift(df).count() == 0


# ---------------------------------------------------------------------------
# semantic_keep_list
# ---------------------------------------------------------------------------

def test_semantic_keep_matches_pairs_composition(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    keep = semantic_keep_list(emb, threshold=0.4, k=4, iters=1)
    pairs = semantic_dup_pairs(emb, threshold=0.4, k=4, iters=1)
    twin = dedup_keep_list(
        emb.where(F.col("vec_id").isNotNull()), pairs, id_col="vec_id"
    )
    assert sorted(map(tuple, keep.collect())) == sorted(map(tuple, twin.collect()))
    rows = keep.collect()
    ids = {r["vec_id"] for r in rows}
    # every document appears exactly once; representatives are self-kept
    assert len(rows) == len(ids)
    for r in rows:
        assert r["keep_id"] in ids and r["keep_id"] <= r["vec_id"]
        assert r["is_dup"] == (r["keep_id"] != r["vec_id"])
    reps = {r["keep_id"] for r in rows}
    for r in rows:
        if r["vec_id"] in reps:
            # a representative is never itself purged
            assert not r["is_dup"] or r["keep_id"] != r["vec_id"]


def test_semantic_pairs_salt_is_invisible_in_the_output(spark, sf_dir):
    """The r14 skew salt (a-side hashed, b-side exploded — the
    icp_order shape) splits a hot cell across tasks but must not
    change the pair set: identical rows for salt=1 (the unsalted
    plan) and any salt > 1."""
    emb = load_table(spark, sf_dir, "embeddings")
    base = semantic_dup_pairs(emb, threshold=0.4, k=4, iters=1, salt=1)
    base_rows = sorted(map(tuple, base.collect()))
    assert base_rows  # non-vacuous: the fixture yields pairs
    for s in (4, 16):
        salted = semantic_dup_pairs(emb, threshold=0.4, k=4, iters=1, salt=s)
        assert sorted(map(tuple, salted.collect())) == base_rows, s
    with pytest.raises(ValueError, match="salt"):
        semantic_dup_pairs(emb, salt=0)
