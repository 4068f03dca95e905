"""Mixture/audit family (staged for r14): temperature-smoothed
sampling, SIF-weighted hash embeddings, the n-gram memorization audit,
and the character-entropy gate.

The sf-corpus DuckDB parity for all four lives in tests/test_staged.py
(parametrized over _STAGED_QUERIES); this file pins the semantics the
fixture corpus can't exercise — NULL/empty text, NULL groups, the
subset-monotone gate, hand-computed entropy values, the SIF tail-weight
path, and short-document exclusion.
"""

import math

import pytest
from pyspark.sql import functions as F

from rheoceros_spark.operators.curation import (
    SAMPLE_BUCKETS,
    temperature_mix,
    temperature_mix_plan,
)
from rheoceros_spark.operators.dedup import ngram_hotspots
from rheoceros_spark.operators.text_analysis import char_entropy, sif_embed

DOCS = "doc_id bigint, text string, lang string"


# ---------------------------------------------------------------------------
# temperature_mix
# ---------------------------------------------------------------------------


def _skewed_corpus(spark, n_a=400, n_b=40, n_c=4):
    rows = (
        [(i, f"text {i}", "a") for i in range(n_a)]
        + [(1000 + i, f"text {i}", "b") for i in range(n_b)]
        + [(2000 + i, f"text {i}", "c") for i in range(n_c)]
    )
    return spark.createDataFrame(rows, DOCS)


def test_temperature_plan_alpha_one_is_proportional(spark):
    """α=1 must keep the natural mixture: every rate == target_frac."""
    plan = temperature_mix_plan(
        _skewed_corpus(spark), group_col="lang", alpha=1.0, target_frac=0.25
    )
    rates = {r["lang"]: r["rate_q"] for r in plan.collect()}
    assert rates == {"a": 250_000, "b": 250_000, "c": 250_000}


def test_temperature_plan_upsamples_the_tail(spark):
    """α<1 must raise the keep-rate of small groups above large ones
    (the XLM-R low-resource upsampling property), and the hand-computed
    quantized rate for the head group must match exactly."""
    plan = temperature_mix_plan(
        _skewed_corpus(spark), group_col="lang", alpha=0.3125, target_frac=0.5
    )
    rows = {r["lang"]: r for r in plan.collect()}
    assert rows["a"]["rate_q"] < rows["b"]["rate_q"] <= rows["c"]["rate_q"]

    # hand-computed twin of the documented formula: n^(5/16) as the
    # SAME sqrt composition (1/4 + 1/16 bits), exact-int pa_q
    def pow516(x):
        return math.sqrt(math.sqrt(x)) * math.sqrt(math.sqrt(math.sqrt(math.sqrt(x))))

    pa = {g: math.floor(pow516(n) * 1e6 + 0.5) for g, n in [("a", 400), ("b", 40), ("c", 4)]}
    sa, nn = sum(pa.values()), 444
    for g, n in [("a", 400), ("b", 40), ("c", 4)]:
        rate = min(1.0, 0.5 * nn * pa[g] / sa / n)
        assert rows[g]["rate_q"] == math.floor(rate * SAMPLE_BUCKETS + 0.5)


def test_temperature_rate_caps_at_one(spark):
    """A tiny group whose smoothed share exceeds its size caps at 1e6
    (you cannot keep more documents than exist)."""
    df = _skewed_corpus(spark, n_a=1000, n_b=10, n_c=2)
    plan = temperature_mix_plan(df, group_col="lang", alpha=0.0, target_frac=0.9)
    rows = {r["lang"]: r["rate_q"] for r in plan.collect()}
    assert rows["c"] == SAMPLE_BUCKETS  # capped
    assert rows["a"] < SAMPLE_BUCKETS


def test_temperature_mix_gate_is_subset_monotone(spark):
    """Raising target_frac must only ADD documents (the hash-bucket
    gate property every sampler in the module shares)."""
    df = _skewed_corpus(spark)
    small = {
        r["doc_id"]
        for r in temperature_mix(
            df, group_col="lang", alpha=0.3125, target_frac=0.2
        ).collect()
    }
    big = {
        r["doc_id"]
        for r in temperature_mix(
            df, group_col="lang", alpha=0.3125, target_frac=0.6
        ).collect()
    }
    assert small <= big
    assert len(small) < len(big)


def test_temperature_mix_drops_null_group_and_null_id(spark):
    df = spark.createDataFrame(
        [(1, "t", "a"), (2, "t", None), (None, "t", "a"), (3, "t", "a")], DOCS
    )
    out = temperature_mix(df, group_col="lang", alpha=0.5, target_frac=1.0)
    assert {r["doc_id"] for r in out.collect()} == {1, 2, 3} - {2}


def test_temperature_mix_rejects_bad_params(spark):
    df = _skewed_corpus(spark, 4, 4, 4)
    with pytest.raises(ValueError, match="alpha"):
        temperature_mix_plan(df, alpha=1.5)
    # OFF the 1/16 grid → loud refusal (libm pow is engine-divergent;
    # the sqrt-composable grid is the determinism contract)
    with pytest.raises(ValueError, match="1/16"):
        temperature_mix_plan(df, alpha=0.3)
    with pytest.raises(ValueError, match="target_frac"):
        temperature_mix_plan(df, target_frac=0.0)


# ---------------------------------------------------------------------------
# sif_embed
# ---------------------------------------------------------------------------


def test_sif_embed_null_and_empty_text(spark):
    df = spark.createDataFrame(
        [(1, None, "en"), (2, "", "en"), (3, "only words here", "en")], DOCS
    )
    out = {r["doc_id"]: r["embedding"] for r in sif_embed(df, dim=4).collect()}
    assert out[1] is None
    assert out[2] == [0.0, 0.0, 0.0, 0.0]
    assert any(v != 0.0 for v in out[3])


def test_sif_embed_downweights_frequent_tokens(spark):
    """With a = p(rare), the stopword-heavy doc's vector must shrink
    relative to hash_embed's unweighted projection: the 'the' weight is
    a/(a+p_the) << 1 while the rare token stays near 1."""
    rows = [(i, "the the the the the the the the", "en") for i in range(9)]
    rows.append((9, "the zyzzyva", "en"))
    df = spark.createDataFrame(rows, DOCS)
    emb = {r["doc_id"]: r["embedding"] for r in sif_embed(df, dim=8, a=0.01).collect()}
    # 73 'the' tokens of 74 total; the exact quantized weights from the
    # documented formula — components are ±wq sums
    wq_the = math.floor(1e6 * (0.01 / (0.01 + 73 / 74)) + 0.5)
    wq_rare = math.floor(1e6 * (0.01 / (0.01 + 1 / 74)) + 0.5)
    assert wq_the < 0.03 * wq_rare  # the downweighting is drastic
    the_mag = max(abs(v) for v in emb[0])
    assert the_mag == 8 * wq_the  # 8 tokens × wq(the), all dims ±sum
    mixed = emb[9]
    assert max(abs(v) for v in mixed) >= wq_rare - wq_the  # zyzzyva dominates


def test_sif_embed_tail_weight_is_exactly_one(spark):
    """Tokens outside the top-V head take weight exactly 1.0 (1e6
    micro-units) — with vocab_size=1 only the single most frequent
    token is downweighted."""
    df = spark.createDataFrame(
        [(1, "common common common common rare", "en")], DOCS
    )
    out = sif_embed(df, dim=4, vocab_size=1, a=1e-3).collect()[0]["embedding"]
    # rare token contributes ±1e6 per dim; common ≈ 4·wq(common) with
    # wq = floor(1e6·(.001/(.001+4/5))+.5) = 1248 → |component| is
    # dominated by the rare token's 1e6
    assert max(abs(v) for v in out) >= 1_000_000 - 4 * 1249


def test_sif_embed_join_impl_matches_rowfold(spark):
    """The broadcast-join projection (the large-vocab 100 TB path) must
    be bit-identical to the plan-literal row fold — same order-free
    BIGINT component sums, including repeated tokens, tail tokens,
    empty text (zero vector) and NULL text (NULL vector)."""
    df = spark.createDataFrame(
        [
            (1, "the the cat sat on the mat", "en"),
            (2, "a b c d e f g h", "en"),
            (3, "", "en"),
            (4, None, "en"),
            (5, "the the the", "en"),
        ],
        DOCS,
    )
    for normalize in (False, True):
        fold = {
            r["doc_id"]: r["embedding"]
            for r in sif_embed(
                df, dim=12, vocab_size=3, a=0.05, impl="rowfold", normalize=normalize
            ).collect()
        }
        join = {
            r["doc_id"]: r["embedding"]
            for r in sif_embed(
                df, dim=12, vocab_size=3, a=0.05, impl="join", normalize=normalize
            ).collect()
        }
        assert fold == join
    assert fold[4] is None
    assert fold[3] == [0.0] * 12


def test_sif_embed_auto_picks_join_for_large_vocab(spark):
    """vocab_size > 128 must route away from the O(V)-per-token literal
    map (auto → join works; an explicit large rowfold is refused)."""
    df = spark.createDataFrame([(1, "x y z", "en")], DOCS)
    assert sif_embed(df, dim=4, vocab_size=300).count() == 1  # auto → join
    with pytest.raises(ValueError, match="rowfold"):
        sif_embed(df, dim=4, vocab_size=300, impl="rowfold")


def test_sif_embed_rejects_bad_params(spark):
    df = spark.createDataFrame([(1, "x", "en")], DOCS)
    with pytest.raises(ValueError, match="dim"):
        sif_embed(df, dim=0)
    with pytest.raises(ValueError, match="vocab_size"):
        sif_embed(df, vocab_size=10_000)
    with pytest.raises(ValueError, match="a must"):
        sif_embed(df, a=0.0)


def test_sif_embed_normalized_is_unit_length(spark):
    df = spark.createDataFrame([(1, "a b c d e f", "en")], DOCS)
    v = sif_embed(df, dim=16, normalize=True).collect()[0]["embedding"]
    assert sum(x * x for x in v) == pytest.approx(1.0, abs=1e-9)


# ---------------------------------------------------------------------------
# ngram_hotspots
# ---------------------------------------------------------------------------


def test_hotspots_counts_documents_not_occurrences(spark):
    """A gram repeated WITHIN one doc counts once; ranking is by the
    number of documents containing it."""
    boiler = "all rights reserved by the original author"  # 7 tokens
    df = spark.createDataFrame(
        [
            (1, f"{boiler} intro {boiler}", "en"),  # twice in one doc
            (2, f"preface {boiler}", "en"),
            (3, f"{boiler} epilogue", "en"),
            (4, "completely unrelated text with many different words", "en"),
        ],
        DOCS,
    )
    out = ngram_hotspots(df, n=7, min_df=2, top=10).collect()
    by_gram = {r["gram"]: r for r in out}
    assert by_gram[boiler]["n_docs"] == 3
    assert by_gram[boiler]["first_doc"] == 1
    assert out[0]["gram"] == boiler and out[0]["rank"] == 1


def test_hotspots_short_docs_contribute_nothing(spark):
    """Documents shorter than n tokens must NOT emit truncated grams
    that alias with real n-grams."""
    df = spark.createDataFrame(
        [(1, "a b c", "en"), (2, "a b c", "en"), (3, "a b c d", "en")], DOCS
    )
    assert ngram_hotspots(df, n=4, min_df=2, top=5).count() == 0
    out = ngram_hotspots(df, n=3, min_df=2, top=5).collect()
    assert [(r["gram"], r["n_docs"]) for r in out] == [("a b c", 3)]


def test_hotspots_rejects_bad_params(spark):
    df = spark.createDataFrame([(1, "x y", "en")], DOCS)
    for kw in ({"n": 1}, {"min_df": 1}, {"top": 0}):
        with pytest.raises(ValueError):
            ngram_hotspots(df, **kw)


# ---------------------------------------------------------------------------
# char_entropy
# ---------------------------------------------------------------------------


def test_char_entropy_hand_computed_values(spark):
    """Exact micro-nat values from the documented quantized formula."""
    df = spark.createDataFrame(
        [(1, "aaaa", "en"), (2, "abcd", "en"), (3, "aabb", "en")], DOCS
    )
    out = {r["doc_id"]: r for r in char_entropy(df).collect()}
    # 'aaaa': H = ln(4) - 4·lnq(4)/(1e7·4) with lnq = floor(ln(4)·1e7+.5)
    lnq4 = math.floor(math.log(4.0) * 1e7 + 0.5)
    h_aaaa = math.floor((math.log(4.0) - 4 * lnq4 / (1e7 * 4)) * 1e6 + 0.5)
    assert out[1]["entropy_q"] == h_aaaa == 0
    # 'abcd': uniform over 4 → exactly ln(4) (lnq(1)=0)
    assert out[2]["entropy_q"] == math.floor(math.log(4.0) * 1e6 + 0.5)
    assert out[2]["n_char_classes"] == 4
    # 'aabb': ln(4) − 2·2·lnq(2)/(1e7·4) = ln(2) up to quantization
    lnq2 = math.floor(math.log(2.0) * 1e7 + 0.5)
    assert out[3]["entropy_q"] == math.floor(
        (math.log(4.0) - 4 * lnq2 / (1e7 * 4)) * 1e6 + 0.5
    )


def test_char_entropy_null_and_empty(spark):
    df = spark.createDataFrame([(1, None, "en"), (2, "   ", "en")], DOCS)
    out = {r["doc_id"]: r for r in char_entropy(df).collect()}
    assert out[1]["entropy_q"] is None and out[1]["keep"] is False
    # whitespace-only normalizes to empty: len 0, 0 classes, entropy 0
    assert (
        out[2]["doc_len"],
        out[2]["n_char_classes"],
        out[2]["entropy_q"],
        out[2]["keep"],
    ) == (0, 0, 0, False)


def test_char_entropy_gate_separates_spam_from_text(spark):
    df = spark.createDataFrame(
        [
            (1, "z" * 200, "en"),  # repeated-char spam: H ≈ 0
            (2, "the quick brown fox jumps over the lazy dog", "en"),
        ],
        DOCS,
    )
    out = {r["doc_id"]: r["keep"] for r in char_entropy(df).collect()}
    assert out == {1: False, 2: True}


# ---------------------------------------------------------------------------
# streaming twins
# ---------------------------------------------------------------------------


def test_stream_twins_match_batch(spark, tmp_path):
    """stream_temperature_gate (persisted-plan artifact pattern) and
    stream_char_entropy_gate (stateless per-row algebra) must emit
    exactly the batch operators' rows over a real micro-batch plan."""
    from rheoceros_spark.streaming.stream import (
        stream_char_entropy_gate,
        stream_temperature_gate,
    )

    df = _skewed_corpus(spark, n_a=60, n_b=12, n_c=3)
    src = str(tmp_path / "mix_src")
    df.coalesce(3).write.mode("overwrite").parquet(src)

    plan = temperature_mix_plan(
        df, group_col="lang", alpha=0.25, target_frac=0.5
    ).localCheckpoint()
    batch_kept = {
        r["doc_id"]
        for r in temperature_mix(
            df, group_col="lang", alpha=0.25, target_frac=0.5, plan=plan
        ).collect()
    }
    assert batch_kept, "batch sampler kept nothing — test is vacuous"
    batch_entropy = {
        (r["doc_id"], r["entropy_q"], r["keep"]) for r in char_entropy(df).collect()
    }

    sdf = spark.readStream.schema(df.schema).parquet(src)
    out_mix, out_ent = [], []
    q1 = (
        stream_temperature_gate(sdf, plan, group_col="lang")
        .writeStream.foreachBatch(lambda b, i: out_mix.extend(b.collect()))
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt_mix"))
        .start()
    )
    q1.awaitTermination(120)
    q2 = (
        stream_char_entropy_gate(sdf)
        .writeStream.foreachBatch(lambda b, i: out_ent.extend(b.collect()))
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt_ent"))
        .start()
    )
    q2.awaitTermination(120)
    assert {r["doc_id"] for r in out_mix} == batch_kept
    assert {(r["doc_id"], r["entropy_q"], r["keep"]) for r in out_ent} == batch_entropy


# ---------------------------------------------------------------------------
# winnowing fingerprints (Schleimer et al. 2003)
# ---------------------------------------------------------------------------


def test_winnow_guarantee_shared_run_shares_fingerprint(spark):
    """The paper's detection guarantee: documents sharing a run of at
    least w + n − 1 words (here 4 + 3 − 1 = 6) must share at least one
    selected fingerprint — regardless of the surrounding text."""
    from rheoceros_spark.operators.dedup import winnow_fingerprints

    shared = "alpha beta gamma delta epsilon zeta"  # exactly 6 words
    df = spark.createDataFrame(
        [
            (1, f"completely different lead {shared} and unrelated tail words", "en"),
            (2, f"{shared} with another continuation here entirely", "en"),
            (3, "no overlap with anything else at all whatsoever", "en"),
        ],
        DOCS,
    )
    fps = winnow_fingerprints(df, n=3, w=4)
    by_doc = {}
    for r in fps.collect():
        by_doc.setdefault(r["doc_id"], set()).add(r["fp"])
    assert by_doc[1] & by_doc[2], "6-word shared run must share a fingerprint"
    assert not (by_doc[1] & by_doc[3]) and not (by_doc[2] & by_doc[3])


def test_winnow_density_and_short_docs(spark):
    """Winnowing keeps far fewer fingerprints than grams (~2/(w+1));
    docs shorter than w grams keep exactly their global minimum; docs
    shorter than n words emit nothing."""
    from rheoceros_spark.operators.dedup import winnow_fingerprints

    long_text = " ".join(f"tok{i}" for i in range(200))
    df = spark.createDataFrame(
        [(1, long_text, "en"), (2, "just four words here", "en"), (3, "two words", "en")],
        DOCS,
    )
    counts = {
        r["doc_id"]: r["cnt"]
        for r in winnow_fingerprints(df, n=3, w=8)
        .groupBy("doc_id").agg(F.count("*").alias("cnt")).collect()
    }
    n_grams = 198  # 200 - 3 + 1
    assert counts[1] <= n_grams * 2 / (8 + 1) * 2  # generous 2x slack
    assert counts[1] >= n_grams / (8 + 1) / 2
    assert counts[2] == 1  # 2 grams < w=8 → single global min
    assert 3 not in counts  # 2 words < n=3 → nothing


def test_winnow_pairs_stop_fingerprint_cap(spark):
    """A fingerprint present in more than max_bucket documents must be
    dropped BEFORE the pair join (the bucket-bounding rule) — with the
    cap below the boilerplate's document count, no pairs survive."""
    from rheoceros_spark.operators.dedup import winnow_pairs

    boiler = " ".join(f"legal word{i} boiler plate line" for i in range(4))
    df = spark.createDataFrame([(i, boiler, "en") for i in range(8)], DOCS)
    full = winnow_pairs(df, n=3, w=4, min_shared=1, max_bucket=50).count()
    capped = winnow_pairs(df, n=3, w=4, min_shared=1, max_bucket=7).count()
    assert full == 8 * 7 // 2  # identical docs: every pair found
    assert capped == 0  # every fingerprint sits in 8 > 7 docs → dropped


def test_winnow_rejects_bad_params(spark):
    from rheoceros_spark.operators.dedup import winnow_fingerprints, winnow_pairs

    df = spark.createDataFrame([(1, "a b c", "en")], DOCS)
    with pytest.raises(ValueError):
        winnow_fingerprints(df, n=0)
    with pytest.raises(ValueError):
        winnow_fingerprints(df, w=1)
    with pytest.raises(ValueError):
        winnow_pairs(df, max_bucket=1)


# ---------------------------------------------------------------------------
# incremental winnow index + epoch plan
# ---------------------------------------------------------------------------


def test_winnow_index_probe_and_append_equals_rebuild(spark, tmp_path):
    """Build the index over an initial corpus, probe a batch containing
    one near-dup and one novel doc; append the accepted doc and verify
    the grown index equals a from-scratch rebuild over the union (the
    incremental≡rebuilt equality discipline of the minhash/URL
    indexes)."""
    from rheoceros_spark.operators.dedup import (
        dedup_winnow_against_index,
        winnow_index_write,
    )

    boiler = "alpha beta gamma delta epsilon zeta eta theta"
    corpus = spark.createDataFrame(
        [(1, f"lead text {boiler} trailing words", "en"),
         (2, "entirely unrelated document body here now", "en")],
        DOCS,
    )
    path = str(tmp_path / "widx")
    idx = winnow_index_write(corpus, path, n=3, w=4)
    batch = spark.createDataFrame(
        [(10, f"other framing {boiler} different tail", "en"),
         (11, "totally novel content nothing shared anywhere", "en")],
        DOCS,
    )
    hits = dedup_winnow_against_index(batch, idx, n=3, w=4, min_shared=1)
    got = {(r["new_id"], r["dup_of"]) for r in hits.collect()}
    assert (10, 1) in got
    assert all(nid != 11 for nid, _ in got)
    # accept the novel doc, append, compare against a full rebuild
    accepted = batch.where(F.col("doc_id") == 11)
    winnow_index_write(accepted, path, n=3, w=4, mode="append")
    grown = {
        (r["doc_id"], r["fp"])
        for r in spark.read.parquet(path).select("doc_id", "fp").collect()
    }
    rebuilt = {
        (r["doc_id"], r["fp"])
        for r in winnow_index_write(corpus.union(accepted), None, n=3, w=4)
        .select("doc_id", "fp")
        .collect()
    }
    assert grown == rebuilt


def test_winnow_index_param_mismatch_is_loud(spark, tmp_path):
    from rheoceros_spark.operators.dedup import (
        dedup_winnow_against_index,
        winnow_index_write,
    )

    df = spark.createDataFrame([(1, "a b c d e f g h", "en")], DOCS)
    idx = winnow_index_write(df, str(tmp_path / "widx2"), n=3, w=4)
    with pytest.raises(ValueError, match=r"\(n, w\)"):
        dedup_winnow_against_index(df, idx, n=3, w=8)


def test_epoch_plan_hand_computed(spark):
    """Exact targets/epochs from the documented formula on a skewed
    two-group corpus, with the cap firing on the small group."""
    from rheoceros_spark.operators.curation import epoch_plan

    rows = [(i, "x", "big") for i in range(90)] + [(i + 100, "x", "small") for i in range(10)]
    df = spark.createDataFrame(rows, DOCS).selectExpr(
        "lang AS source", "10 AS n_tokens"
    )
    out = {
        r["source"]: r
        for r in epoch_plan(
            df, budget_tokens=1_000, group_col="source", alpha=0.5,
            max_epochs_q=3_000_000,
        ).collect()
    }
    big, small = out["big"], out["small"]
    assert (big["n_tokens"], small["n_tokens"]) == (900, 100)
    wq_b = math.floor(math.sqrt(900 / 1000) * 1e12 + 0.5)
    wq_s = math.floor(math.sqrt(100 / 1000) * 1e12 + 0.5)
    tgt_s = math.floor(1000.0 * (wq_s / (wq_b + wq_s)))
    assert small["target_tokens"] == tgt_s
    eq_s = math.floor(tgt_s * 1e6 / 100)
    # small group: 250 target tokens over 100 tokens ≈ 2.5 epochs < cap
    assert small["epochs_q"] == eq_s and not small["capped"]
    assert small["drawn_tokens"] == tgt_s
    # with a 2-epoch cap the small group caps and draws exactly 2 passes
    out2 = {
        r["source"]: r
        for r in epoch_plan(
            df, budget_tokens=1_000, group_col="source", alpha=0.5,
            max_epochs_q=2_000_000,
        ).collect()
    }
    assert out2["small"]["capped"] and out2["small"]["epochs_q"] == 2_000_000
    assert out2["small"]["drawn_tokens"] == 200
    assert not out2["big"]["capped"]


def test_epoch_plan_rejects_bad_params(spark):
    from rheoceros_spark.operators.curation import epoch_plan

    df = spark.createDataFrame([(1, "x", "en")], DOCS).selectExpr(
        "lang AS source", "5 AS n_tokens"
    )
    with pytest.raises(ValueError, match="1/16"):
        epoch_plan(df, 100, alpha=0.3)
    with pytest.raises(ValueError, match="budget"):
        epoch_plan(df, 0)
    with pytest.raises(ValueError, match="max_epochs_q"):
        epoch_plan(df, 100, max_epochs_q=0)


def test_winnow_match_spans_hand_positions(spark):
    """A crafted pair with one known shared 7-word run: exact start
    positions (0-based word-gram offsets), gram count, word count."""
    from rheoceros_spark.operators.dedup import winnow_match_spans

    shared = "one two three four five six seven"  # 7 words → 5 3-grams
    df = spark.createDataFrame(
        [
            (1, f"intro words here {shared} tail", "en"),      # run starts at gram 3
            (2, f"{shared} completely different ending", "en"),  # starts at gram 0
        ],
        DOCS,
    )
    pairs = spark.createDataFrame([(1, 2)], "doc_a bigint, doc_b bigint")
    out = winnow_match_spans(df, pairs, n=3, min_run=2).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["start_a"], r["start_b"], r["n_grams"], r["n_words"]) == (3, 0, 5, 7)


def test_winnow_match_spans_two_runs_and_min_run(spark):
    """Two disjoint shared runs report separately; a single-gram match
    is dropped by min_run=2 but kept at min_run=1."""
    from rheoceros_spark.operators.dedup import winnow_match_spans

    run1 = "alpha beta gamma delta"        # 4 words → 2 grams
    run2 = "epsilon zeta eta theta iota"   # 5 words → 3 grams
    single = "kappa lamda mu"              # 3 words → 1 gram
    df = spark.createDataFrame(
        [
            (1, f"{run1} xx yy zz {run2} ppp qqq {single}", "en"),
            (2, f"{run2} aa bb cc {run1} rrr sss {single} ttt", "en"),
        ],
        DOCS,
    )
    pairs = spark.createDataFrame([(1, 2)], "doc_a bigint, doc_b bigint")
    got = {
        (r["n_grams"], r["n_words"])
        for r in winnow_match_spans(df, pairs, n=3, min_run=2).collect()
    }
    assert got == {(2, 4), (3, 5)}
    all_runs = winnow_match_spans(df, pairs, n=3, min_run=1).collect()
    assert {(r["n_grams"]) for r in all_runs} == {1, 2, 3}


def test_winnow_match_spans_string_ids(spark):
    """Doc ids keep their native type through the alignment joins: the
    r11 form cast pairs' ids to bigint, so STRING ids (used by other
    dedup-family operators) became NULL and the result was silently
    empty instead of the span report."""
    from rheoceros_spark.operators.dedup import winnow_match_spans

    shared = "one two three four five six seven"
    df = spark.createDataFrame(
        [
            ("doc-a", f"intro words here {shared} tail", "en"),
            ("doc-b", f"{shared} completely different ending", "en"),
        ],
        "doc_id string, text string, lang string",
    )
    pairs = spark.createDataFrame(
        [("doc-a", "doc-b")], "doc_a string, doc_b string"
    )
    out = winnow_match_spans(df, pairs, n=3, min_run=2).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["doc_a"], r["doc_b"]) == ("doc-a", "doc-b")
    assert (r["start_a"], r["start_b"], r["n_grams"], r["n_words"]) == (3, 0, 5, 7)


def test_winnow_index_mixed_params_append_is_loud(spark, tmp_path):
    """An index accidentally APPENDED with different (n, w) than it was
    built with must fail the probe guard — the pre-r12 limit(1) check
    read one arbitrary file and could silently under-match."""
    from rheoceros_spark.operators.dedup import (
        dedup_winnow_against_index,
        winnow_index_write,
    )

    df = spark.createDataFrame([(1, "a b c d e f g h", "en")], DOCS)
    path = str(tmp_path / "widx_mixed")
    winnow_index_write(df, path, n=3, w=4)
    idx = winnow_index_write(df, path, n=3, w=8, mode="append")
    with pytest.raises(ValueError, match="MIXED"):
        dedup_winnow_against_index(df, idx, n=3, w=4)


def test_minhash_index_mixed_params_append_is_loud(spark, tmp_path):
    """Same discipline for the MinHash index guard."""
    from rheoceros_spark.operators.dedup import (
        build_minhash_index,
        dedup_against_index,
    )

    df = spark.createDataFrame(
        [(1, "a b c d e f g h i j k l", "en")], DOCS
    )
    path = str(tmp_path / "midx_mixed")
    build_minhash_index(df, path, num_hashes=16, bands=4)
    idx = build_minhash_index(df, path, num_hashes=8, bands=2, mode="append")
    with pytest.raises(ValueError, match="MIXED"):
        dedup_against_index(df, idx, num_hashes=16, bands=4)


def test_temperature_mix_plan_stamp_validation(spark):
    """A precomputed plan carries (alpha_k16, target_frac_q) stamps;
    explicitly mismatched parameters raise, omitted parameters accept
    the plan as the artifact of record (the streaming-gate calling
    convention)."""
    from rheoceros_spark.operators.curation import (
        temperature_mix,
        temperature_mix_plan,
    )

    df = _skewed_corpus(spark)
    plan = temperature_mix_plan(df, group_col="lang", alpha=0.3125, target_frac=0.5)
    # matching explicit params and omitted params both pass
    n_match = temperature_mix(
        df, group_col="lang", alpha=0.3125, target_frac=0.5, plan=plan
    ).count()
    n_trust = temperature_mix(df, group_col="lang", plan=plan).count()
    assert n_match == n_trust > 0
    with pytest.raises(ValueError, match="alpha"):
        temperature_mix(df, group_col="lang", alpha=0.5, plan=plan)
    with pytest.raises(ValueError, match="target_frac"):
        temperature_mix(df, group_col="lang", target_frac=0.25, plan=plan)
    mixed = plan.union(
        temperature_mix_plan(df, group_col="lang", alpha=0.5, target_frac=0.5)
    )
    # A mixed-stamp plan is rejected on EVERY path — including the
    # trust-the-plan convention (r14: the union is a new frame, so
    # by-construction trust does not carry over and the one-time
    # mixed-stamp check fires exactly where the caller cannot notice).
    with pytest.raises(ValueError, match="MIXED"):
        temperature_mix(df, group_col="lang", plan=mixed)
    with pytest.raises(ValueError, match="MIXED"):
        temperature_mix(df, group_col="lang", alpha=0.3125, plan=mixed)
    with pytest.raises(ValueError, match="MIXED"):
        temperature_mix(df, group_col="lang", target_frac=0.5, plan=mixed)


def test_temperature_mix_trust_tiers(spark):
    """The trusted-plan registry: in-process plans and
    trust_mix_plan-asserted derivatives skip the validation job; an
    unknown single-stamp plan validates ONCE and is then memoized; a
    checkpoint-derived frame is NOT trusted automatically."""
    from rheoceros_spark.operators.curation import (
        _TRUSTED_MIX_PLANS,
        temperature_mix,
        temperature_mix_plan,
        trust_mix_plan,
    )

    df = _skewed_corpus(spark)
    plan = temperature_mix_plan(df, group_col="lang", alpha=0.3125, target_frac=0.5)
    # by-construction trust on the frame the builder returned
    assert plan in _TRUSTED_MIX_PLANS
    # a derived frame (new object) is not trusted until asserted
    ckpt = plan.localCheckpoint(eager=False)
    assert ckpt not in _TRUSTED_MIX_PLANS
    assert trust_mix_plan(ckpt) is ckpt
    assert ckpt in _TRUSTED_MIX_PLANS
    # an unknown single-stamp plan (simulate storage round-trip by
    # re-selecting) validates once under the trust convention, then
    # lands in the registry so repeat calls skip the collect
    unknown = plan.select(*plan.columns)
    assert unknown not in _TRUSTED_MIX_PLANS
    n = temperature_mix(df, group_col="lang", plan=unknown).count()
    assert n > 0
    assert unknown in _TRUSTED_MIX_PLANS
