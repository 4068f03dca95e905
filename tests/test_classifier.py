"""Learned quality filter: distributed LR trainer semantics +
engine-determinism properties."""

import pytest
from pyspark.sql import functions as F

from rheoceros_spark.operators.text_analysis import (
    hashed_token_features,
    logreg_train,
    quality_classifier_score,
    sigmoid_lut_q,
)


def _toy(spark, n=40):
    rows = []
    for i in range(n):
        if i % 2 == 0:
            rows.append((i, "clean prose with goodword and structure here", 1))
        else:
            rows.append((i, "spam spam badword badword zzz qqq", 0))
    return spark.createDataFrame(rows, "doc_id bigint, text string, y int")


def test_training_separates_separable_classes(spark):
    df = _toy(spark)
    w = logreg_train(df, "y", n_buckets=32, iters=3, lr=1.0)
    scored = {r.doc_id: r for r in quality_classifier_score(df, w, n_buckets=32).collect()}
    pos = [scored[i].logit for i in range(0, 40, 2)]
    neg = [scored[i].logit for i in range(1, 40, 2)]
    assert min(pos) > max(neg), (min(pos), max(neg))
    assert all(scored[i].keep == 1 for i in range(0, 40, 2))
    assert all(scored[i].keep == 0 for i in range(1, 40, 2))


def test_weights_partition_invariant(spark):
    """The bit-exactness contract: integer logit/gradient sums commute,
    so training is independent of physical partitioning."""
    df = _toy(spark)
    w1 = {r.bucket: r.wq for r in logreg_train(df, "y", n_buckets=16, iters=2).collect()}
    w2 = {
        r.bucket: r.wq
        for r in logreg_train(df.repartition(7), "y", n_buckets=16, iters=2).collect()
    }
    assert w1 == w2 and any(v != 0 for v in w1.values())


def test_zero_iters_gives_zero_weights_and_neutral_scores(spark):
    df = _toy(spark, 6)
    w = logreg_train(df, "y", n_buckets=8, iters=0)
    assert all(r.wq == 0 for r in w.collect())
    scored = quality_classifier_score(df, w, n_buckets=8).collect()
    assert all(r.logit == 0.0 and r.keep == 1 for r in scored)


def test_bias_carries_empty_and_null_text(spark):
    df = spark.createDataFrame(
        [(1, None, 1), (2, "", 0), (3, "words here", 1)],
        "doc_id bigint, text string, y int",
    )
    feats = hashed_token_features(df, n_buckets=8)
    by_doc = {}
    for r in feats.collect():
        by_doc.setdefault(r.doc_id, []).append((r.bucket, r.cnt))
    # every doc carries the bias feature; token-free docs carry ONLY it
    assert by_doc[1] == [(-1, 1)] and by_doc[2] == [(-1, 1)]
    assert len(by_doc[3]) > 1
    # trainer + scorer handle them end-to-end
    w = logreg_train(df, "y", n_buckets=8, iters=1)
    assert quality_classifier_score(df, w, n_buckets=8).count() == 3


def test_validation(spark):
    df = _toy(spark, 4)
    with pytest.raises(ValueError, match="iters"):
        logreg_train(df, "y", iters=-1)
    with pytest.raises(ValueError, match="empty"):
        logreg_train(df.where(F.col("doc_id") < 0), "y")


def test_sigmoid_lut_shape():
    lut = sigmoid_lut_q()
    assert len(lut) == 1601
    assert lut[800] == 5_000_000          # sigma(0) = 0.5
    assert lut[0] + lut[-1] == 10_000_000  # symmetry on the grid
    assert all(a <= b for a, b in zip(lut, lut[1:]))  # monotone


# ---------------------------------------------------------------------------
# pr_curve threshold sweep
# ---------------------------------------------------------------------------

def _scored(spark, rows):
    return spark.createDataFrame(rows, "logit double, y int")


def test_pr_curve_hand_computed(spark):
    from rheoceros_spark.operators.text_analysis import pr_curve

    rows = [(0.95, 1), (0.85, 1), (0.75, 0), (0.55, 1), (0.45, 0)]
    out = {
        round(r.thr, 2): r
        for r in pr_curve(_scored(spark, rows), score_col="logit",
                          label_col="y", grid=10).collect()
    }
    assert set(out) == {0.9, 0.8, 0.7, 0.5, 0.4}
    r = out[0.9]
    assert (r.tp, r.fp, r.fn) == (1, 0, 2)
    assert (r.precision_q, r.recall_q, r.f1_q) == (1_000_000, 333_333, 499_999)
    r = out[0.8]
    assert (r.tp, r.fp, r.fn) == (2, 0, 1)
    assert (r.precision_q, r.recall_q, r.f1_q) == (1_000_000, 666_666, 799_999)
    r = out[0.7]
    assert (r.precision_q, r.recall_q, r.f1_q) == (666_666, 666_666, 666_666)
    r = out[0.5]
    assert (r.tp, r.fp) == (3, 1)
    assert (r.precision_q, r.recall_q, r.f1_q) == (750_000, 1_000_000, 857_142)
    r = out[0.4]
    assert (r.precision_q, r.recall_q, r.f1_q) == (600_000, 1_000_000, 750_000)


def test_pr_curve_monotone_recall_and_total_columns(spark):
    from rheoceros_spark.operators.text_analysis import pr_curve

    rows = [(float(i) / 10.0, i % 2) for i in range(20)]
    got = sorted(
        pr_curve(_scored(spark, rows), grid=10).collect(), key=lambda r: -r.thr
    )
    recalls = [r.recall_q for r in got]
    assert recalls == sorted(recalls), "recall must rise as thr falls"
    assert all(r.f1_q is not None and r.recall_q is not None for r in got)


def test_pr_curve_drops_null_score_and_label_rows(spark):
    from rheoceros_spark.operators.text_analysis import pr_curve

    clean = [(0.95, 1), (0.85, 1), (0.75, 0), (0.55, 1), (0.45, 0)]
    dirty = clean + [(None, 1), (None, 0), (0.65, None)]
    df = spark.createDataFrame(dirty, "logit double, y int")
    got = sorted(
        tuple(r) for r in pr_curve(df, score_col="logit", label_col="y",
                                   grid=10).collect()
    )
    want = sorted(
        tuple(r)
        for r in pr_curve(_scored(spark, clean), score_col="logit",
                          label_col="y", grid=10).collect()
    )
    # NULL label must not count as a negative; NULL score must not form
    # an unreachable bucket that inflates the recall denominator
    assert got == want


def test_pr_curve_no_positives_yields_zero_not_null(spark):
    from rheoceros_spark.operators.text_analysis import pr_curve

    rows = [(0.9, 0), (0.1, 0)]
    for r in pr_curve(_scored(spark, rows), grid=10).collect():
        assert r.recall_q == 0 and r.f1_q == 0 and r.tp == 0


def test_pr_curve_validates_grid(spark):
    from rheoceros_spark.operators.text_analysis import pr_curve

    with pytest.raises(ValueError, match="grid"):
        pr_curve(_scored(spark, [(0.5, 1)]), grid=0)


# ---------------------------------------------------------------------------
# multiclass softmax language classifier
# ---------------------------------------------------------------------------

def _lang_corpus(spark):
    import random

    vocab = {
        "en": "the of and to in is was for with that".split(),
        "de": "der die und das ist nicht ein mit von zu".split(),
        "fr": "le la et les des une dans pour est que".split(),
    }
    rng = random.Random(7)
    rows = []
    i = 0
    for lang, words in vocab.items():
        for _ in range(40):
            rows.append((i, " ".join(rng.choice(words) for _ in range(20)), lang))
            i += 1
    return spark.createDataFrame(rows, "doc_id long, text string, lang string")


def test_lang_classifier_learns_separable_vocabularies(spark):
    from rheoceros_spark.operators.text_analysis import (
        lang_classifier_score,
        lang_classifier_train,
    )
    from pyspark.sql import functions as F

    df = _lang_corpus(spark)
    w = lang_classifier_train(df, "lang", n_buckets=64, iters=2, lr=0.5)
    assert w.count() == 3 * 65  # K classes x (n_buckets + bias)
    pred = lang_classifier_score(df, w).join(df.select("doc_id", "lang"), "doc_id")
    acc = pred.select(
        F.avg((F.col("pred_lang") == F.col("lang")).cast("double")).alias("a")
    ).collect()[0].a
    assert acc == 1.0


def test_lang_classifier_untrained_ties_break_to_min_class(spark):
    # zero iterations -> all weights 0 -> every class logit equal ->
    # the min(struct(-logit, class)) fold must pick the
    # lexicographically smallest class deterministically
    from rheoceros_spark.operators.text_analysis import (
        lang_classifier_score,
        lang_classifier_train,
    )

    df = _lang_corpus(spark)
    w = lang_classifier_train(df, "lang", iters=0)
    preds = {r.doc_id: r.pred_lang for r in lang_classifier_score(df, w).collect()}
    assert set(preds.values()) == {"de"}


def test_lang_classifier_score_is_deterministic(spark):
    from rheoceros_spark.operators.text_analysis import (
        lang_classifier_score,
        lang_classifier_train,
    )

    df = _lang_corpus(spark)
    w = lang_classifier_train(df, "lang", iters=2, lr=0.5)
    a = sorted(tuple(r) for r in lang_classifier_score(df, w).collect())
    b = sorted(tuple(r) for r in lang_classifier_score(df.repartition(7), w).collect())
    assert a == b


def test_normalized_features_bounded_and_biased(spark):
    from pyspark.sql import functions as F
    from rheoceros_spark.operators.text_analysis import (
        FEAT_NORM_SCALE,
        hashed_token_features_norm,
    )

    df = spark.createDataFrame(
        [(1, "a a a b"), (2, None), (3, "")], "doc_id long, text string"
    )
    rows = hashed_token_features_norm(df, n_buckets=8).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    # every doc keeps its bias row, even NULL/empty text
    for d in (1, 2, 3):
        assert any(r.bucket == -1 and r.cnt_q == FEAT_NORM_SCALE for r in by_doc[d])
    # token features L1-sum to <= 1e4 (floor division slack only)
    tok_sum = sum(r.cnt_q for r in by_doc[1] if r.bucket >= 0)
    assert FEAT_NORM_SCALE - 8 <= tok_sum <= FEAT_NORM_SCALE
    # NULL/empty docs carry only the bias
    assert len(by_doc[2]) == 1 and len(by_doc[3]) == 1


def test_lang_classifier_validates_inputs(spark):
    from rheoceros_spark.operators.text_analysis import lang_classifier_train

    df = _lang_corpus(spark)
    with pytest.raises(ValueError, match="iters"):
        lang_classifier_train(df, "lang", iters=-1)
    with pytest.raises(ValueError, match="empty class set"):
        lang_classifier_train(df, "lang", classes=[])
    with pytest.raises(ValueError, match="empty training frame"):
        lang_classifier_train(df.where("doc_id < 0"), "lang", classes=["en"])


# ---------------------------------------------------------------------------
# bounded (sampled) training — the CCNet train-on-sample/score-the-crawl split
# ---------------------------------------------------------------------------

def test_sampled_training_is_exactly_training_on_the_hash_sample(spark):
    # train_frac must be the SAME deterministic gate as curation.hash_sample:
    # training with the parameter and training on the pre-sampled frame
    # must yield bit-identical weight tables (and therefore identical
    # scoring everywhere)
    from rheoceros_spark.operators.curation import hash_sample
    from rheoceros_spark.operators.text_analysis import lang_classifier_train

    df = _lang_corpus(spark)
    w_param = lang_classifier_train(
        df, "lang", iters=2, lr=0.5, train_frac=0.5, sample_seed=3
    )
    w_pre = lang_classifier_train(
        hash_sample(df, 0.5, key_col="doc_id", seed=3), "lang", iters=2, lr=0.5
    )
    assert sorted(map(tuple, w_param.collect())) == sorted(
        map(tuple, w_pre.collect())
    )


def test_sampled_training_scores_full_corpus_like_full_training(spark):
    # on a separable corpus a 50% training slice must reach the same
    # corpus-wide predictions as full-corpus training (accuracy 1.0
    # both ways) — the scoring pass stays corpus-wide by construction.
    # 200 docs/class, NOT the 40/class _lang_corpus: at a few dozen
    # docs the hash sample's class-count jitter (±10%) feeds the bias
    # feature (cnt_q = 1e4, as strong as all content features
    # combined) a prior signal that two GD steps cannot out-train —
    # a small-sample artifact that vanishes as the absolute sample
    # grows, exactly the regime sampled training is for
    import random

    from rheoceros_spark.operators.text_analysis import (
        lang_classifier_score,
        lang_classifier_train,
    )

    vocab = {
        "en": "the of and to in is was for with that".split(),
        "de": "der die und das ist nicht ein mit von zu".split(),
        "fr": "le la et les des une dans pour est que".split(),
    }
    rng = random.Random(7)
    rows = []
    i = 0
    for lang, words in vocab.items():
        for _ in range(200):
            rows.append((i, " ".join(rng.choice(words) for _ in range(20)), lang))
            i += 1
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    w_full = lang_classifier_train(df, "lang", iters=2, lr=0.5)
    w_samp = lang_classifier_train(df, "lang", iters=2, lr=0.5, train_frac=0.5)
    full = {r.doc_id: r.pred_lang for r in lang_classifier_score(df, w_full).collect()}
    samp = {r.doc_id: r.pred_lang for r in lang_classifier_score(df, w_samp).collect()}
    assert set(full) == set(samp) == set(range(600))  # corpus-wide scoring
    assert full == samp
    truth = {r[0]: r[2] for r in rows}
    assert samp == truth  # accuracy 1.0 from the sampled trainer too


def test_sampled_logreg_train_matches_presampled_frame(spark):
    from pyspark.sql import functions as F
    from rheoceros_spark.operators.curation import hash_sample
    from rheoceros_spark.operators.text_analysis import logreg_train

    df = _lang_corpus(spark).withColumn(
        "y", (F.col("lang") == "en").cast("int")
    )
    w_param = logreg_train(df, "y", iters=2, train_frac=0.4, sample_seed=1)
    w_pre = logreg_train(hash_sample(df, 0.4, key_col="doc_id", seed=1), "y", iters=2)
    assert sorted(map(tuple, w_param.collect())) == sorted(
        map(tuple, w_pre.collect())
    )


def test_train_frac_validation(spark):
    from rheoceros_spark.operators.text_analysis import (
        lang_classifier_train,
        logreg_train,
    )

    df = _lang_corpus(spark)
    for bad in (0.0, -0.1, 1.5):
        with pytest.raises(ValueError, match="train_frac"):
            lang_classifier_train(df, "lang", train_frac=bad)
        with pytest.raises(ValueError, match="train_frac"):
            logreg_train(df, "lang", train_frac=bad)
    # below the gate's 1e-6 bucket resolution the threshold rounds to
    # 0 (empty training set) — rejected loudly, not silently emptied
    with pytest.raises(ValueError, match="resolution"):
        lang_classifier_train(df, "lang", train_frac=4e-7)


def test_lang_segments_with_trained_classifier(spark):
    from pyspark.sql import functions as F
    from rheoceros_spark.operators.text_analysis import (
        lang_classifier_train,
        lang_segments,
    )

    df = _lang_corpus(spark)
    w = lang_classifier_train(df, "lang", n_buckets=64, iters=2, lr=0.5)
    out = lang_segments(df, span_tokens=10, classifier_weights=w, n_buckets=64)
    rows = {r.doc_id: r for r in out.collect()}
    assert len(rows) == df.count()
    truth = {r.doc_id: r.lang for r in df.collect()}
    # a perfectly-separable corpus: every span classifies to the doc's
    # language, so the document profile is monolingual and correct
    hits = sum(1 for d, r in rows.items() if r.dominant_lang == truth[d])
    assert hits == len(rows)
    assert all(r.n_langs == 1 and r.multilingual == 0 for r in rows.values())
    # the classifier never emits 'und' — every span identifies
    assert all(r.dominant_spans > 0 for r in rows.values())


def test_lang_classify_rowlocal_matches_batch_bit_for_bit(spark, sf_dir):
    from pyspark.sql import functions as F
    from rheoceros_spark.operators.text_analysis import (
        lang_classifier_score,
        lang_classifier_train,
        lang_classify_rowlocal,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").where(
        F.col("doc_id").isNotNull()
    )
    w = lang_classifier_train(docs, "lang", n_buckets=64, iters=2, lr=2.0)
    a = sorted(tuple(r) for r in lang_classifier_score(docs, w, n_buckets=64).collect())
    b = sorted(tuple(r) for r in lang_classify_rowlocal(docs, w, n_buckets=64).collect())
    assert a == b and a


def test_lang_classify_rowlocal_degenerate_rows_and_passthrough(spark):
    from pyspark.sql import functions as F
    from rheoceros_spark.operators.text_analysis import (
        lang_classifier_score,
        lang_classifier_train,
        lang_classify_rowlocal,
    )

    train = _lang_corpus(spark)
    w = lang_classifier_train(train, "lang", n_buckets=64, iters=2, lr=0.5)
    new = spark.createDataFrame(
        [(1, "der der der", "x"), (2, "", "y"), (3, None, "z"), (4, "zzz qqq", "w")],
        "doc_id long, text string, source string",
    )
    batch = sorted(
        tuple(r) for r in lang_classifier_score(new, w, n_buckets=64).collect()
    )
    rl = sorted(tuple(r) for r in lang_classify_rowlocal(new, w, n_buckets=64).collect())
    assert rl == batch and len(rl) == 4  # empty/NULL text still classify (bias)
    out = lang_classify_rowlocal(new, w, n_buckets=64, passthrough=True)
    assert out.columns == ["doc_id", "text", "source", "pred_lang", "logit_q"]


# ---------------------------------------------------------------------------
# subword (char n-gram) features — the fastText scheme
# ---------------------------------------------------------------------------

def _suffix_corpus(spark):
    """Languages distinguishable ONLY by morphology: every training
    document uses document-unique stems, so a word-hash model sees
    each word exactly once and eval words never at all — only the
    boundary-marked char n-grams of the shared suffixes carry
    transferable signal."""
    suffixes = {"en": ["ness", "tion"], "de": ["ung", "keit"]}
    rows = []
    i = 0
    for lang, sfx in suffixes.items():
        for d in range(30):
            words = [f"st{lang}{d}x{j}{sfx[j % 2]}" for j in range(8)]
            rows.append((i, " ".join(words), lang))
            i += 1
    train = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    # short eval docs with UNSEEN stems + the class suffixes
    ev = []
    j = 0
    for lang, sfx in suffixes.items():
        for d in range(10):
            ev.append((1000 + j, f"qz{d}w{sfx[d % 2]}", lang))
            j += 1
    eval_df = spark.createDataFrame(ev, "doc_id long, text string, lang string")
    return train, eval_df


def test_subword_features_classify_short_unseen_text(spark):
    # word-hash features alone misclassify: every eval word is unseen,
    # so its bucket carries no trained weight beyond hash-collision
    # noise.  Subword 2-4-grams hash the shared suffixes and win.
    from pyspark.sql import functions as F
    from rheoceros_spark.operators.text_analysis import (
        lang_classifier_score,
        lang_classifier_train,
    )

    train, eval_df = _suffix_corpus(spark)
    truth = {r.doc_id: r.lang for r in eval_df.collect()}

    def acc(ngram_range):
        w = lang_classifier_train(
            train, "lang", n_buckets=256, iters=2, lr=0.5,
            ngram_range=ngram_range,
        )
        pred = {
            r.doc_id: r.pred_lang
            for r in lang_classifier_score(
                eval_df, w, n_buckets=256, ngram_range=ngram_range
            ).collect()
        }
        return sum(pred[d] == truth[d] for d in truth) / len(truth)

    assert acc((2, 4)) == 1.0
    assert acc(None) < 1.0  # word features alone cannot generalize


def test_subword_rowlocal_and_stream_match_batch_bit_for_bit(spark, tmp_path):
    from pyspark.sql import functions as F
    from rheoceros_spark.operators.text_analysis import (
        lang_classifier_score,
        lang_classifier_train,
        lang_classify_rowlocal,
    )
    from rheoceros_spark.streaming.stream import stream_lang_classify

    df = _lang_corpus(spark)
    w = lang_classifier_train(
        df, "lang", n_buckets=64, iters=2, lr=0.5, ngram_range=(2, 3)
    )
    batch = sorted(
        tuple(r)
        for r in lang_classifier_score(
            df, w, n_buckets=64, ngram_range=(2, 3)
        ).collect()
    )
    rl = sorted(
        tuple(r)
        for r in lang_classify_rowlocal(
            df, w, n_buckets=64, ngram_range=(2, 3)
        ).collect()
    )
    assert rl == batch and batch

    src = str(tmp_path / "sw_src")
    df.coalesce(2).write.mode("overwrite").parquet(src)
    out = []
    sdf = spark.readStream.schema(df.schema).parquet(src)
    q = (
        stream_lang_classify(sdf, w, n_buckets=64, ngram_range=(2, 3))
        .writeStream.foreachBatch(lambda b, i: out.extend(b.collect()))
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt_sw"))
        .start()
    )
    q.awaitTermination(120)
    assert sorted((r.doc_id, r.pred_lang, r.logit_q) for r in out) == [
        (d, p, l) for d, p, l in batch
    ]


def test_lang_segments_scores_spans_with_subword_weights(spark):
    # the composed entry point must hand ngram_range through to the
    # row-local span scorer — subword weights scored with word
    # features are silent garbage (r10 review finding)
    from rheoceros_spark.operators.text_analysis import (
        lang_classifier_train,
        lang_segments,
    )

    df = _lang_corpus(spark)
    w = lang_classifier_train(
        df, "lang", n_buckets=64, iters=2, lr=0.5, ngram_range=(2, 3)
    )
    out = lang_segments(
        df, span_tokens=10, classifier_weights=w, n_buckets=64,
        ngram_range=(2, 3),
    )
    truth = {r.doc_id: r.lang for r in df.collect()}
    rows = {r.doc_id: r for r in out.collect()}
    assert len(rows) == len(truth)
    assert all(rows[d].dominant_lang == truth[d] for d in truth)
    assert all(r.n_langs == 1 for r in rows.values())


def test_subword_gram_expansion_validates_range(spark):
    from rheoceros_spark.operators.text_analysis import lang_classifier_train

    df = _lang_corpus(spark)
    for bad in [(0, 2), (3, 2), (-1, 1)]:
        with pytest.raises(ValueError, match="ngram_range"):
            lang_classifier_train(df, "lang", ngram_range=bad)


def test_stream_lang_classify_matches_batch(spark, tmp_path):
    from pyspark.sql import functions as F
    from rheoceros_spark.operators.text_analysis import (
        lang_classifier_score,
        lang_classifier_train,
    )
    from rheoceros_spark.streaming.stream import stream_lang_classify

    df = _lang_corpus(spark)
    w = lang_classifier_train(df, "lang", n_buckets=64, iters=2, lr=0.5)
    batch = {
        r.doc_id: (r.pred_lang, r.logit_q)
        for r in lang_classifier_score(df, w, n_buckets=64).collect()
    }
    src = str(tmp_path / "lc_src")
    df.coalesce(2).write.mode("overwrite").parquet(src)
    out = []
    sdf = spark.readStream.schema(df.schema).parquet(src)
    q = (
        stream_lang_classify(sdf, w, n_buckets=64)
        .writeStream.foreachBatch(lambda b, i: out.extend(b.collect()))
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt_lc"))
        .start()
    )
    q.awaitTermination(120)
    assert {r.doc_id: (r.pred_lang, r.logit_q) for r in out} == batch
