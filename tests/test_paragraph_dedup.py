"""Span-granular dedup (paragraph_dedup): reassembly invariants,
survivor semantics, and mode/argument contracts.

The load-bearing property is RECONSTRUCTION: purging is lossy on
purpose, but the (clean_text, purged_span_ids) pair plus the original
segmentation must account for every non-purged byte — re-interleaving
the purged spans at their recorded positions reproduces the original
text exactly (delim mode) / the normalized token stream exactly
(token mode)."""

import pytest
from pyspark.sql import functions as F

from rheoceros_spark.operators.dedup import paragraph_dedup, paragraph_segments

DELIM_DOCS = [
    (1, "INTRO UNIQUE one\n\nCOMMON LICENSE BLOCK\n\nbody text a"),
    (2, "different intro\n\nCOMMON LICENSE BLOCK\n\nbody text b"),
    # case-variant of the license block (normalized fp matches), empty
    # paragraph in the middle (structure must survive reassembly)
    (3, "another page\n\ncommon license block\n\nunique tail\n\n\n\nx"),
    (4, None),
    (5, ""),
]


@pytest.fixture(scope="module")
def delim_out(spark):
    df = spark.createDataFrame(DELIM_DOCS, "doc_id bigint, text string")
    out = paragraph_dedup(df, delim="\n\n", min_docs=2)
    return {r.doc_id: r for r in out.collect()}


def test_delim_reassembly_preserves_non_purged_bytes(spark, delim_out):
    """Re-interleaving each doc's purged spans at their recorded span
    ids into the kept spans reproduces the ORIGINAL bytes exactly."""
    df = spark.createDataFrame(DELIM_DOCS, "doc_id bigint, text string")
    segs = {
        (r.doc_id, r.span_id): r.span_text
        for r in paragraph_segments(df, delim="\n\n").collect()
    }
    for doc_id, text in DELIM_DOCS:
        if text is None:
            assert delim_out[doc_id].clean_text is None
            continue
        r = delim_out[doc_id]
        purged = set(int(s) for s in r.purged_span_ids.split(",") if s)
        kept = iter(r.clean_text.split("\n\n")) if r.clean_text != "" or r.n_spans else iter([])
        rebuilt = []
        for i in range(r.n_spans):
            rebuilt.append(segs[(doc_id, i)] if i in purged else next(kept))
        assert "\n\n".join(rebuilt) == text, doc_id
        # and the kept spans really are the non-purged originals
        for i in range(r.n_spans):
            if i not in purged:
                assert rebuilt[i] == segs[(doc_id, i)]


def test_delim_survivor_is_globally_least_occurrence(delim_out):
    # the license block occurs in docs 1,2,3 — (1, span 1) survives,
    # the others purge (case-insensitive fingerprint)
    assert delim_out[1].n_purged == 0
    assert delim_out[2].purged_span_ids == "1"
    assert delim_out[3].purged_span_ids == "1"
    assert "COMMON LICENSE BLOCK" in delim_out[1].clean_text
    assert "LICENSE" not in delim_out[2].clean_text
    assert "license" not in delim_out[3].clean_text


def test_delim_empty_segments_survive_but_never_purge(delim_out):
    # doc 3's "\n\n\n\n" run yields an empty middle segment — kept in
    # place, never counted as boilerplate even though docs 4/5 are empty
    assert delim_out[3].clean_text.endswith("unique tail\n\n\n\nx")
    assert delim_out[5].n_spans == 1 and delim_out[5].n_purged == 0


def test_keep_first_false_purges_every_occurrence(spark):
    df = spark.createDataFrame(DELIM_DOCS, "doc_id bigint, text string")
    out = {
        r.doc_id: r
        for r in paragraph_dedup(
            df, delim="\n\n", min_docs=2, keep_first=False
        ).collect()
    }
    assert out[1].purged_span_ids == "1"
    assert "LICENSE" not in out[1].clean_text


def test_in_document_repetition_alone_never_purges(spark):
    # "x y" repeats 3x inside doc 1 but appears in no other doc —
    # min_docs counts DISTINCT documents, so nothing purges
    df = spark.createDataFrame(
        [(1, "x y x y x y"), (2, "a b c d")], "doc_id bigint, text string"
    )
    out = paragraph_dedup(df, span_tokens=2, min_docs=2).collect()
    assert all(r.n_purged == 0 for r in out)


def test_token_mode_reassembly_preserves_token_stream(spark, sf_dir):
    """Corpus-wide: kept + purged spans in span order == the normalized
    token stream of the original document."""
    from rheoceros_spark.sources.io import load_table

    docs = load_table(spark, sf_dir, "documents")
    segs = {}
    for r in paragraph_segments(docs, span_tokens=4).collect():
        segs.setdefault(r.doc_id, {})[r.span_id] = r.span_text
    out = paragraph_dedup(docs, span_tokens=4, min_docs=2)
    norm = {
        r.doc_id: r.norm
        for r in docs.where(F.col("doc_id").isNotNull())
        .select("doc_id", F.trim(F.regexp_replace(F.lower("text"), "[ \t\n\f\r]+", " ")).alias("norm"))
        .collect()
    }
    n_purged_total = 0
    for r in out.collect():
        if r.clean_text is None:
            continue
        purged = set(int(s) for s in r.purged_span_ids.split(",") if s)
        n_purged_total += len(purged)
        kept = iter(r.clean_text.split(" ")) if r.clean_text else iter([])
        rebuilt = []
        for i in range(r.n_spans):
            if i in purged:
                rebuilt.append(segs[r.doc_id][i])
            else:
                span = segs[r.doc_id][i]
                got = " ".join(next(kept) for _ in span.split(" "))
                assert got == span, (r.doc_id, i)
                rebuilt.append(got)
        assert " ".join(rebuilt) == norm[r.doc_id], r.doc_id
    assert n_purged_total > 0  # the corpus genuinely exercises purging


def test_one_survivor_per_boilerplate_fingerprint(spark, sf_dir):
    from rheoceros_spark.sources.io import load_table

    docs = load_table(spark, sf_dir, "documents")
    segs = paragraph_segments(docs, span_tokens=4)
    out = paragraph_dedup(docs, span_tokens=4, min_docs=2)
    purged = out.select(
        "doc_id", F.explode(F.split("purged_span_ids", ",")).alias("sid")
    ).where(F.col("sid") != "").select(
        "doc_id", F.col("sid").cast("int").alias("span_id")
    )
    survivors = (
        segs.join(purged, ["doc_id", "span_id"], "left_anti")
        .groupBy(F.md5("span_text").alias("fp"))
        .count()
    )
    purged_fps = segs.join(purged, ["doc_id", "span_id"]).select(
        F.md5("span_text").alias("fp")
    ).distinct()
    # every purged fingerprint retains EXACTLY one surviving occurrence
    check = purged_fps.join(survivors, "fp", "left")
    assert check.where(
        F.col("count").isNull() | (F.col("count") != 1)
    ).count() == 0


def test_argument_contracts(spark):
    df = spark.createDataFrame([(1, "a b")], "doc_id bigint, text string")
    with pytest.raises(ValueError, match="exactly one"):
        paragraph_dedup(df, min_docs=2)
    with pytest.raises(ValueError, match="exactly one"):
        paragraph_dedup(df, delim="\n\n", span_tokens=4)
    with pytest.raises(ValueError, match="min_docs"):
        paragraph_dedup(df, delim="\n\n", min_docs=1)
    with pytest.raises(ValueError, match="span_tokens"):
        paragraph_dedup(df, span_tokens=0)


def test_regex_metacharacter_delimiter_is_literal(spark):
    df = spark.createDataFrame(
        [(1, "a|*|b|*|a"), (2, "c|*|b|*|d")], "doc_id bigint, text string"
    )
    out = {r.doc_id: r for r in paragraph_dedup(df, delim="|*|", min_docs=2).collect()}
    assert out[1].n_spans == 3 and out[1].clean_text == "a|*|b|*|a"
    assert out[2].clean_text == "c|*|d" and out[2].purged_span_ids == "1"


def test_plan_no_cartesian_and_partial_aggregation(spark, sf_dir):
    from rheoceros_spark.sources.io import load_table

    out = paragraph_dedup(
        load_table(spark, sf_dir, "documents"), span_tokens=4, min_docs=2
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # fp statistics combine map-side: partial_count before the exchange
    assert "partial_count" in plan


class TestDecontaminateSpans:
    """Span-level decontamination: only benchmark-overlapping spans
    purge; documents survive; reassembly invariant holds."""

    def _run(self, spark, corpus_rows, bench_rows, **kw):
        from rheoceros_spark.operators.dedup import decontaminate_spans

        c = spark.createDataFrame(corpus_rows, "doc_id long, text string")
        b = spark.createDataFrame(bench_rows, "doc_id long, text string")
        out = decontaminate_spans(c, b, **kw)
        return {r.doc_id: r for r in out.collect()}

    def test_only_overlapping_span_purged(self, spark):
        # doc 1: span0 quotes the benchmark verbatim, span1 is clean
        quoted = "what is the capital of france paris obviously"
        corpus = [(1, quoted + " " + "clean words follow here after that quiz")]
        bench = [(100, "quiz item what is the capital of france paris")]
        m = self._run(spark, corpus, bench, n=4, span_tokens=8)
        r = m[1]
        assert r.n_spans == 2 and r.n_purged == 1
        assert r.purged_span_ids == "0"
        assert r.clean_text == "clean words follow here after that quiz"

    def test_clean_docs_untouched_byte_exact(self, spark):
        text = "totally unrelated content with zero overlap anywhere at all"
        m = self._run(spark, [(1, text)], [(100, "benchmark about other things entirely")],
                      n=4, span_tokens=8)
        # span_tokens mode reassembles the NORMALIZED token stream
        assert m[1].n_purged == 0 and m[1].clean_text == text

    def test_delim_mode_preserves_bytes(self, spark):
        # paragraph mode: untouched paragraphs keep exact bytes (inner
        # double spaces survive)
        corpus = [(1, "keep  me  intact\n\nthe quiz answer is forty two exactly")]
        bench = [(100, "the quiz answer is forty two exactly")]
        m = self._run(spark, corpus, bench, n=4, delim="\n\n")
        r = m[1]
        assert r.n_purged == 1 and r.clean_text == "keep  me  intact"

    def test_all_spans_purged_yields_empty_text(self, spark):
        text = "the exact benchmark sentence appears here"
        m = self._run(spark, [(1, text)], [(100, text)], n=4, span_tokens=8)
        assert m[1].n_purged == m[1].n_spans == 1 and m[1].clean_text == ""

    def test_null_text_doc_survives_with_zero_spans(self, spark):
        m = self._run(spark, [(1, None), (2, "the quiz answer is forty two ok")],
                      [(100, "quiz")], n=4, span_tokens=8)
        assert m[1].clean_text is None and m[1].n_spans == 0

    def test_short_span_partial_gram_convention(self, spark):
        # spans shorter than n produce ONE padded partial gram (the
        # contamination_ngrams convention) — it matches only an equal
        # benchmark partial, so a 2-token span never matches 4-gram
        # benchmark text
        m = self._run(spark, [(1, "tiny tail")], [(100, "long benchmark text with many words")],
                      n=4, span_tokens=8)
        assert m[1].n_purged == 0

    def test_rejects_bad_n(self, spark):
        import pytest as _pt

        from rheoceros_spark.operators.dedup import decontaminate_spans

        df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
        with _pt.raises(ValueError, match="n must be"):
            decontaminate_spans(df, df, n=0, span_tokens=8)


def test_delim_containing_backslash_e_is_literal(spark):
    # "\E" inside the delimiter used to terminate the \Q..\E quote
    # early, silently switching the remainder to regex mode; the
    # Pattern.quote re-escape keeps any delimiter fully literal
    df = spark.createDataFrame(
        [(1, r"a\Eb.c\Ed"), (2, "no delim .")], "doc_id long, text string"
    )
    segs = {
        (r.doc_id, r.span_id): r.span_text
        for r in paragraph_segments(df, delim=r"\E").collect()
    }
    assert segs == {(1, 0): "a", (1, 1): "b.c", (1, 2): "d",
                    (2, 0): "no delim ."}


def test_empty_delim_rejected(spark):
    df = spark.createDataFrame([(1, "abc")], "doc_id long, text string")
    with pytest.raises(ValueError, match="non-empty"):
        paragraph_segments(df, delim="")
