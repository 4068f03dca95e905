"""BPE subword tokenization + real-token-budget composition."""

import duckdb
import pytest
from pyspark.sql import functions as F

from rheoceros_spark.operators.text_analysis import (
    BPE_DEMO_MERGES,
    bpe_encode,
    bpe_word_fold_duckdb,
    chunk_documents,
)


def test_hand_computed_merges(spark):
    df = spark.createDataFrame(
        [(1, "the thing is interesting and this!"), (2, None), (3, "   ")],
        "doc_id bigint, text string",
    )
    rows = {r.doc_id: r for r in bpe_encode(df).collect()}
    # 'interesting' -> in t er es t ing under the demo table;
    # 'this' -> (t,h)->th then (th,is)->this (the rank-order invariant)
    assert rows[1].bpe_tokens == [
        "the", "th", "ing", "is", "in", "t", "er", "es", "t", "ing",
        "and", "this", "!",
    ]
    assert rows[1].n_bpe_tokens == 13
    assert rows[2].bpe_tokens == [] and rows[2].n_bpe_tokens == 0
    assert rows[3].bpe_tokens == [] and rows[3].n_bpe_tokens == 0


def test_merge_all_occurrences_nonoverlapping(spark):
    # 'aaa' under (a,a): left scan merges the FIRST pair only -> [aa, a]
    df = spark.createDataFrame([(1, "aaa")], "doc_id bigint, text string")
    out = bpe_encode(df, merges=[("a", "a")]).collect()[0]
    assert out.bpe_tokens == ["aa", "a"]


def test_malformed_merge_table_rejected(spark):
    df = spark.createDataFrame([(1, "abc")], "doc_id bigint, text string")
    with pytest.raises(ValueError, match="no earlier rule forms it"):
        bpe_encode(df, merges=[("ab", "c")])
    with pytest.raises(ValueError, match="ASCII alphanumeric"):
        bpe_encode(df, merges=[("a", "'")])


def test_vertical_tab_parity_between_impls(spark):
    """normalize_text deliberately does NOT treat \\x0B as whitespace
    (RE2 parity); the Arrow path's Python regex must agree — including
    at string EDGES, where a bare Python str.strip() would eat \\x0b /
    \\xa0 / \\x1c-\\x1f that Spark's trim (and the DuckDB oracle)
    leaves in place."""
    rows = [
        (1, "a\x0bb c"),            # mid-string \x0b
        (2, "\x0bleading vt"),      # leading \x0b
        (3, "trailing vt\x0b"),     # trailing \x0b
        (4, "\xa0nbsp edges\xa0"),  # non-breaking spaces at both edges
        (5, " \x1c fs \x1f "),      # file/unit separators inside spaces
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    a = {r.doc_id: r.bpe_tokens for r in bpe_encode(df, impl="arrow").collect()}
    s = {r.doc_id: r.bpe_tokens for r in bpe_encode(df, impl="sql").collect()}
    assert a == s
    # the exotic chars survive normalization (not stripped, not collapsed)
    assert "\x0b" in "".join(a[1])
    assert "".join(a[2]).startswith("\x0b")
    assert "".join(a[3]).endswith("\x0b")
    joined4 = "".join(a[4])
    assert joined4.startswith("\xa0") and joined4.endswith("\xa0")
    assert "\x1c" in "".join(a[5]) and "\x1f" in "".join(a[5])


def test_arrow_and_sql_impls_bit_identical(spark, sf_dir):
    """The Arrow fast path (lowest-rank-first reference loop, memoized)
    and the pure-column-algebra fold twin (sequential rank order) are
    the SAME function on well-formed merge tables — corpus-wide."""
    from rheoceros_spark.sources.io import load_table

    docs = load_table(spark, sf_dir, "documents").where(F.col("doc_id").isNotNull())
    a = {
        r.doc_id: tuple(r.bpe_tokens)
        for r in bpe_encode(docs, impl="arrow").select("doc_id", "bpe_tokens").collect()
    }
    s = {
        r.doc_id: tuple(r.bpe_tokens)
        for r in bpe_encode(docs, impl="sql").select("doc_id", "bpe_tokens").collect()
    }
    assert a == s and a
    with pytest.raises(ValueError, match="impl"):
        bpe_encode(docs, impl="rust")


def test_matches_duckdb_fold_on_corpus(spark, sf_dir):
    from rheoceros_spark.sources.io import load_table

    docs = load_table(spark, sf_dir, "documents").where(F.col("doc_id").isNotNull())
    got = {
        r.doc_id: (r.n_bpe_tokens, tuple(r.bpe_tokens[:8]))
        for r in bpe_encode(docs).select("doc_id", "n_bpe_tokens", "bpe_tokens").collect()
    }
    fold = bpe_word_fold_duckdb(BPE_DEMO_MERGES)
    norm = "trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))"
    exp = {
        r[0]: (r[1], tuple(r[2][:8]))
        for r in duckdb.sql(
            f"""
            SELECT doc_id, len(bpe), bpe FROM (
              SELECT doc_id,
                     CASE WHEN text IS NULL OR length({norm}) = 0
                          THEN CAST([] AS VARCHAR[])
                          ELSE flatten(list_transform(
                                 regexp_extract_all({norm}, '[A-Za-z]+|[0-9]|[^A-Za-z0-9 ]'),
                                 w -> {fold})) END AS bpe
              FROM '{sf_dir}/documents.parquet' WHERE doc_id IS NOT NULL)
            """
        ).fetchall()
    }
    assert got == exp


class TestRealTokenBudgets:
    """The VERDICT-r6 composition contract: chunk/pack/budget budget in
    model (BPE) tokens when given the bpe columns."""

    def _encoded(self, spark):
        rows = [
            (1, "s1", "the thing is interesting and this thing is the thing"),
            (2, "s1", "other words entirely here without merges x y z"),
            (3, "s2", "and and and and and and"),
        ]
        df = spark.createDataFrame(rows, "doc_id bigint, source string, text string")
        return bpe_encode(df)

    def test_chunk_documents_on_bpe_tokens(self, spark):
        enc = self._encoded(spark)
        chunks = chunk_documents(
            enc, chunk_tokens=4, overlap=1, tokens_col="bpe_tokens"
        ).collect()
        by_doc = {}
        for r in chunks:
            by_doc.setdefault(r.doc_id, []).append(r)
        n_bpe = {r.doc_id: r.n_bpe_tokens for r in enc.collect()}
        for doc_id, rs in by_doc.items():
            rs.sort(key=lambda r: r.chunk_id)
            # every chunk's tokens are a slice of the doc's bpe stream:
            # stride accounting must reproduce the total exactly
            total = n_bpe[doc_id]
            covered = (len(rs) - 1) * 3 + rs[-1].n_chunk_tokens  # stride 3
            assert covered == total, (doc_id, covered, total)
            assert all(r.n_chunk_tokens <= 4 for r in rs)
            # chunk_text is the space-joined token slice
            assert rs[0].chunk_text.count(" ") == rs[0].n_chunk_tokens - 1

    def test_pack_and_budget_accept_bpe_counts(self, spark):
        from rheoceros_spark.operators.curation import (
            budget_mix_select,
            pack_sequences,
            shuffle_shards,
        )

        enc = self._encoded(spark)
        sharded = shuffle_shards(enc, n_shards=1)
        packed = pack_sequences(sharded, budget=8, token_col="n_bpe_tokens")
        assert {r.bin_id for r in packed.collect()} != set()
        sel = budget_mix_select(enc, token_budget=10, token_col="n_bpe_tokens")
        rows = sel.collect()
        assert rows
        # quotas were computed from BPE totals, not whitespace counts
        n_by_source = {}
        for r in enc.collect():
            n_by_source[r.source] = n_by_source.get(r.source, 0) + r.n_bpe_tokens
        assert {r.quota for r in rows} <= {
            q for q in range(0, max(n_by_source.values()) + 11)
        }


# ---------------------------------------------------------------------------
# property: arrow (lowest-rank-first) ≡ sql (sequential rank order) on
# ANY well-formed merge table — the equivalence the docstring proves
# ---------------------------------------------------------------------------

from hypothesis import given, settings
from hypothesis import strategies as st

from rheoceros_spark.operators.text_analysis import _bpe_merge_word, _check_merges


@st.composite
def wellformed_merges(draw):
    """Random merge tables honoring the BPE training invariant: every
    operand is a base character or the product of an earlier rule."""
    base = ["a", "b", "c"]
    formed = list(base)
    rules = []
    n = draw(st.integers(min_value=1, max_value=8))
    for _ in range(n):
        p1 = draw(st.sampled_from(formed))
        p2 = draw(st.sampled_from(formed))
        rules.append((p1, p2))
        formed.append(p1 + p2)
    return rules


def _sequential_reference(word, merges):
    """Pure-python twin of the SQL fold cascade: apply every rule once,
    in rank order, merging left-scan non-overlapping."""
    syms = list(word)
    for p1, p2 in merges:
        out, i = [], 0
        while i < len(syms):
            if i < len(syms) - 1 and syms[i] == p1 and syms[i + 1] == p2:
                out.append(p1 + p2)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    return syms


@given(wellformed_merges(), st.text(alphabet="abc", min_size=1, max_size=12))
@settings(max_examples=300, deadline=None)
def test_lowest_rank_first_equals_sequential_rank_order(merges, word):
    """The reference BPE loop (merge the lowest-rank pair present,
    repeat) and one sequential pass per rule in rank order are the SAME
    function on well-formed tables — the invariant both engine impls
    and the DuckDB oracle rest on."""
    _check_merges(merges)
    ranks = {}
    for i, p in enumerate(merges):
        ranks.setdefault(p, i)  # duplicate rules: first (lowest) rank wins
    got = _bpe_merge_word(word, tuple(merges), ranks, {})
    want = _sequential_reference(word, merges)
    assert got == want, (merges, word)


# ---------------------------------------------------------------------------
# bpe_train: corpus-scale merge-table training
# ---------------------------------------------------------------------------

class TestBpeTrain:
    def _df(self, spark, texts):
        return spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
        )

    def test_hand_computed_training(self, spark):
        """'aaab' x3 (one distinct word, cnt=3).  Round 1 pairs:
        (a,a)=6 (two non-overlap... the left scan counts positions:
        (a,a),(a,a),(a,b) -> (a,a)=6? No: pair COUNTS are positional —
        (a,a) at i=1,2 and (a,b) at i=3, each weighted cnt=3, so
        (a,a)=6, (a,b)=3 -> merge (a,a): [aa, a, b].  Round 2:
        (aa,a)=3, (a,b)=3 -> tie, lexicographic: 'a' < 'aa' -> merge
        (a,b): [aa, ab].  Round 3: (aa,ab)=3 -> merge (aa,ab)."""
        from rheoceros_spark.operators.text_analysis import bpe_train

        m = bpe_train(self._df(spark, ["aaab"] * 3), n_merges=3)
        assert m == [("a", "a"), ("a", "b"), ("aa", "ab")]

    def test_trained_table_feeds_encode(self, spark):
        """Training-rank order satisfies _check_merges by construction;
        the trained table composes with both encode impls,
        bit-identically."""
        from rheoceros_spark.operators.text_analysis import (
            _check_merges,
            bpe_encode,
            bpe_train,
        )

        df = self._df(
            spark,
            ["the theme there then", "the then the", "other anthem", None, ""],
        )
        m = bpe_train(df, n_merges=8)
        assert m, "expected at least one merge on a repetitive corpus"
        _check_merges(m)
        a = sorted(
            map(tuple, bpe_encode(df, merges=m, impl="arrow").select(
                "doc_id", "bpe_tokens").collect())
        )
        s = sorted(
            map(tuple, bpe_encode(df, merges=m, impl="sql").select(
                "doc_id", "bpe_tokens").collect())
        )
        assert a == s

    def test_early_stop_when_no_pair_repeats(self, spark):
        """All-distinct single-char words have no repeating pair —
        training stops immediately with an empty table."""
        from rheoceros_spark.operators.text_analysis import bpe_train

        assert bpe_train(self._df(spark, ["a b c", "d e f"]), n_merges=5) == []

    def test_punctuation_never_enters_merges(self, spark):
        """The pre-tokenizer isolates punctuation into 1-char
        pre-tokens, so learned operands are always alnum (and the
        table is safe to embed as SQL literals)."""
        from rheoceros_spark.operators.text_analysis import bpe_train

        m = bpe_train(
            self._df(spark, ["it's it's it's can't can't don't!!!"]), n_merges=6
        )
        for a, b in m:
            assert a.isalnum() and b.isalnum(), (a, b)

    def test_rejects_bad_n_merges(self, spark):
        from rheoceros_spark.operators.text_analysis import bpe_train

        with pytest.raises(ValueError, match="n_merges"):
            bpe_train(self._df(spark, ["x"]), n_merges=0)


class TestBpeFertility:
    """Tokenizer-efficiency report: hand-computed totals/ratios under
    the demo merge table, empty-group and empty-text conventions."""

    def test_hand_computed_single_source(self, spark):
        from rheoceros_spark.operators.text_analysis import bpe_encode, bpe_fertility

        rows = [(1, "a", "the cat"), (2, "a", "in the hat")]
        df = spark.createDataFrame(rows, "doc_id long, source string, text string")
        enc = {r.doc_id: r.n_bpe_tokens for r in bpe_encode(df).collect()}
        total_bpe = enc[1] + enc[2]
        out = {r.source: r for r in bpe_fertility(df).collect()}
        r = out["a"]
        # words: 2 + 3; word chars: len('the cat')-1 + len('in the hat')-2
        assert (r.n_docs, r.total_words, r.total_word_chars) == (2, 5, 14)
        assert r.total_bpe_tokens == total_bpe
        assert r.fertility == (total_bpe * 1_000_000 // 5) / 1e6
        assert r.chars_per_token == (14 * 1_000_000 // total_bpe) / 1e6

    def test_empty_and_null_text_counts_zero(self, spark):
        from rheoceros_spark.operators.text_analysis import bpe_fertility

        df = spark.createDataFrame(
            [(1, "a", ""), (2, "a", None), (3, "a", "   ")],
            "doc_id long, source string, text string",
        )
        r = bpe_fertility(df).collect()[0]
        assert (r.n_docs, r.total_words, r.total_bpe_tokens) == (3, 0, 0)
        assert r.fertility is None and r.chars_per_token is None

    def test_groups_are_independent(self, spark):
        from rheoceros_spark.operators.text_analysis import bpe_fertility

        df = spark.createDataFrame(
            [(1, "a", "the the the"), (2, "b", "zzzz qqqq xxxx")],
            "doc_id long, source string, text string",
        )
        out = {r.source: r for r in bpe_fertility(df).collect()}
        # 'the' merges to one token (fertility 1.0); letter-soup words
        # stay fragmented (fertility > 1)
        assert out["a"].fertility == 1.0
        assert out["b"].fertility > 1.0


def test_bpe_train_oracle_survives_u001f_corpus(spark, tmp_path):
    """A corpus document containing U+001F (the oracle's internal
    symbol separator) used to corrupt the oracle's rebuilt symbol
    arrays; the oracle now pre-filters that pre-token (parity-neutral:
    a 1-symbol word has no pairs and merge operands are
    alnum-validated)."""
    import duckdb

    import __spark_entry__ as entry
    from rheoceros_spark.operators.text_analysis import bpe_train

    texts = ["low low lower \x1f lowest", "low\x1flow newer", "\x1f\x1f"]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    path = str(tmp_path / "u001f_docs.parquet")
    df.coalesce(1).write.mode("overwrite").parquet(path)

    merges = bpe_train(df, n_merges=12)
    want = [(str(i), a, b) for i, (a, b) in enumerate(merges)]

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{path}/*.parquet')"
    )
    pdf = con.sql(entry.oracle_sql()["text_bpe_train"]).df()
    got = [(str(r[0]), r[1], r[2]) for r in pdf.itertuples(index=False, name=None)]
    assert got == want and got, got
