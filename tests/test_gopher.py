"""Gopher quality-rule tests (text_analysis.gopher_rules): hand-computed
rule flags on crafted rows covering every rule's pass AND fail side, the
exact-integer boundary semantics, and batch≡stream parity of the
stateless twin.  Corpus-level DuckDB parity is covered by the staged
oracle gate (tests/test_staged.py: text_gopher_rules)."""

import pytest
from pyspark.sql import functions as F

from rheoceros_spark.operators.text_analysis import gopher_rules


def _one(spark, text, **kw):
    df = spark.createDataFrame([(0, text)], "doc_id long, text string")
    return gopher_rules(df, **kw).collect()[0]


def test_word_count_bounds(spark):
    r = _one(spark, "the cat and that " * 20, min_words=50, max_words=100)
    assert r.n_words == 80 and r.g_word_count == 1
    assert _one(spark, "the cat", min_words=50).g_word_count == 0
    assert _one(spark, "word " * 200, max_words=100).g_word_count == 0


def test_mean_word_len_is_exact_integer_comparison(spark):
    # 4 words x 3 chars: mean exactly 3.0 — the boundary PASSES
    r = _one(spark, "the cat was fat")
    assert r.mean_word_len == 3.0 and r.g_mean_word_len == 1
    # mean 2.75 < 3 fails; no float near-miss possible
    assert _one(spark, "a bb cc ddd").g_mean_word_len == 0
    # mean exactly 10.0 passes, 10.05 fails
    assert _one(spark, "abcdefghij " * 4).g_mean_word_len == 1
    assert _one(spark, "abcdefghijk abcdefghij abcdefghij abcdefghij").g_mean_word_len == 0


def test_symbol_ratio_is_per_symbol_type(spark):
    # the paper thresholds hash and ellipsis SEPARATELY at 0.1 each:
    # 2 hashes + 2 ellipses over 24 words passes (each 10*2 <= 24)
    # even though the sum (4/24 > 0.1 combined) would have failed
    r = _one(spark, "word " * 20 + "a# b# c… d…")
    assert r.n_words == 24 and r.g_symbol_ratio == 1
    assert r.hash_word_ratio == pytest.approx(2 / 24, abs=1e-6)
    assert r.ellipsis_word_ratio == pytest.approx(2 / 24, abs=1e-6)
    # 3 ellipses over 21 words: 30 > 21 fails on the ellipsis side alone
    r2 = _one(spark, "word " * 19 + "tail… … ...")
    assert r2.g_symbol_ratio == 0
    # '....' is ONE '...' occurrence in both engines (leftmost, non-overlap)
    r3 = _one(spark, "a .... b")
    assert r3.ellipsis_word_ratio == pytest.approx(1 / 3, abs=1e-6)


def test_bullet_and_ellipsis_line_rules(spark):
    ten_bullets = "\n".join(["- item"] * 10)
    # 10/11 bulleted = 90.9% > 90% -> fail; 9/10 = 90% -> pass (boundary)
    assert _one(spark, ten_bullets + "\nplain").g_bullet_lines == 0
    assert _one(spark, "\n".join(["* x"] * 9) + "\nplain").g_bullet_lines == 1
    #   indented bullets count; '•' counts
    assert _one(spark, "  • a\n  • b\nc").bullet_line_frac == pytest.approx(2 / 3, abs=1e-6)
    # ellipsis line ends: 2/5 = 40% > 30% fails; trailing spaces ignored
    t = "a...  \nb…\nplain\nplain\nplain"
    r = _one(spark, t)
    assert r.ellipsis_line_frac == pytest.approx(0.4, abs=1e-6)
    assert r.g_ellipsis_lines == 0


def test_alpha_words_and_stop_words(spark):
    # 4/5 words alphabetic = 80% boundary passes
    assert _one(spark, "the cat sat mat 123").g_alpha_words == 1
    # 3/5 = 60% fails
    assert _one(spark, "the cat sat 12 34").g_alpha_words == 0
    # stop words are DISTINCT hits: 'the the the' is one stop word
    r = _one(spark, "the the the xyz")
    assert r.stop_hits == 1 and r.g_stop_words == 0
    assert _one(spark, "the cat and dog").stop_hits == 2


def test_alpha_words_unicode_letters(spark):
    # Gopher's rule is "contains at least one ALPHABETIC character" —
    # words of non-ASCII letters must count (was ASCII-only [a-z])
    assert _one(spark, "café über niño 12 34").g_alpha_words == 0  # 3/5
    assert _one(spark, "café über niño mañana 12").g_alpha_words == 1  # 4/5
    # digits/punct-only words still non-alphabetic
    assert _one(spark, "123 456 !!! ... ---").g_alpha_words == 0


def test_empty_and_null_text(spark):
    df = spark.createDataFrame(
        [(0, ""), (1, None), (2, "   \n  ")], "doc_id long, text string"
    )
    rows = {r.doc_id: r for r in gopher_rules(df).collect()}
    for r in rows.values():
        assert r.n_words == 0 and r.gopher_pass == 0
        assert r.mean_word_len is None and r.alpha_word_frac is None


def test_gopher_pass_is_conjunction(spark):
    good = ("the cat sat on the mat with a hat and that was nice to see "
            "every word here has letters and the text keeps flowing along "
            "with more good words that push the count over fifty total words "
            "because the rule needs that many to pass the first gate ok")
    r = _one(spark, good)
    flags = [r.g_word_count, r.g_mean_word_len, r.g_symbol_ratio,
             r.g_bullet_lines, r.g_ellipsis_lines, r.g_alpha_words,
             r.g_stop_words]
    assert flags == [1] * 7 and r.gopher_pass == 1
    # flipping ONE rule (symbols) flips the conjunction
    r2 = _one(spark, good + " " + "#" * 40)
    assert r2.g_symbol_ratio == 0 and r2.gopher_pass == 0


def test_stream_twin_matches_batch(spark, sf_dir, tmp_path):
    from rheoceros_spark.streaming.stream import stream_gopher_rules

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").where(
        F.col("doc_id").isNotNull()
    )
    cols = ["doc_id", "n_words", "mean_word_len", "stop_hits", "gopher_pass"]
    batch = {r.doc_id: tuple(r) for r in gopher_rules(docs).select(cols).collect()}

    src = str(tmp_path / "gopher_src")
    docs.coalesce(2).write.mode("overwrite").parquet(src)
    out = []
    sdf = spark.readStream.schema(docs.schema).parquet(src)
    q = (
        stream_gopher_rules(sdf)
        .select(cols)
        .writeStream.foreachBatch(lambda b, i: out.extend(b.collect()))
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt_gopher"))
        .start()
    )
    q.awaitTermination(120)
    assert {r.doc_id: tuple(r) for r in out} == batch


# ---------------------------------------------------------------------------
# C4 line-level filter (the line-granular complement; same test home)
# ---------------------------------------------------------------------------


def _c4_one(spark, text, **kw):
    from rheoceros_spark.operators.text_analysis import c4_line_filter

    df = spark.createDataFrame([(0, text)], "doc_id long, text string")
    return c4_line_filter(df, **kw).collect()[0]


def test_c4_keeps_only_terminal_punct_lines(spark):
    t = ("this line ends quite well.\nno terminal punctuation right here\n"
         "this one asks a question?\nshort line.\n"
         "the quoted line ends with \"\nbang this line loudly ends!")
    r = _c4_one(spark, t)
    # 'short line.' fails the 5-word minimum; line 2 fails punct
    assert r.n_lines == 6 and r.n_kept == 4
    assert r.clean_text == (
        'this line ends quite well.\nthis one asks a question?\n'
        'the quoted line ends with "\nbang this line loudly ends!'
    )


def test_c4_trailing_spaces_ignored_for_terminal_check(spark):
    r = _c4_one(spark, "ends with dot and spaces.   \nplain line here")
    assert r.n_kept == 1


def test_c4_javascript_lines_removed_case_insensitive(spark):
    t = "please enable JavaScript to continue viewing.\na real content line stays."
    r = _c4_one(spark, t)
    assert r.n_kept == 1 and "real content" in r.clean_text


def test_c4_page_flags(spark):
    base = "\n".join([f"good line number {i} stays." for i in range(6)])
    assert _c4_one(spark, base).c4_pass == 1
    assert _c4_one(spark, base + "\nLorem Ipsum dolor sit.").has_lorem == 1
    assert _c4_one(spark, base + "\nfunction() { return; }").has_brace == 1
    assert _c4_one(spark, base + "\nfunction() { return; }").c4_pass == 0
    # 2 kept lines < 3 -> page fails even with clean content
    few = "\n".join([f"good line number {i} stays." for i in range(2)])
    assert _c4_one(spark, few).c4_pass == 0


def test_c4_min_line_words_boundary(spark):
    # exactly 5 words passes (the c4_utils _MIN_WORDS_PER_LINE), 4 fails
    r = _c4_one(spark, "one two three four five.\none two three four.")
    assert r.n_kept == 1 and r.clean_text == "one two three four five."


def test_c4_word_count_edge_semantics(spark):
    # '   .' trims to '.' — ONE word under split() semantics, exactly
    # what the reference c4_utils counts, so min_line_words=1 keeps it
    r = _c4_one(spark, "   .\nreal words sit right here.", min_line_words=1)
    assert r.n_kept == 2
    # a whitespace-only line counts ZERO words (split('') is [''] —
    # guarded), though the terminal-punct rule already rejects it;
    # the guard keeps the count honest for any future rule reuse
    r2 = _c4_one(spark, "     \nreal words sit right here.", min_line_words=0)
    assert r2.n_kept == 1


def test_c4_empty_and_null(spark):
    from rheoceros_spark.operators.text_analysis import c4_line_filter

    df = spark.createDataFrame([(0, ""), (1, None)], "doc_id long, text string")
    for r in c4_line_filter(df).collect():
        assert r.n_kept == 0 and r.c4_pass == 0 and r.clean_text == ""


def test_c4_reassembly_preserves_kept_bytes(spark):
    # kept lines survive byte-for-byte, including inner runs of spaces
    t = "always keep  this   exact line.\ndrop me\nand  keep  this one too!"
    r = _c4_one(spark, t)
    assert r.clean_text == "always keep  this   exact line.\nand  keep  this one too!"


def test_c4_stream_twin_matches_batch(spark, sf_dir, tmp_path):
    from rheoceros_spark.operators.text_analysis import c4_line_filter
    from rheoceros_spark.streaming.stream import stream_c4_lines

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").where(
        F.col("doc_id").isNotNull()
    )
    cols = ["doc_id", "n_lines", "n_kept", "c4_pass", "clean_text"]
    batch = {r.doc_id: tuple(r) for r in c4_line_filter(docs).select(cols).collect()}

    src = str(tmp_path / "c4_src")
    docs.coalesce(2).write.mode("overwrite").parquet(src)
    out = []
    sdf = spark.readStream.schema(docs.schema).parquet(src)
    q = (
        stream_c4_lines(sdf)
        .select(cols)
        .writeStream.foreachBatch(lambda b, i: out.extend(b.collect()))
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt_c4"))
        .start()
    )
    q.awaitTermination(120)
    assert {r.doc_id: tuple(r) for r in out} == batch


# ---------------------------------------------------------------------------
# adversarial cross-engine parity: the staged oracles re-run over the
# portable-parity corpus (unicode, emoji, \x0b, combining marks, CJK —
# far nastier than the driver's word-soup documents)
# ---------------------------------------------------------------------------


def _adversarial_docs(spark, tmp_path):
    from tests.test_portable_parity import _corpus

    strs = _corpus()
    # add line-structured adversaries the flat corpus lacks
    strs = strs + [
        "- bullet…\n* star...\n• dot.\nplain end.\nnbsp\xa0line.",
        "ends…\nends...\nends.\" \nno end\n#tag line.",
        "\x0bvertical start.\nlorem IPSUM inside.\n{ brace }",
    ]
    df = spark.createDataFrame(
        [(i, s, "x") for i, s in enumerate(strs)],
        "doc_id long, text string, source string",
    )
    path = str(tmp_path / "adv_docs.parquet")
    df.coalesce(1).write.mode("overwrite").parquet(path)
    return df, path


@pytest.mark.parametrize(
    "name",
    ["text_gopher_rules", "curation_c4_lines", "text_lang_segments",
     "text_bpe_fertility"],
)
def test_staged_oracle_parity_on_adversarial_corpus(spark, tmp_path, name):
    import duckdb

    import __spark_entry__ as entry
    from rheoceros_spark.operators.text_analysis import (
        bpe_fertility,
        c4_line_filter,
        gopher_rules,
        lang_segments,
    )

    df, path = _adversarial_docs(spark, tmp_path)
    if name == "text_gopher_rules":
        out = gopher_rules(df).drop("text", "lang", "source")
    elif name == "text_lang_segments":
        out = lang_segments(df, span_tokens=16)
    elif name == "text_bpe_fertility":
        out = bpe_fertility(df)
    else:
        # mirror the staged query's deterministic line-ification
        lineified = df.withColumn(
            "__lineified",
            F.replace(
                F.replace(
                    F.coalesce(F.col("text"), F.lit("")),
                    F.lit(" table "),
                    F.lit(".\ntable "),
                ),
                F.lit(" query "),
                F.lit("?\nquery "),
            ),
        )
        out = c4_line_filter(lineified, text_col="__lineified").select(
            "doc_id", "n_lines", "n_kept", "has_lorem", "has_brace",
            "c4_pass", "clean_text",
        )
    scols = out.columns
    srows = sorted(
        tuple("NULL" if v is None else str(v) for v in r) for r in out.collect()
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{path}/*.parquet')"
    )
    pdf = con.sql({**entry._STAGED_ORACLES, **entry.oracle_sql()}[name]).df()[scols]
    drows = sorted(
        tuple("NULL" if v != v or v is None else str(v) for v in r)
        for r in pdf.itertuples(index=False, name=None)
    )
    assert srows == drows
