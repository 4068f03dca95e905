"""Cross-engine bit-parity of the portable primitives — the foundation
every oracle comparison stands on.  Runs a corpus of adversarial
strings (unicode, emoji, combining marks, whitespace runs, empties)
through h64 / normalize / tokens / n-grams / fingerprint hashing on
Spark AND DuckDB and demands byte-identical results.

normalize_text spells its whitespace class out as ``[ \\t\\n\\f\\r]``
(exactly RE2's ``\\s``) because Java's ``\\s`` also matches vertical
tab — the corpus includes \\x0B to pin that both engines agree.
"""

import duckdb
import pytest
from pyspark.sql import functions as F

from rheoceros_spark.functions.portable import (
    NORMALIZE_SQL,
    h64,
    h64_sql,
    normalize_text,
    tokens,
    word_ngrams,
    word_ngrams_sql,
)


def _corpus() -> list[str]:
    out = [
        "",
        " ",
        "   \t  \n ",
        "a",
        "The quick brown fox",
        "UPPER lower MiXeD",
        "tabs\tand\nnewlines\r\nhere",
        "double  spaces   collapse",
        " leading and trailing ",
        "punctuation!!! #$%^&*() [brackets] {braces}",
        "digits 0123456789 and h3x 0xdeadbeef",
        "unicode: héllo wörld çafé naïve",
        "CJK: 中文分词测试 日本語のテキスト 한국어",
        "emoji: 😀🚀🔥 mixed with text",
        "combining: é à ô",  # é à ô via combining marks
        "rtl: مرحبا بالعالم",
        "cyrillic: Привет мир",
        "greek: Γειά σου Κόσμε",
        "zero​width and nbsp here",  # NOT \s in either engine
        "quotes 'single' \"double\" `back`",
        # \x0B is the one char Java's \s matches but RE2's does not —
        # normalize_text's explicit class must leave it alone in BOTH
        "vertical\x0btab kept and form\x0cfeed collapsed",
        "a" * 500,
        ("word " * 100).strip(),
        "repeated repeated repeated repeated",
    ]
    # deterministic pseudo-random ASCII soup
    import hashlib

    for i in range(40):
        h = hashlib.md5(f"soup:{i}".encode()).hexdigest()
        out.append(" ".join(h[j : j + 3] for j in range(0, 30, 3)))
    return out


@pytest.fixture(scope="module")
def parity_frames(spark, tmp_path_factory):
    strs = _corpus()
    path = str(tmp_path_factory.mktemp("parity") / "strings.parquet")
    spark.createDataFrame(
        [(i, s) for i, s in enumerate(strs)], "sid long, s string"
    ).coalesce(1).write.mode("overwrite").parquet(path)
    return path


def _duck(path, expr):
    return {
        r[0]: r[1]
        for r in duckdb.sql(
            f"SELECT sid, {expr} FROM read_parquet('{path}/*.parquet')"
        ).fetchall()
    }


class TestPortableParity:
    def test_h64_raw_and_seeded(self, spark, parity_frames):
        df = spark.read.parquet(parity_frames).select(
            "sid", h64(F.col("s")).alias("h"), h64(F.col("s"), seed=7).alias("hs")
        )
        got = {r.sid: (r.h, r.hs) for r in df.collect()}
        exp_h = _duck(parity_frames, h64_sql("s"))
        exp_hs = _duck(parity_frames, h64_sql("s", seed="7"))
        for sid, (h, hs) in got.items():
            assert h == exp_h[sid], f"h64 mismatch sid={sid}"
            assert hs == exp_hs[sid], f"seeded h64 mismatch sid={sid}"

    def test_normalize_and_tokens(self, spark, parity_frames):
        df = spark.read.parquet(parity_frames).select(
            "sid",
            normalize_text(F.col("s")).alias("n"),
            tokens(F.col("s")).alias("t"),
        )
        got = {r.sid: (r.n, list(r.t)) for r in df.collect()}
        exp_n = _duck(parity_frames, NORMALIZE_SQL.format(c="s"))
        exp_t = _duck(
            parity_frames, f"string_split({NORMALIZE_SQL.format(c='s')}, ' ')"
        )
        for sid, (n, t) in got.items():
            assert n == exp_n[sid], f"normalize mismatch sid={sid}: {n!r} vs {exp_n[sid]!r}"
            assert t == exp_t[sid], f"tokens mismatch sid={sid}"

    def test_word_bigrams(self, spark, parity_frames):
        df = spark.read.parquet(parity_frames).select(
            "sid", word_ngrams(tokens(F.col("s")), 2).alias("g")
        )
        got = {r.sid: list(r.g) for r in df.collect()}
        toks = f"string_split({NORMALIZE_SQL.format(c='s')}, ' ')"
        exp = _duck(parity_frames, word_ngrams_sql(toks, 2))
        for sid, g in got.items():
            assert g == exp[sid], f"bigram mismatch sid={sid}"
