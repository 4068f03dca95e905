"""HTML extraction + WARC demux + intra-document line dedup — the
crawl-pipeline stage-0 family (round 12).

The extraction matrix below is HAND-WRITTEN: every row's expected
block verdicts and extracted text were derived from the documented
rules by hand, and both engines (Spark operator and the DuckDB twin
builder) are pinned to the same expectations."""

import duckdb
import pandas as pd
import pytest
from pyspark.sql import functions as F

from rheoceros_spark.operators.dedup import (
    intradoc_line_dedup,
    intradoc_line_dedup_duckdb_sql,
)
from rheoceros_spark.operators.html import (
    html_blocks,
    html_extract_duckdb_sql,
    html_extract_text,
)
from rheoceros_spark.sources.warc import (
    encode_warc,
    load_warc,
    scan_warc_stream,
    warc_records,
)

PROSE = "This sentence has enough alphabetic words to satisfy every keeper rule."


def _extract(spark, html, **kw):
    df = spark.createDataFrame([(1, html)], "doc_id bigint, html string")
    return html_extract_text(df, **kw).collect()[0]


def _blocks(spark, html, **kw):
    df = spark.createDataFrame([(1, html)], "doc_id bigint, html string")
    return html_blocks(df, **kw).orderBy("block_idx").collect()


# ---------------------------------------------------------------------------
# hand-written extraction matrix
# ---------------------------------------------------------------------------

def test_script_style_noscript_and_comments_drop_entire_subtree(spark):
    r = _extract(
        spark,
        f"<script>var html = '<p>{PROSE}</p>';</script>"
        f"<style>p {{ color: red; }}</style>"
        f"<noscript>{PROSE}</noscript>"
        f"<!-- {PROSE} -->"
        f"<p>{PROSE}</p>",
    )
    assert r.text == PROSE
    assert (r.n_blocks, r.n_kept) == (1, 1)


def test_block_tags_segment_and_inline_tags_do_not(spark):
    r = _blocks(
        spark,
        f"<p>{PROSE}</p><div>{PROSE}</div>"
        f"<p>inline <b>bold</b> and <i>italics</i> stay inside one single block of prose.</p>",
    )
    assert [b.text for b in r] == [
        PROSE,
        PROSE,
        "inline bold and italics stay inside one single block of prose.",
    ]


def test_br_and_hr_are_segmentation_points(spark):
    r = _blocks(spark, f"{PROSE}<br/>{PROSE}<hr>{PROSE}")
    assert [b.text for b in r] == [PROSE, PROSE, PROSE]
    assert all(b.kept == 1 for b in r)


def test_entities_decode_and_amp_is_last(spark):
    r = _extract(
        spark,
        "<p>Q &amp; A says &lt;tag&gt; &quot;x&quot; &#39;y&#39;&nbsp;"
        "and &amp;lt; stays literal in this long block.</p>",
    )
    assert r.text == (
        "Q & A says <tag> \"x\" 'y' and &lt; stays literal in this long block."
    )


def test_link_density_drops_nav_and_footer_boilerplate(spark):
    rows = _blocks(
        spark,
        "<div><a href='/'>Home</a> <a href='/a'>About</a> <a href='/b'>Contact</a></div>"
        f"<p>Read <a href='x'>a short link</a> inside {PROSE.lower()}</p>",
    )
    nav, prose = rows
    # nav: every visible char except separators is anchor text
    assert nav.kept == 0 and nav.link_chars > 0
    assert nav.link_chars * 100 > nav.n_chars * 33
    # prose with a small link passes
    assert prose.kept == 1
    assert prose.link_chars == len("a short link")


def test_min_chars_words_and_alpha_rules(spark):
    rows = _blocks(
        spark,
        "<p>Too short.</p>"                          # < 25 chars
        "<p>0123456789 0123456789 0123456789</p>"    # words but no alpha
        f"<p>{PROSE}</p>",
    )
    assert [b.kept for b in rows] == [0, 0, 1]
    r = _extract(
        spark,
        "<p>Too short.</p>"
        f"<p>{PROSE}</p>",
        min_block_chars=5,
        min_block_words=2,
    )
    assert r.text == f"Too short.\n{PROSE}"


def test_forged_sentinels_in_input_are_neutralized(spark):
    # raw \x01/\x02 in the page must not fabricate link spans
    r = _blocks(spark, f"\x01{PROSE}\x02 <p>{PROSE}</p>")
    assert all(b.link_chars == 0 for b in r)
    assert [b.kept for b in r] == [1, 1]


def test_anchor_with_nested_inline_tags_counts_full_link_text(spark):
    rows = _blocks(
        spark,
        f"<p>{PROSE} <a href='x'>click <b>this</b> now</a></p>",
    )
    assert rows[0].link_chars == len("click this now")


def test_null_and_plain_text_inputs(spark):
    df = spark.createDataFrame(
        [(1, None), (2, PROSE)], "doc_id bigint, html string"
    )
    out = {r.doc_id: r for r in html_extract_text(df).collect()}
    assert (out[1].text, out[1].n_blocks, out[1].n_kept) == ("", 0, 0)
    assert out[2].text == PROSE


def test_extract_rejects_bad_params(spark):
    df = spark.createDataFrame([(1, "x")], "doc_id bigint, html string")
    with pytest.raises(ValueError, match="min_block"):
        html_extract_text(df, min_block_chars=0)
    with pytest.raises(ValueError, match="percentage"):
        html_extract_text(df, max_link_density_pct=150)


def test_extraction_matrix_matches_duckdb_twin(spark):
    """Edge corpus through BOTH engines — crafted rows the sf fixtures
    can't produce (NULL, forged sentinels, entity soup, unclosed
    script, uppercase tags, attributes with '>'-free values)."""
    rows = [
        (1, f"<P CLASS='x'>{PROSE}</P><SCRIPT>ignored</SCRIPT>"),
        (2, None),
        (3, ""),
        (4, f"\x01forged\x02<p>{PROSE}</p>"),
        (5, "<p>Q &amp; A &lt;t&gt;&nbsp;&quot;deep&quot; entity block with words enough.</p>"),
        (6, f"<script>never closed {PROSE}"),
        (7, f"<ul><li>{PROSE}</li><li>{PROSE}</li></ul>"),
        (8, f"<div><a href='/'>One</a><a href='/2'>Two</a></div><p>{PROSE}</p>"),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, html string")
    got = [
        (r.doc_id, r.text, r.n_blocks, r.n_kept, r.n_chars)
        for r in html_extract_text(df).orderBy("doc_id").collect()
    ]
    e = html_extract_duckdb_sql("html")
    con = duckdb.connect()
    con.register("t", pd.DataFrame(rows, columns=["doc_id", "html"]))
    want = con.sql(
        f"""
        WITH s AS (SELECT doc_id, {e['blocks']} AS __blocks FROM t),
        k AS (SELECT doc_id, __blocks, {e['kept']} AS __kept FROM s)
        SELECT doc_id, {e['text']} AS text,
               len(__blocks) AS n_blocks, len(__kept) AS n_kept,
               length({e['text']}) AS n_chars
        FROM k ORDER BY doc_id
        """
    ).fetchall()
    assert [tuple(w) for w in want] == got


# ---------------------------------------------------------------------------
# WARC demux
# ---------------------------------------------------------------------------

_RECS = [
    (
        "response",
        "http://a.example/page",
        b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n<html><p>hi</p></html>",
    ),
    ("request", "http://a.example/page", b"GET /page HTTP/1.1\r\n"),
    ("warcinfo", None, b"software: fixture"),
    ("response", "http://a.example/empty", b""),
]


def test_warc_round_trip_offsets_are_byte_exact():
    blob = encode_warc(_RECS)
    recs = scan_warc_stream(blob)
    assert len(recs) == len(_RECS)
    for r, (t, u, payload) in zip(recs, _RECS):
        assert (r.warc_type, r.target_uri, r.content_length) == (t, u, len(payload))
        start = r.offset + r.header_len
        assert blob[start : start + r.content_length] == payload
    # records tile the stream: next offset = end of payload + CRLFCRLF
    for a, b in zip(recs, recs[1:]):
        assert b.offset == a.offset + a.header_len + a.content_length + 4


def test_warc_malformed_streams_raise_loudly():
    blob = encode_warc(_RECS[:1])
    with pytest.raises(ValueError, match="expected record header"):
        scan_warc_stream(b"garbage" + blob)
    with pytest.raises(ValueError, match="truncated"):
        scan_warc_stream(blob[:-10])
    no_len = b"WARC/1.0\r\nWARC-Type: response\r\n\r\npayload"
    with pytest.raises(ValueError, match="Content-Length"):
        scan_warc_stream(no_len)
    bad_len = b"WARC/1.0\r\nContent-Length: xx\r\n\r\n"
    with pytest.raises(ValueError, match="non-numeric"):
        scan_warc_stream(bad_len)
    two = encode_warc(_RECS[:2])
    # destroy the inter-record separator
    broken = two.replace(b"\r\n\r\nWARC/1.0", b"\r\nWARC/1.0", 1)
    with pytest.raises(ValueError, match="separator|truncated|expected record"):
        scan_warc_stream(broken)


def test_warc_records_spark_demux_and_http_strip(spark):
    blob = encode_warc(_RECS)
    df = spark.createDataFrame(
        [("f1", bytearray(blob)), ("f2", None), ("f3", bytearray(b"not warc"))],
        "source_id string, content binary",
    )
    out = warc_records(df).orderBy("source_id", "rec_idx").collect()
    # malformed f3 and NULL f2 contribute no rows, f1 all four
    assert [r.source_id for r in out] == ["f1"] * 4
    r0 = out[0]
    assert (r0.warc_type, r0.http_status) == ("response", 200)
    assert bytes(r0.payload) == b"<html><p>hi</p></html>"
    # non-HTTP payloads pass through unstripped
    assert bytes(out[1].payload) == _RECS[1][2]
    assert out[1].http_status is None
    # strip disabled: full wire bytes
    raw = warc_records(df, strip_http_headers=False).orderBy("rec_idx").collect()
    assert bytes(raw[0].payload) == _RECS[0][2]
    # offsets match the scanner's
    scanned = scan_warc_stream(blob)
    assert [r.byte_offset for r in out] == [s.offset for s in scanned]


def test_load_warc_binary_file_source(spark, tmp_path):
    p = tmp_path / "crawl"
    p.mkdir()
    (p / "a.warc").write_bytes(encode_warc(_RECS[:2]))
    (p / "b.warc").write_bytes(encode_warc(_RECS[2:]))
    out = load_warc(spark, str(p), path_glob="*.warc").collect()
    assert len(out) == 4
    assert {r.source_id.rsplit("/", 1)[-1] for r in out} == {"a.warc", "b.warc"}


def test_warc_to_html_extraction_composes(spark):
    """The full stage-0 chain: WARC demux → response filter → HTML
    extraction — record rows flow, archives are read once."""
    page = f"<html><body><nav><a href='/'>Home</a></nav><p>{PROSE}</p></body></html>"
    blob = encode_warc(
        [("response", "http://a.example/p", b"HTTP/1.1 200 OK\r\n\r\n" + page.encode())]
    )
    df = spark.createDataFrame([("f", bytearray(blob))], "source_id string, content binary")
    recs = warc_records(df).where("warc_type = 'response' AND http_status = 200")
    docs = recs.selectExpr(
        "target_uri", "CAST(payload AS STRING) AS html"
    )
    out = html_extract_text(docs, id_col="target_uri").collect()
    assert len(out) == 1 and out[0].text == PROSE


def test_warc_bytes_to_refinedweb_pipeline_matches_markup_path(spark):
    """Crawl story end-to-end from RAW ARCHIVE BYTES (r13): WARC demux
    → HTML extraction → intra-doc line self-dedup → word gate must
    yield EXACTLY what the markup-origin pipeline yields on the same
    pages — the byte framing adds nothing and loses nothing."""
    body = " ".join(f"tok{i} word" for i in range(15)) + "."
    pages = {
        f"http://h{i}.example/p": (
            "<html><body><nav><a href='/'>Home</a><a href='/x'>X</a></nav>"
            f"<p>menu line</p><p>menu line</p><p>{body} page {i}.</p>"
            "</body></html>"
        )
        for i in range(4)
    }
    recs = [
        ("response", uri, b"HTTP/1.1 200 OK\r\n\r\n" + page.encode())
        for uri, page in sorted(pages.items())
    ]
    # two archives, two records each
    archives = [
        ("a0", bytearray(encode_warc(recs[:2]))),
        ("a1", bytearray(encode_warc(recs[2:]))),
    ]
    df = spark.createDataFrame(archives, "source_id string, content binary")

    def stages(docs):
        from rheoceros_spark.operators.dedup import intradoc_line_dedup

        ext = html_extract_text(docs, id_col="uri").select(
            "uri", F.col("text").alias("etext")
        )
        ded = intradoc_line_dedup(ext, text_col="etext", id_col="uri")
        n_words = F.size(F.split(F.trim(F.col("clean_text")), "[ \n]+"))
        return sorted(
            (r.uri, r.clean_text, r.n_dup_lines)
            for r in ded.where(n_words >= 10).collect()
        )

    via_bytes = stages(
        warc_records(df)
        .where("warc_type = 'response' AND http_status = 200")
        .selectExpr("target_uri AS uri", "CAST(payload AS STRING) AS html")
    )
    direct = stages(
        spark.createDataFrame(sorted(pages.items()), "uri string, html string")
    )
    assert via_bytes == direct and len(via_bytes) == 4
    # the extraction stage already drops the nav/menu boilerplate, so
    # the surviving text is the prose body on both paths
    assert all("tok0 word" in text for _, text, _ in via_bytes)


def test_wet_records_demux_conversion_text(spark, tmp_path):
    """WET = Common Crawl's extracted-text WARC: conversion records
    demux straight to text rows; warcinfo records drop; offsets stay
    byte-exact; load_wet reads from disk via binaryFile."""
    from rheoceros_spark.sources.warc import load_wet, wet_records

    texts = {f"http://w{i}.example/p": f"extracted text {i} — naïve café." for i in range(3)}
    recs = [("warcinfo", None, b"software: test")] + [
        ("conversion", uri, t.encode("utf-8")) for uri, t in sorted(texts.items())
    ]
    blob = encode_warc(recs)
    df = spark.createDataFrame([("w0", bytearray(blob))], "source_id string, content binary")
    out = wet_records(df).orderBy("rec_idx").collect()
    assert [r.rec_idx for r in out] == [1, 2, 3]  # warcinfo (idx 0) dropped
    assert {r.target_uri: r.text for r in out} == texts
    # offsets index back into the real stream
    for r in out:
        rec = scan_warc_stream(blob)[r.rec_idx]
        assert rec.offset == r.byte_offset
    wet_path = tmp_path / "a.wet"
    wet_path.write_bytes(blob)
    disk = load_wet(spark, str(tmp_path), path_glob="*.wet").collect()
    assert sorted(r.text for r in disk) == sorted(texts.values())


# ---------------------------------------------------------------------------
# intra-document line dedup
# ---------------------------------------------------------------------------

def test_intradoc_dedup_keeps_first_occurrence_in_order(spark):
    df = spark.createDataFrame(
        [(1, "menu\nfirst line of text.\nmenu\nsecond line.\nfirst line of text.")],
        "doc_id bigint, text string",
    )
    r = intradoc_line_dedup(df).collect()[0]
    assert r.clean_text == "menu\nfirst line of text.\nsecond line."
    assert (r.n_lines, r.n_kept, r.n_dup_lines) == (5, 3, 2)


def test_intradoc_dedup_whitespace_variants_collapse_but_case_does_not(spark):
    df = spark.createDataFrame(
        [(1, "Cookie  Notice\nCookie Notice\ncookie notice\nreal text here.")],
        "doc_id bigint, text string",
    )
    r = intradoc_line_dedup(df).collect()[0]
    # whitespace-normalized repeat drops (keeps the FIRST original
    # bytes); the case variant is a different key and stays
    assert r.clean_text == "Cookie  Notice\ncookie notice\nreal text here."
    assert r.n_dup_lines == 1


def test_intradoc_dedup_blank_lines_and_null(spark):
    df = spark.createDataFrame(
        [(1, "a real line.\n\n   \na real line."), (2, None)],
        "doc_id bigint, text string",
    )
    out = {r.doc_id: r for r in intradoc_line_dedup(df).collect()}
    assert out[1].clean_text == "a real line."
    assert (out[1].n_lines, out[1].n_kept) == (2, 1)
    assert (out[2].clean_text, out[2].n_lines) == ("", 0)


def test_intradoc_dedup_regex_metachar_sep_is_literal(spark):
    """Regression (r13): ``sep`` is passed to F.split, which reads a
    Java REGEX, while reassembly and the DuckDB twin are literal — a
    '.' or '|' separator must split literally and reassemble
    byte-exact, not split on every character."""
    df = spark.createDataFrame(
        [(1, "alpha.beta.alpha.gamma"), (2, "x|y|x")],
        "doc_id bigint, text string",
    )
    out = {r.doc_id: r for r in intradoc_line_dedup(df, sep=".").collect()}
    assert out[1].clean_text == "alpha.beta.gamma"
    assert (out[1].n_lines, out[1].n_kept, out[1].n_dup_lines) == (4, 3, 1)
    # '|' untouched when sep='.', so doc 2 is one line
    assert (out[2].clean_text, out[2].n_lines) == ("x|y|x", 1)
    out2 = {r.doc_id: r for r in intradoc_line_dedup(df, sep="|").collect()}
    assert out2[2].clean_text == "x|y"
    assert (out2[2].n_lines, out2[2].n_kept) == (3, 2)


def test_stream_twins_match_batch(spark, tmp_path):
    """stream_html_extract and stream_intradoc_line_dedup are stateless
    row-local twins — over a real micro-batch plan they must emit
    exactly the batch operators' rows."""
    from rheoceros_spark.streaming.stream import (
        stream_html_extract,
        stream_intradoc_line_dedup,
    )

    rows = [
        (1, f"<p>{PROSE}</p><div><a href='/'>Home</a> <a href='/a'>About</a> <a href='/b'>More</a></div>"),
        (2, None),
        (3, f"dup line.\n{PROSE}\ndup line."),
        (4, f"<ul><li>{PROSE}</li></ul>"),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, html string")
    src = str(tmp_path / "html_src")
    df.coalesce(2).write.mode("overwrite").parquet(src)

    batch_ext = {
        (r.doc_id, r.text, r.n_blocks, r.n_kept)
        for r in html_extract_text(df).collect()
    }
    ddf = df.selectExpr("doc_id", "coalesce(html, '') AS text")
    batch_ded = {
        (r.doc_id, r.clean_text, r.n_kept)
        for r in intradoc_line_dedup(ddf).collect()
    }

    sdf = spark.readStream.schema(df.schema).parquet(src)
    out_ext, out_ded = [], []
    q1 = (
        stream_html_extract(sdf)
        .writeStream.foreachBatch(lambda b, i: out_ext.extend(b.collect()))
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt_ext"))
        .start()
    )
    q1.awaitTermination(120)
    q2 = (
        stream_intradoc_line_dedup(
            sdf.selectExpr("doc_id", "coalesce(html, '') AS text")
        )
        .writeStream.foreachBatch(lambda b, i: out_ded.extend(b.collect()))
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt_ded"))
        .start()
    )
    q2.awaitTermination(120)
    assert {(r.doc_id, r.text, r.n_blocks, r.n_kept) for r in out_ext} == batch_ext
    assert {(r.doc_id, r.clean_text, r.n_kept) for r in out_ded} == batch_ded


def test_intradoc_dedup_matches_duckdb_twin(spark):
    rows = [
        (1, "x\ny\nx\nz\ny\nx"),
        (2, None),
        (3, "  spaced   line \nspaced line\nother."),
        (4, "single"),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    got = [
        (r.doc_id, r.clean_text, r.n_lines, r.n_kept, r.n_dup_lines)
        for r in intradoc_line_dedup(df).orderBy("doc_id").collect()
    ]
    e = intradoc_line_dedup_duckdb_sql("text")
    con = duckdb.connect()
    con.register("t", pd.DataFrame(rows, columns=["doc_id", "text"]))
    want = con.sql(
        f"""
        WITH a AS (SELECT doc_id, {e['lines']} AS __lines FROM t),
        b AS (SELECT doc_id, __lines, {e['keys']} AS __keys FROM a),
        c AS (SELECT doc_id, __lines, __keys, {e['kept_idx']} AS __kept_idx FROM b)
        SELECT doc_id, {e['clean_text']}, {e['n_lines']}, {e['n_kept']},
               {e['n_lines']} - {e['n_kept']}
        FROM c ORDER BY doc_id
        """
    ).fetchall()
    assert [tuple(w) for w in want] == got
