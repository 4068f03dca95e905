"""HTML → main-content text extraction — the true stage 0 of a crawl
pipeline (RefinedWeb, Penedo et al. 2023 §3: "extraction is the most
costly stage"; C4, Raffel et al. 2020 §2.2 and CCNet, Wenzek et al.
2020 §2 both start from extracted page text).

The extractor is a jusText-style (Pomikálek 2011) block classifier
re-expressed as PURE COLUMN ALGEBRA so it runs inside one codegen'd
scan stage with zero shuffle at any corpus size:

1. strip comments and ``<script>/<style>/<noscript>`` subtrees;
2. mark anchor spans with sentinel chars (so link density survives tag
   stripping);
3. turn block-level tags into line breaks (block segmentation);
4. strip remaining inline tags, decode the common entities;
5. per block: length / word / alpha counts and LINK DENSITY in exact
   integer arithmetic, keep blocks that look like prose
   (jusText's core heuristic: boilerplate is short and link-dense);
6. re-join kept blocks with ``\\n``.

Every regex stays inside the Java-regex ∩ RE2 common subset (no
backreferences, no lookaround, explicit whitespace classes) so the
DuckDB twin (:func:`html_extract_duckdb_sql`) is value-identical —
the same determinism contract as ``operators/urls.py``.

Reference parity: the reference engine has no extraction stage either
(user code supplies text); this family closes the pre-URL gap a real
100 TB crawl pipeline needs.  Public-knowledge heuristics only.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "HTML_BLOCK_TAGS",
    "HTML_DROP_TAGS",
    "html_extract_text",
    "html_blocks",
    "html_extract_duckdb_sql",
]

#: subtree-dropping tags — content is never page text
HTML_DROP_TAGS = ("script", "style", "noscript")

#: block-level tags — each open/close is a segmentation point.  ``br``
#: and ``hr`` segment too (they terminate a visual line).
HTML_BLOCK_TAGS = (
    "p|div|h[1-6]|li|ul|ol|table|tr|td|th|section|article|header|"
    "footer|nav|blockquote|pre|aside|main|form|br|hr"
)

#: anchor sentinels — control chars no real page text uses; any
#: pre-existing occurrences are stripped first so crafted input cannot
#: forge link spans
_S1 = "\x01"  # <a ...>
_S2 = "\x02"  # </a>

#: entity decode chain, applied AFTER tag stripping.  ``&amp;`` is
#: deliberately LAST: ``&amp;lt;`` decodes to the literal ``&lt;`` (the
#: earlier pass saw no ``&lt;`` token), matching standard decoders.
_ENTITIES = (
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&apos;", "'"),
    ("&nbsp;", " "),
    ("&amp;", "&"),
)

#: whitespace class for normalization — explicit (no ``\s``: Java
#: includes U+000B, RE2 doesn't) and INCLUDING the sentinels, so
#: removing an anchor marker never glues or doubles spaces
_WS = "[ \\t\\r\\f\x01\x02]+"
#: same class without the sentinels (used inside link spans)
_LINK_SPAN = "\x01[^\x01\x02]*\x02"


def _strip_to_blocks(col: Column) -> Column:
    """html string → block-segmented visible text with anchor
    sentinels (steps 1–4 above); one chained per-row expression."""
    h = F.coalesce(col, F.lit(""))
    h = F.replace(h, F.lit(_S1), F.lit(""))
    h = F.replace(h, F.lit(_S2), F.lit(""))
    h = F.regexp_replace(h, r"(?is)<!--.*?-->", " ")
    for t in HTML_DROP_TAGS:
        h = F.regexp_replace(h, rf"(?is)<{t}\b[^>]*>.*?</{t}[ \t]*>", " ")
    h = F.regexp_replace(h, r"(?is)<a\b[^>]*>", _S1)
    h = F.regexp_replace(h, r"(?is)</a[ \t]*>", _S2)
    h = F.regexp_replace(h, rf"(?is)</?({HTML_BLOCK_TAGS})\b[^>]*>", "\n")
    h = F.regexp_replace(h, r"<[^>]*>", " ")
    for src, dst in _ENTITIES:
        h = F.replace(h, F.lit(src), F.lit(dst))
    return h


def _block_struct(l: Column) -> Column:
    """Per-block stats as a struct — all exact-integer, row-local."""
    vis = F.trim(F.regexp_replace(l, _WS, " "))
    n_chars = F.length(vis)
    n_words = F.when(n_chars == 0, F.lit(0)).otherwise(
        F.size(F.split(vis, " "))
    )
    n_alpha = F.length(F.regexp_replace(vis, "[^A-Za-z]", ""))
    link_chars = F.aggregate(
        F.regexp_extract_all(l, F.lit(_LINK_SPAN), F.lit(0)),
        F.lit(0),
        lambda acc, s: acc
        + F.length(F.trim(F.regexp_replace(s, _WS, " "))),
    )
    return F.struct(
        vis.alias("text"),
        n_chars.cast("long").alias("n_chars"),
        n_words.cast("long").alias("n_words"),
        n_alpha.cast("long").alias("n_alpha"),
        link_chars.cast("long").alias("link_chars"),
    )


def _kept(b: Column, min_chars: int, min_words: int, max_link_pct: int, min_alpha_pct: int) -> Column:
    """jusText-lite keep rule in exact integer arithmetic (no float
    ratio seam): prose blocks are long enough, wordy enough, not
    link-dominated, and mostly alphabetic."""
    return (
        (b["n_chars"] >= min_chars)
        & (b["n_words"] >= min_words)
        & (b["link_chars"] * 100 <= b["n_chars"] * max_link_pct)
        & (b["n_alpha"] * 100 >= b["n_chars"] * min_alpha_pct)
    )


def html_extract_text(
    df: DataFrame,
    html_col: str = "html",
    id_col: str = "doc_id",
    min_block_chars: int = 25,
    min_block_words: int = 3,
    max_link_density_pct: int = 33,
    min_alpha_pct: int = 40,
) -> DataFrame:
    """Extract main-content text from an HTML column (module doc for
    the algorithm).  Adds ``text`` (kept blocks joined with ``\\n``),
    ``n_blocks`` (non-empty visible blocks), ``n_kept`` and ``n_chars``
    (of the extracted text); drops the html column.

    Thresholds are INTEGER PERCENTAGES so the keep rule is exact on
    both engines (``link_chars·100 ≤ n_chars·max_link_density_pct``).

    Scale shape: entirely row-local — regex chain + array HOFs inside
    ONE codegen'd scan stage; zero shuffle, no UDFs, the raw html never
    leaves its partition.  At 100 TB this is the dominant-cost stage of
    a crawl pipeline (RefinedWeb §3) and it scales embarrassingly."""
    if min(min_block_chars, min_block_words) < 1:
        raise ValueError("html_extract_text: min_block_chars/words must be >= 1")
    if not (0 <= max_link_density_pct <= 100 and 0 <= min_alpha_pct <= 100):
        raise ValueError("html_extract_text: percentage thresholds must be in [0, 100]")
    blocks = F.transform(
        F.split(_strip_to_blocks(F.col(html_col)), "\n"), _block_struct
    )
    # staged projections: each step references the MATERIALIZED column
    # of the previous one, and a plan barrier pins the regex chain into
    # ONE evaluation — CollapseProject has no cost guard and would
    # otherwise inline the chain into each of the four output columns
    # (the urls.py staged-projection discipline)
    from rheoceros_spark.operators.scale import ensure_parallelism, plan_barrier

    # fan the scan to cluster width before the regex/HOF chain (r14):
    # extraction is the per-row CPU body of the crawl pipeline, and a
    # single-file corpus otherwise runs the whole stage on one core.
    # At 100 TB the input arrives pre-split and this is a no-op, so the
    # "zero shuffle at scale" contract stands; the plan gates allow
    # exactly this round-robin fan and still forbid keyed exchanges.
    out = (
        plan_barrier(
            ensure_parallelism(df).withColumn(
                "__blocks", F.filter(blocks, lambda b: b["n_chars"] > 0)
            ),
            "html_extract_blocks",
        )
        .withColumn(
            "__kept",
            F.filter(
                F.col("__blocks"),
                lambda b: _kept(
                    b,
                    min_block_chars,
                    min_block_words,
                    max_link_density_pct,
                    min_alpha_pct,
                ),
            ),
        )
        .withColumn(
            "text",
            F.array_join(
                F.transform(F.col("__kept"), lambda b: b["text"]), "\n"
            ),
        )
    )
    return out.select(
        *[c for c in df.columns if c != html_col],
        "text",
        F.size("__blocks").cast("long").alias("n_blocks"),
        F.size("__kept").cast("long").alias("n_kept"),
        F.length("text").cast("long").alias("n_chars"),
    )


def html_blocks(
    df: DataFrame,
    html_col: str = "html",
    id_col: str = "doc_id",
    min_block_chars: int = 25,
    min_block_words: int = 3,
    max_link_density_pct: int = 33,
    min_alpha_pct: int = 40,
) -> DataFrame:
    """Exploded per-block twin of :func:`html_extract_text` — one row
    per non-empty visible block with its stats and keep verdict, for
    inspection, threshold tuning, and the hand-written extraction
    matrix in tests.  Same expressions, so block verdicts here and the
    document text there can never disagree."""
    blocks = F.transform(
        F.split(_strip_to_blocks(F.col(html_col)), "\n"), _block_struct
    )
    nonempty = F.filter(blocks, lambda b: b["n_chars"] > 0)
    out = df.select(
        id_col, F.posexplode(nonempty).alias("block_idx", "__b")
    )
    b = F.col("__b")
    return out.select(
        id_col,
        F.col("block_idx").cast("long").alias("block_idx"),
        b["text"].alias("text"),
        b["n_chars"].alias("n_chars"),
        b["n_words"].alias("n_words"),
        b["n_alpha"].alias("n_alpha"),
        b["link_chars"].alias("link_chars"),
        _kept(b, min_block_chars, min_block_words, max_link_density_pct, min_alpha_pct)
        .cast("int")
        .alias("kept"),
    )


def html_extract_duckdb_sql(
    html_expr: str,
    min_block_chars: int = 25,
    min_block_words: int = 3,
    max_link_density_pct: int = 33,
    min_alpha_pct: int = 40,
) -> dict[str, str]:
    """DuckDB twin of :func:`html_extract_text`: returns SQL
    expressions (dict with keys ``text``, ``n_blocks``, ``n_kept``,
    ``n_chars``) over ``html_expr``, value-identical to the Spark
    operator — the oracle-builder pattern of
    ``urls.canonical_url_duckdb_query``.  RE2 notes: global
    replacement needs the ``'g'`` option (Java is global by default);
    inline ``(?is)`` flags and explicit whitespace classes are shared
    syntax."""
    h = f"coalesce({html_expr}, '')"
    h = f"replace(replace({h}, '\x01', ''), '\x02', '')"
    h = f"regexp_replace({h}, '(?is)<!--.*?-->', ' ', 'g')"
    for t in HTML_DROP_TAGS:
        h = (
            f"regexp_replace({h}, '(?is)<{t}\\b[^>]*>.*?</{t}[ \\t]*>', ' ', 'g')"
        )
    h = f"regexp_replace({h}, '(?is)<a\\b[^>]*>', '\x01', 'g')"
    h = f"regexp_replace({h}, '(?is)</a[ \\t]*>', '\x02', 'g')"
    h = (
        f"regexp_replace({h}, '(?is)</?({HTML_BLOCK_TAGS})\\b[^>]*>', "
        f"chr(10), 'g')"
    )
    h = f"regexp_replace({h}, '<[^>]*>', ' ', 'g')"
    for src, dst in _ENTITIES:
        lit = dst.replace("'", "''")
        h = f"replace({h}, '{src}', '{lit}')"
    ws = "[ \\t\\r\\f\x01\x02]+"
    vis = f"trim(regexp_replace(b, '{ws}', ' ', 'g'))"
    link = (
        "list_reduce(list_prepend(0, list_transform("
        f"regexp_extract_all(b, '\x01[^\x01\x02]*\x02'), "
        f"s -> length(trim(regexp_replace(s, '{ws}', ' ', 'g'))))), "
        "(acc, x) -> acc + x)"
    )
    stats = (
        f"list_transform(string_split({h}, chr(10)), b -> struct_pack("
        f"txt := {vis}, lnk := {link}))"
    )
    blocks = (
        f"list_filter(list_transform({stats}, s -> struct_pack("
        "txt := s.txt, n_chars := length(s.txt), "
        "n_words := CASE WHEN length(s.txt) = 0 THEN 0 "
        "ELSE len(string_split(s.txt, ' ')) END, "
        "n_alpha := length(regexp_replace(s.txt, '[^A-Za-z]', '', 'g')), "
        "lnk := s.lnk)), b -> b.n_chars > 0)"
    )
    kept = (
        f"list_filter(__blocks, b -> b.n_chars >= {min_block_chars} "
        f"AND b.n_words >= {min_block_words} "
        f"AND b.lnk * 100 <= b.n_chars * {max_link_density_pct} "
        f"AND b.n_alpha * 100 >= b.n_chars * {min_alpha_pct})"
    )
    return {
        "blocks": blocks,
        "kept": kept,
        # coalesce: DuckDB's array_to_string returns NULL on an empty
        # list where Spark's array_join returns '' — a zero-kept page
        # must extract to the empty string on both engines
        "text": (
            "coalesce(array_to_string("
            "list_transform(__kept, b -> b.txt), chr(10)), '')"
        ),
    }
