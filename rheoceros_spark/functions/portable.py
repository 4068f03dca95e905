"""Portable (Spark ⇄ ANSI-SQL/DuckDB) column helpers.

The dedup / similarity / text-analysis operators must be verifiable
against an independent SQL oracle (BASELINE.json's correctness gate),
so every hash and tokenization primitive here has an **exactly
equivalent** DuckDB expression (the ``*_SQL`` templates).  The core
trick is a seedable 60-bit hash from an md5 hex prefix:

    Spark :  conv(substring(md5(s), 1, 15), 16, 10) :: bigint
    DuckDB:  CAST(('0x' || substr(md5(s), 1, 15)) AS BIGINT)

60 bits keeps the value inside a signed 64-bit int on both engines.
All helpers are built-in-function compositions — JVM-side, inside
whole-stage codegen, no Python UDFs in the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


# ---------------------------------------------------------------------------
# portable 60-bit hash family
# ---------------------------------------------------------------------------

def h64(col: Column, seed: int | None = None) -> Column:
    """Deterministic 60-bit hash of a string column, optionally seeded.

    ``F.concat`` (NULL-propagating), NOT ``concat_ws`` (NULL-skipping):
    a NULL input must hash to NULL, or every NULL key would share one
    constant bucket and e.g. ``hash_sample`` would keep/drop the whole
    NULL cohort together.  For non-NULL inputs the produced string —
    ``"<seed>:<value>"`` — is unchanged."""
    s = F.concat(F.lit(f"{seed}:"), col) if seed is not None else col
    return F.conv(F.substring(F.md5(s), 1, 15), 16, 10).cast("bigint")


def h64_sql(expr: str, seed: str | None = None) -> str:
    """DuckDB-equivalent of :func:`h64`. ``seed`` may be a SQL expression.

    ``||``, NOT ``concat``: DuckDB's ``concat`` SKIPS NULL arguments
    (``concat('0', ':', NULL) = '0:'``) while Spark's ``F.concat``
    propagates them — a NULL input must hash to NULL on BOTH engines
    (the :func:`h64` contract), or a seeded oracle would probe the real
    hash of ``'<seed>:'`` where the engine yields NULL."""
    s = f"(({seed}) || ':' || ({expr}))" if seed is not None else expr
    return f"CAST(('0x' || substr(md5({s}), 1, 15)) AS BIGINT)"


# ---------------------------------------------------------------------------
# text normalization / tokenization
# ---------------------------------------------------------------------------

def normalize_text(col: Column) -> Column:
    """lower + collapse whitespace + trim.

    The whitespace class is spelled out as ``[ \\t\\n\\f\\r]`` rather
    than Java's ``\\s``: Java's ``\\s`` also matches vertical tab
    (``\\x0B``) while RE2's (DuckDB's) does not, so ``\\s+`` here and
    ``\\s+`` in the SQL twin silently disagree on \\x0B-bearing text.
    The explicit class is exactly RE2's ``\\s``, which keeps every
    ``'\\s+'``-based oracle string valid and the behavior engine-
    independent (pinned by tests/test_portable_parity.py, which feeds
    \\x0B through both engines)."""
    return F.trim(F.regexp_replace(F.lower(col), "[ \t\n\f\r]+", " "))


NORMALIZE_SQL = "trim(regexp_replace(lower({c}), '\\s+', ' ', 'g'))"


def tokens(col: Column) -> Column:
    """Whitespace tokens of normalized text."""
    return F.split(normalize_text(col), " ")


TOKENS_SQL = "string_split(" + NORMALIZE_SQL + ", ' ')"


def word_ngrams(toks: Column, n: int) -> Column:
    """Overlapping word n-grams (each joined with a single space)."""
    return F.transform(
        F.sequence(F.lit(1), F.greatest(F.lit(1), F.size(toks) - F.lit(n - 1))),
        lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
    )


def word_ngrams_sql(toks: str, n: int) -> str:
    # DuckDB: range(a, b) excludes b; list_slice is inclusive of both ends
    return (
        f"list_transform(range(1, greatest(1, len({toks}) - {n - 1}) + 1), "
        f"i -> array_to_string(list_slice({toks}, i, i + {n - 1}), ' '))"
    )


def char_ngrams(col: Column, n: int) -> Column:
    """Overlapping character n-grams of a (pre-normalized) string."""
    return F.transform(
        F.sequence(F.lit(1), F.greatest(F.lit(1), F.length(col) - F.lit(n - 1))),
        lambda i: col.substr(i, F.lit(n)),
    )


def char_ngrams_sql(expr: str, n: int) -> str:
    return (
        f"list_transform(range(1, greatest(1, length({expr}) - {n - 1}) + 1), "
        f"i -> substr({expr}, i, {n}))"
    )


# ---------------------------------------------------------------------------
# set similarity
# ---------------------------------------------------------------------------

def jaccard(a: Column, b: Column) -> Column:
    """Jaccard similarity of two (distinct-element) arrays, as double.

    Integer-operand double division — bit-identical on any IEEE-754
    engine, so no rounding is needed for oracle comparison.
    """
    inter = F.size(F.array_intersect(a, b)).cast("double")
    union = F.size(F.array_union(a, b)).cast("double")
    return F.when(union > 0, inter / union).otherwise(F.lit(0.0))


def jaccard_sql(a: str, b: str) -> str:
    return (
        f"CASE WHEN len(list_distinct(list_concat({a}, {b}))) > 0 "
        f"THEN CAST(len(list_intersect({a}, {b})) AS DOUBLE) / "
        f"CAST(len(list_distinct(list_concat({a}, {b}))) AS DOUBLE) ELSE 0.0 END"
    )


# ---------------------------------------------------------------------------
# vector math (embeddings)
# ---------------------------------------------------------------------------

def dot(a: Column, b: Column) -> Column:
    """Sequential left-fold dot product in double — accumulation order
    is defined (element order), matching an order-preserving SQL fold."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def cosine(a: Column, b: Column) -> Column:
    # try_divide: a zero-norm vector yields NULL (sorts last under the
    # engine's desc ordering) instead of ANSI DIVIDE_BY_ZERO — the SQL
    # twin guards with nullif the same way
    return F.try_divide(dot(a, b), F.sqrt(dot(a, a)) * F.sqrt(dot(b, b)))


def dot_sql(a: str, b: str) -> str:
    # list_reduce folds left-to-right; zip via index transform
    return (
        f"list_reduce(list_prepend(0.0, list_transform(range(1, len({a}) + 1), "
        f"i -> CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE))), (acc, x) -> acc + x)"
    )


def cosine_sql(a: str, b: str) -> str:
    return f"({dot_sql(a, b)} / nullif(sqrt({dot_sql(a, a)}) * sqrt({dot_sql(b, b)}), 0))"
