"""Third-opinion correctness: pure-Python reference implementations of
the retrieval/selection operators, compared row-for-row against the
Spark operators on seeded randomized corpora.

The DuckDB oracles prove cross-ENGINE agreement of the same formula;
these prove the formula itself — an independently coded BM25 / span
counter / DSIR model with no shared helpers (plain dict/list code, its
own tokenizer) must produce identical numbers.
"""

import math
import random
from decimal import ROUND_HALF_UP, Decimal


def _round6(x):
    """Java/DuckDB-style HALF_UP decimal rounding (Python's round() is
    banker's — a 7th-digit tie would flip the last decimal)."""
    return float(Decimal(repr(x)).quantize(Decimal("0.000001"), ROUND_HALF_UP))


def _round_int(x):
    """HALF_UP to an integer — the 1e-7 grid quantization twin."""
    return int(Decimal(repr(x)).quantize(Decimal("1"), ROUND_HALF_UP))

import pytest
from pyspark.sql import functions as F

from rheoceros_spark.operators import bm25_topk, dsir_weights, substring_dup_spans

WORDS = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta", "theta", "iota", "kappa"]


def _random_docs(seed, n_docs, min_len=3, max_len=30):
    rng = random.Random(seed)
    return [
        (i, " ".join(rng.choice(WORDS) for _ in range(rng.randint(min_len, max_len))))
        for i in range(n_docs)
    ]


def _tok(text):
    return [t for t in text.lower().split() if t]


# ---------------------------------------------------------------------------
# BM25
# ---------------------------------------------------------------------------

def _py_bm25(corpus, queries, k1=1.2, b=0.75, k=5):
    dls = {i: len(_tok(t)) for i, t in corpus}
    n = float(len(corpus))
    avgdl = sum(dls.values()) / n
    tfs = {}
    for i, t in corpus:
        for tok in _tok(t):
            tfs.setdefault(tok, {}).setdefault(i, 0)
            tfs[tok][i] += 1
    out = []
    for qid, qtext in queries:
        scores = {}
        for term in sorted(set(_tok(qtext))):
            postings = tfs.get(term, {})
            if not postings:
                continue
            df = float(len(postings))
            idf = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
            for doc, tf in postings.items():
                tfn = (tf * (k1 + 1.0)) / (
                    tf + k1 * (1.0 - b + b * dls[doc] / avgdl)
                )
                scores.setdefault(doc, 0)
                scores[doc] += _round_int(idf * tfn * 1e7)  # same 1e-7 grid, HALF_UP
        ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
        for rank, (doc, sq) in enumerate(ranked, 1):
            out.append((qid, doc, sq / 1e7, rank))
    return sorted(out)


@pytest.mark.parametrize("seed", [11, 42])
def test_bm25_matches_python_reference(spark, seed):
    corpus = _random_docs(seed, 40)
    queries = [(100 + j, " ".join(random.Random(seed + j).sample(WORDS, 3))) for j in range(4)]
    got = sorted(
        (r.query_id, r.doc_id, r.score, r.rank)
        for r in bm25_topk(
            spark.createDataFrame(corpus, "doc_id bigint, text string"),
            spark.createDataFrame(queries, "query_id bigint, text string"),
            k=5,
        ).collect()
    )
    assert got == _py_bm25(corpus, queries)


# ---------------------------------------------------------------------------
# substring duplicate spans
# ---------------------------------------------------------------------------

def _py_spans(corpus, window):
    spans = []  # (doc, span tuple)
    for i, t in corpus:
        toks = _tok(t)
        for p in range(len(toks) - window + 1):
            spans.append((i, tuple(toks[p : p + window])))
    counts = {}
    for _, s in spans:
        counts[s] = counts.get(s, 0) + 1
    out = {}
    for i, t in corpus:
        mine = [s for d, s in spans if d == i]
        nw = len(mine)
        nd = sum(1 for s in mine if counts[s] > 1)
        out[i] = (nw, nd, _round6(nd / nw) if nw else None)
    return out


@pytest.mark.parametrize("seed", [7])
def test_substring_spans_match_python_reference(spark, seed):
    corpus = _random_docs(seed, 30, min_len=2, max_len=12)
    res = {
        r.doc_id: (r.n_windows, r.n_dup_windows, r.dup_window_frac)
        for r in substring_dup_spans(
            spark.createDataFrame(corpus, "doc_id bigint, text string"), window=4
        ).collect()
    }
    assert res == _py_spans(corpus, 4)


# ---------------------------------------------------------------------------
# DSIR
# ---------------------------------------------------------------------------

def _py_dsir(raw, target, n_buckets):
    import hashlib

    def h64(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    def feats(text):
        toks = _tok(text)
        grams = (
            [" ".join(toks[p : p + 2]) for p in range(len(toks) - 1)]
            if len(toks) >= 2
            else [" ".join(toks)]
        )
        return [h64(g) % n_buckets for g in grams]

    tc, rc = {}, {}
    for _, t in target:
        for b in feats(t):
            tc[b] = tc.get(b, 0) + 1
    per_doc = {}
    for i, t in raw:
        per_doc[i] = {}
        for b in feats(t):
            per_doc[i][b] = per_doc[i].get(b, 0) + 1
            rc[b] = rc.get(b, 0) + 1
    T, R = sum(tc.values()), sum(rc.values())
    out = {}
    for i, buckets in per_doc.items():
        total_q = 0
        for b, cnt in buckets.items():
            lr = math.log((tc.get(b, 0) + 1) / (T + n_buckets)) - math.log(
                (rc.get(b, 0) + 1) / (R + n_buckets)
            )
            total_q += cnt * _round_int(lr * 1e7)
        # not re-rounded to 6dp — mirrors the operator (integer sum /
        # 1e7 is bit-identical everywhere; a decimal re-round splits
        # engines at half-way points, caught by the sf1 hash gate)
        out[i] = (sum(buckets.values()), total_q / 1e7)
    return out


def test_dsir_matches_python_reference(spark):
    target = _random_docs(1, 25)
    raw = [(100 + i, t) for i, t in _random_docs(2, 20)]
    res = {
        r.doc_id: (r.n_feats, r.dsir_logw)
        for r in dsir_weights(
            spark.createDataFrame(raw, "doc_id bigint, text string"),
            spark.createDataFrame(target, "doc_id bigint, text string"),
            n_buckets=128,
        ).collect()
    }
    assert res == _py_dsir(raw, target, 128)


# ---------------------------------------------------------------------------
# Winnowing fingerprints (round 11 session 3)
# ---------------------------------------------------------------------------

def _h64_py(s: str) -> int:
    import hashlib

    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _py_winnow(corpus, n, w):
    """Independent winnowing model: word n-grams → md5-prefix hashes →
    per-window minima (value set), short docs keep the global min."""
    out = {}
    for i, text in corpus:
        toks = _tok(text)
        if len(toks) < n:
            out[i] = set()
            continue
        hs = [
            _h64_py(" ".join(toks[j : j + n]))
            for j in range(len(toks) - n + 1)
        ]
        if len(hs) < w:
            out[i] = {min(hs)}
        else:
            out[i] = {min(hs[j : j + w]) for j in range(len(hs) - w + 1)}
    return out


@pytest.mark.parametrize("seed,n,w", [(11, 3, 4), (23, 2, 8), (37, 4, 2)])
def test_winnow_matches_python_reference(spark, seed, n, w):
    from rheoceros_spark.operators.dedup import winnow_fingerprints

    corpus = _random_docs(seed, 60, min_len=1, max_len=40)
    df = spark.createDataFrame(corpus, "doc_id bigint, text string")
    got = {}
    for r in winnow_fingerprints(df, n=n, w=w).collect():
        got.setdefault(r["doc_id"], set()).add(r["fp"])
    want = _py_winnow(corpus, n, w)
    want = {i: s for i, s in want.items() if s}  # empty sets emit no rows
    assert got == want


# ---------------------------------------------------------------------------
# Character entropy (round 11 session 3)
# ---------------------------------------------------------------------------

def _py_char_entropy(text):
    """Independent quantized-entropy model over the normalized text."""
    import re

    norm = re.sub(r"[ \t\n\f\r]+", " ", text.lower()).strip(" ")
    L = len(norm)
    if L == 0:
        return (0, 0, 0)
    counts = {}
    for c in norm:
        counts[c] = counts.get(c, 0) + 1
    sq = sum(
        c * int(math.floor(math.log(float(c)) * 1e7 + 0.5))
        for c in counts.values()
    )
    hq = int(math.floor((math.log(float(L)) - sq / (1e7 * L)) * 1e6 + 0.5))
    return (L, len(counts), hq)


@pytest.mark.parametrize("seed", [5, 17])
def test_char_entropy_matches_python_reference(spark, seed):
    from rheoceros_spark.operators.text_analysis import char_entropy

    corpus = _random_docs(seed, 50, min_len=1, max_len=60)
    # splice in structured edge rows the random corpus can't produce
    corpus += [(100, "zzzzzzzz"), (101, "  "), (102, "a b a b 0 1 ! ?")]
    df = spark.createDataFrame(corpus, "doc_id bigint, text string")
    got = {
        r["doc_id"]: (r["doc_len"], r["n_char_classes"], r["entropy_q"])
        for r in char_entropy(df).collect()
    }
    for i, text in corpus:
        assert got[i] == _py_char_entropy(text), (i, text)


# ---------------------------------------------------------------------------
# Temperature mix plan (round 11 session 3)
# ---------------------------------------------------------------------------

def _py_temperature_plan(groups, k16, target_frac):
    """Independent plan model: the same sqrt-composition and fixed IEEE
    order as the documented formula."""
    def spow(x):
        out, r = None, float(x)
        for i in range(1, 5):
            r = math.sqrt(r)
            if (k16 >> (4 - i)) & 1:
                out = r if out is None else out * r
        return x if k16 == 16 else (out if out is not None else 1.0)

    pa = {g: int(math.floor(spow(c) * 1_000_000 + 0.5)) for g, c in groups.items()}
    sa, nn = sum(pa.values()), sum(groups.values())
    return {
        g: int(
            math.floor(
                min(1.0, target_frac * float(nn) * float(pa[g]) / float(sa) / float(c))
                * 1_000_000
                + 0.5
            )
        )
        for g, c in groups.items()
    }


@pytest.mark.parametrize("seed,k16,frac", [(3, 5, 0.5), (9, 2, 0.25), (13, 16, 0.8)])
def test_temperature_plan_matches_python_reference(spark, seed, k16, frac):
    from rheoceros_spark.operators.curation import temperature_mix_plan

    rng = random.Random(seed)
    groups = {f"g{j}": rng.randint(1, 500) for j in range(8)}
    rows = []
    i = 0
    for g, c in groups.items():
        for _ in range(c):
            rows.append((i, "t", g))
            i += 1
    df = spark.createDataFrame(rows, "doc_id bigint, text string, lang string")
    plan = {
        r["lang"]: r["rate_q"]
        for r in temperature_mix_plan(
            df, group_col="lang", alpha=k16 / 16, target_frac=frac
        ).collect()
    }
    assert plan == _py_temperature_plan(groups, k16, frac)
