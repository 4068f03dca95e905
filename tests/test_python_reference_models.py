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
