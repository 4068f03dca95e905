"""Retrieval-quality floor for the approximate-ANN family.

The CORRECTNESS oracles certify the ANN operators' *determinism*; this
suite pins their *retrieval quality*: recall@10 vs the brute-force twin
on a clustered synthetic corpus (the geometry real embedding spaces
have) must stay >= 0.9 at the documented default settings.  The full
(n_probe, rerank) evidence sweep — including the adversarial
near-orthogonal sf corpus where cell pruning necessarily loses
near-ties — lives in scripts/ann_recall.py and BASELINE.md §4.

Reference anchor: the reference's slot surface runs arbitrary
retrieval code (api_ext.py:107-190); recall floors are this engine's
quality contract for the ANN operators it ships natively.
"""

import pytest
from pyspark.sql import functions as F

from rheoceros_spark.operators.similarity import (
    cosine_topk,
    ivf_probe,
    ivf_write,
    ivfpq_probe,
    ivfpq_write,
    recall_at_k,
)

K = 10
N, DIM, N_CLUSTERS = 600, 32, 4


@pytest.fixture(scope="module")
def clustered(spark):
    """Deterministic clustered unit-ish vectors (same generator as
    scripts/ann_recall.py, scaled down): cluster c concentrates on a
    contiguous coordinate block, each member perturbed by a small
    id-dependent offset so in-cluster neighbours differ."""
    width = DIM // N_CLUSTERS
    rows = []
    for i in range(N):
        c = i % N_CLUSTERS
        vec = [0.0] * DIM
        for j in range(c * width, (c + 1) * width):
            vec[j] = 1.0
        for j in range(DIM):
            vec[j] += 0.05 * (((i * 31 + j * 7) % 11) - 5)
        rows.append((i, [float(x) for x in vec]))
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


QIDS = [0, 97, 194, 291, 388, 485, 582]


def _mean_recall(probe_fn, clustered):
    recs = []
    for qid in QIDS:
        qv = [
            float(x)
            for x in clustered.where(F.col("vec_id") == qid).first().embedding
        ]
        exact = cosine_topk(clustered, query_id=qid, k=K)
        recs.append(recall_at_k(probe_fn(qv, qid), exact))
    return sum(recs) / len(recs)


def test_ivf_default_settings_recall_floor(spark, clustered, tmp_path):
    """ivf_probe at its documented default (n_probe=4 of 8 cells) must
    recover >= 0.9 of the exact top-10 on clustered geometry."""
    path = str(tmp_path / "ivf")
    ivf_write(clustered, path, n_centroids=8)
    rec = _mean_recall(
        lambda qv, qid: ivf_probe(spark, path, qv, k=K, n_probe=4, exclude_id=qid),
        clustered,
    )
    assert rec >= 0.9, f"ivf recall@10={rec:.3f} below floor at defaults"


def test_ivfpq_default_settings_recall_floor(spark, clustered, tmp_path):
    """ivfpq_probe at its documented defaults (n_probe=2, rerank=50)
    must recover >= 0.9 of the exact top-10 on clustered geometry."""
    path = str(tmp_path / "ivfpq")
    ivfpq_write(clustered, path, n_cells=8, iters=2, n_codes=16, m=4)
    rec = _mean_recall(
        lambda qv, qid: ivfpq_probe(
            spark, path, qv, k=K, n_probe=2, rerank=50, exclude_id=qid
        ),
        clustered,
    )
    assert rec >= 0.9, f"ivfpq recall@10={rec:.3f} below floor at defaults"


def test_recall_at_k_helper_contract(spark, clustered):
    """recall_at_k: 1.0 on identical frames, proportional on partial
    overlap, loud on an empty exact set."""
    exact = cosine_topk(clustered, query_id=0, k=K)
    assert recall_at_k(exact, exact) == 1.0
    half = exact.orderBy("rank").limit(K // 2)
    assert recall_at_k(half, exact) == 0.5
    empty = exact.where(F.lit(False))
    with pytest.raises(ValueError, match="empty"):
        recall_at_k(exact, empty)
