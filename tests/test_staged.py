"""Staged-query parity gates: operators that ship fully implemented
before a driver-window slot frees up (the registry is capped at 100 —
see the staging comment in __spark_entry__.py).  Every staged query
must hash-match its stashed DuckDB oracle NOW, so later registration
is a bookkeeping move, not a code change.

Round 8 executed the r7-staged plan (dedup_semantic_pairs and
text_quality_classifier are registered queries now); the plan-shape
gates for those two stay here.  The parametrized parity test covers
whatever is staged for the NEXT round."""

import os

import duckdb
import pytest
from pyspark.sql import functions as F

import __spark_entry__ as entry

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    return con


def test_staged_names_are_not_registered_yet():
    staged = set(entry._STAGED_QUERIES)
    assert staged.isdisjoint(set(entry.queries()))
    assert set(entry._STAGED_ORACLES) == staged


@pytest.mark.parametrize(
    "name", sorted(entry._STAGED_QUERIES) or ["__none_staged__"]
)
def test_staged_query_matches_oracle(name, spark, sf_dir, duck):
    if name == "__none_staged__":
        pytest.skip("no queries currently staged")
    df = entry._STAGED_QUERIES[name](spark, sf_dir)
    scols = [c.lower() for c in df.columns]
    srows = sorted(
        tuple("NULL" if v is None else str(v) for v in r) for r in df.collect()
    )
    pdf = duck.sql(entry._STAGED_ORACLES[name]).df()
    assert sorted(c.lower() for c in pdf.columns) == sorted(scols)
    # align oracle column order to the Spark frame's
    pdf = pdf[[c for c in df.columns]]
    drows = sorted(
        tuple("NULL" if v != v or v is None else str(v) for v in r)
        for r in pdf.itertuples(index=False, name=None)
    )
    assert srows == drows and srows, f"{name}: {len(srows)} vs {len(drows)} rows"


def test_semantic_pairs_no_cartesian_and_cluster_blocked(spark, sf_dir):
    from rheoceros_spark.operators.dedup import semantic_dup_pairs
    from rheoceros_spark.sources.io import load_table

    out = semantic_dup_pairs(
        load_table(spark, sf_dir, "embeddings"), threshold=0.4, k=4, iters=1
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    # the assign stage's crossJoin(broadcast(<=k-row centroids)) is the
    # one legitimate nested-loop (constant-size build side); the PAIR
    # join itself must be an equi-join on cell
    assert plan.count("BroadcastNestedLoopJoin") <= 1
    joins = [
        seg.splitlines()[0]
        for seg in plan.split("Join ")[1:]
    ]
    assert any("cell" in j for j in joins), joins
    rows = out.collect()
    # pairs only ever form within one cell
    assert all(r.a < r.b for r in rows)
