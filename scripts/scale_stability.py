"""Scale-stability probe: run the heavy corpus operators at sf0.1 AND
at a 10x corpus ("sf1"), assert ~linear wall-time growth, and stage a
directory the DuckDB oracle harness can re-hash at the larger scale.

The 10x corpus is derived deterministically from the driver's sf0.1
``documents`` table (TESTDATA.md inputs only — no synthetic rows):
replica k offsets doc_id by k * 1_000_000 and prefixes every
non-initial token with ``k<k>q`` so replica shingle/token sets are
DISJOINT.  That keeps the near-dup structure per replica identical to
sf0.1 while content grows 10x — the corpus-linear shape the operators
claim.  A plain 10x copy would instead make every doc a 10-way exact
dup and grow pair output quadratically in replicas, measuring the
DATA's pathology rather than the engine's scaling.

Usage:
  python scripts/scale_stability.py [--build-only]

Outputs one JSON line:
  {"ops": {name: {"sf01_sec": s, "sf1_sec": s, "growth": r}}, ...}

Then re-hash the non-quadratic set at sf1 with:
  python scripts/check_oracle.py /tmp/scale_sf1 dedup_substring_spans \
      text_bm25_topk curation_dsir_weights text_unigram_nll text_repetition
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

SF01 = "/root/testdata/sf0.1"
SF1 = os.environ.get("SPARK_GRAFT_SF1_DIR", "/tmp/scale_sf1")
REPLICAS = 10
ID_OFFSET = 1_000_000


def build_sf1(spark) -> None:
    os.makedirs(SF1, exist_ok=True)
    docs = spark.read.parquet(f"{SF01}/documents.parquet")
    parts = []
    for k in range(REPLICAS):
        r = docs.withColumn("doc_id", F.col("doc_id") + F.lit(k * ID_OFFSET))
        if k > 0:
            r = r.withColumn(
                "text", F.regexp_replace(F.col("text"), " ", f" k{k}q")
            ).withColumn("n_chars", F.length("text").cast("long"))
        parts.append(r.select("doc_id", "text", "lang", "source", "n_chars"))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    out.repartition(32).write.mode("overwrite").parquet(f"{SF1}/documents.tmp")
    # the loaders expect {dir}/documents.parquet; keep the written dir
    import shutil

    final = f"{SF1}/documents.parquet"
    if os.path.islink(final) or os.path.isfile(final):
        os.remove(final)
    elif os.path.isdir(final):
        shutil.rmtree(final)
    os.rename(f"{SF1}/documents.tmp", final)
    # other tables: symlink the sf0.1 parquet so any query runs here
    for t in (
        "region nation customer supplier part orders lineitem events embeddings"
    ).split():
        link = f"{SF1}/{t}.parquet"
        if not os.path.exists(link):
            os.symlink(f"{SF01}/{t}.parquet", link)


def heavy_ops(queries):
    from rheoceros_spark.operators import minhash_lsh_pairs, simhash_pairs
    from rheoceros_spark.sources.io import load_table

    return {
        "dedup_minhash_lsh_scalable": lambda s, d: minhash_lsh_pairs(
            load_table(s, d, "documents"), threshold=0.5
        ),
        "dedup_simhash_scalable": lambda s, d: simhash_pairs(
            load_table(s, d, "documents"), max_hamming=3
        ),
        "dedup_substring_spans": queries["dedup_substring_spans"],
        "text_bm25_topk": queries["text_bm25_topk"],
        "curation_dsir_weights": queries["curation_dsir_weights"],
        "text_unigram_nll": queries["text_unigram_nll"],
        "text_repetition": queries["text_repetition"],
    }


def main() -> None:
    from rheoceros_spark.session import get_session

    import __spark_entry__ as entrymod

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_session(
        "scale_stability",
        master=f"local[{cpus}]",
        shuffle_partitions=max(int(cpus) * 2, 32) if cpus.isdigit() else 64,
        extra_confs={"spark.ui.enabled": "false", "spark.driver.memory": "48g"},
    )
    build_sf1(spark)
    if "--build-only" in sys.argv:
        print(json.dumps({"built": SF1}))
        return

    ops = heavy_ops(entrymod.queries())

    def run(fn, d):
        fn(spark, d).write.format("noop").mode("overwrite").save()

    # warm codegen at the smallest SF (same rationale as bench.py)
    for fn in ops.values():
        try:
            run(fn, "/root/testdata/sf0.001")
        except Exception:
            pass

    iters = int(os.environ.get("SPARK_GRAFT_BENCH_ITERS", "2"))
    results: dict[str, dict] = {}
    for name, fn in ops.items():
        per = {}
        for label, d in (("sf01_sec", SF01), ("sf1_sec", SF1)):
            best = None
            for _ in range(iters):
                t0 = time.time()
                run(fn, d)
                el = time.time() - t0
                best = el if best is None or el < best else best
            per[label] = round(best, 3)
        per["growth"] = round(per["sf1_sec"] / max(per["sf01_sec"], 1e-9), 2)
        results[name] = per
        print(f"# {name}: {per}", file=sys.stderr)

    print(
        json.dumps(
            {
                "metric": "scale_stability_10x",
                "replicas": REPLICAS,
                "ops": results,
            }
        )
    )


if __name__ == "__main__":
    main()
