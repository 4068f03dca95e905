"""Per-query phase profiler for the optimization round.

For each named query (default: the heaviest from the last full bench):
  - time the BUILD phase (the ``fn(spark, sf_dir)`` call — catches eager
    driver work: guard collects, k-means training, checkpoint
    materialization, createDataFrame fixtures),
  - time the EXECUTE phase (noop sink, guide §1.4) twice (min-of-2
    absorbs first-pass JIT),
  - optionally dump ``explain('formatted')`` to plans/r14/<name>_<tag>.txt.

Usage:
  python scripts/profile_queries.py [--plans TAG] [--sf SF_DIR] [name ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402
from rheoceros_spark.session import get_session  # noqa: E402

DEFAULT = [
    "curation_icp_order",
    "pipeline_ccnet_corpus",
    "text_lang_classifier",
    "dedup_semantic_keep",
    "text_quality_classifier",
    "retrieval_hybrid_rrf",
    "curation_robots_gate",
    "pipeline_pretrain_corpus",
    "text_quality_pr_curve",
    "dedup_semantic_pairs",
    "dedup_keep_list",
    "text_bm25_topk",
    "multimodal_video_dedup",
    "text_sif_embed_topk",
    "text_bpe_train",
    "dedup_url_mirrors",
    "curation_cluster_profile",
    "dedup_winnow_spans",
    "multimodal_image_dedup",
    "retrieval_mmr_rerank",
]


def main() -> None:
    args = sys.argv[1:]
    plans_tag = None
    if "--plans" in args:
        i = args.index("--plans")
        plans_tag = args[i + 1]
        del args[i : i + 2]
    sf_dir = "/root/testdata/sf0.1"
    if "--sf" in args:
        i = args.index("--sf")
        sf_dir = args[i + 1]
        del args[i : i + 2]
    names = args or DEFAULT

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_session(
        "rheoceros_profile",
        master=f"local[{cpus}]",
        shuffle_partitions=max(int(cpus) * 2, 32) if cpus.isdigit() else 64,
        extra_confs={"spark.ui.enabled": "false"},
    )
    queries = {
        **entrymod.retired_queries(),
        **entrymod._STAGED_QUERIES,
        **entrymod.queries(),
    }
    plans_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r14")
    if plans_tag:
        os.makedirs(plans_dir, exist_ok=True)

    # tiny warmup pass (same rationale as bench.py)
    warm_dir = "/root/testdata/sf0.001"
    for name in names:
        try:
            queries[name](spark, warm_dir).write.format("noop").mode("overwrite").save()
        except Exception:
            pass

    print(f"{'query':34s} {'build':>7s} {'exec1':>7s} {'exec2':>7s} {'total':>7s}")
    for name in names:
        fn = queries[name]
        spark.catalog.clearCache()
        spark.sparkContext.setJobDescription(f"{name}: build")
        t0 = time.time()
        try:
            df = fn(spark, sf_dir)
        except Exception as exc:
            print(f"{name:34s} BUILD FAILED: {exc}")
            continue
        t1 = time.time()
        spark.sparkContext.setJobDescription(f"{name}: exec1")
        try:
            df.write.format("noop").mode("overwrite").save()
        except Exception as exc:
            print(f"{name:34s} EXEC FAILED: {exc}")
            continue
        t2 = time.time()
        # rebuild for a cold second execution (internal caches cleared)
        spark.catalog.clearCache()
        spark.sparkContext.setJobDescription(f"{name}: exec2")
        t3 = time.time()
        df2 = fn(spark, sf_dir)
        t4 = time.time()
        df2.write.format("noop").mode("overwrite").save()
        t5 = time.time()
        build = min(t1 - t0, t4 - t3)
        ex = min(t2 - t1, t5 - t4)
        print(
            f"{name:34s} {build:7.2f} {t2 - t1:7.2f} {t5 - t4:7.2f} {build + ex:7.2f}"
        )
        if plans_tag:
            try:
                plan = df._sc._jvm.PythonSQLUtils.explainString(
                    df._jdf.queryExecution(), "formatted"
                )
            except Exception:
                import contextlib
                import io

                buf = io.StringIO()
                with contextlib.redirect_stdout(buf):
                    df.explain("formatted")
                plan = buf.getvalue()
            with open(os.path.join(plans_dir, f"{name}_{plans_tag}.txt"), "w") as fh:
                fh.write(plan)
    spark.sparkContext.setJobDescription(None)


if __name__ == "__main__":
    main()
