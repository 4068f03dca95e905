"""sf0.1 → sf1 scale-stability probe for the heavy corpus operators.

Synthesizes a 10× corpus (sf1-equivalent, 50k documents) from
/root/testdata/sf0.1 by replicating every document 10 times with a
DISJOINT token space per replica (every token gets a ``#r`` suffix and
doc_ids shift by 100000·r).  Disjoint vocabularies keep the duplicate-
pair/boilerplate structure of each replica identical to sf0.1, so a
corpus-linear operator must grow ≈10× in output and ≈linearly in wall
time — replicating the text verbatim instead would make every replica a
near-dup of every other and the PAIR count (the honest output of dedup)
would grow 100×, conflating operator scaling with workload scaling.

Two checks per operator:
  * wall-time growth ratio at 10× data (min of N timed runs, noop sink)
    — flags anything super-linear (quadratic candidate generation,
    driver-side collects, broadcast of corpus-sized state);
  * the DuckDB oracle re-run at sf1 via scripts/check_oracle.py for the
    linear-oracle queries — determinism (integer quantization, ordered
    folds, portable hashing) must hold as AQE re-plans at 10× the data.

Usage: python scripts/scale_stability.py [--skip-oracle] [--isolated]
Prints one JSON line with per-operator sf0.1/sf1 seconds + ratios.

``--isolated`` is the CANONICAL per-round protocol (VERDICT r8 ask
#2): one fresh JVM per operator, so no probe inherits another's
broadcast/code-cache state — the r8 single-session artifact inflated
two late entries 4–13× and had to annotate fresh-JVM re-runs;
BASELINE.md §3 quotes the isolated numbers verbatim.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402
from rheoceros_spark.session import get_session  # noqa: E402
from rheoceros_spark.sources.io import load_table  # noqa: E402

SF01 = "/root/testdata/sf0.1"
SF1 = os.environ.get("SPARK_GRAFT_SF1_DIR", "/tmp/spark_graft_sf1")
REPLICAS = 10
ID_STRIDE = 100_000

#: heavy text/corpus operators (documents-table inputs only)
HEAVIES = [
    "dedup_substring_spans",
    "text_bm25_topk",
    "curation_dsir_weights",
    "curation_boilerplate",
    "text_tfidf_terms",
    "text_unigram_nll",
    "text_source_kl",
    "dedup_exact_docs",
    "ann_kmeans_refine",
    "ann_pq_topk",
    "ann_cosine_topk",
    # round-7 additions (VERDICT r6 ask #6 + the new registrations):
    # keep_list's iterative CC is the slowest ext query; negative
    # mining and budget mix are window-pass corpus scans; bpe is the
    # hot per-row fold; ivfpq's min-of-N settles on the post-build
    # probe, so its ratio measures the CELL-PRUNED read path (the
    # index build itself is timed once by bench.py per round)
    "dedup_keep_list",
    "curation_negative_samples",
    "curation_budget_mix",
    "text_bpe_tokens",
    "ann_ivfpq_topk",
    # round-8 additions: the two new registrations plus the r9-staged
    # trio.  dedup_semantic_pairs is deliberately EXCLUDED: the sf1
    # embeddings are verbatim replicas (same vectors, shifted ids), so
    # every vector has 9 exact dups — its PAIR output would grow ~100×
    # by workload construction, not operator shape (same reason the
    # other dedup-pair emitters skip the embeddings table here);
    # text_quality_classifier and the composed pipeline are
    # corpus-linear, paragraph/bigram follow the usual text shape
    "text_quality_classifier",
    "dedup_paragraph_spans",
    "text_bigram_nll",
    "pipeline_pretrain_corpus",
    # round-8 session additions.  retrieval_hybrid_rrf and
    # retrieval_mmr_rerank are deliberately EXCLUDED for the same
    # reason as dedup_semantic_pairs: their query set is carved from
    # the corpus (every 101st vector), so at 10× replicas the dense
    # |Q|×|C| work grows ~100× by workload construction — and unlike
    # BM25 (whose #r-suffixed token spaces keep each replica's queries
    # matching only its own replica), embedding vectors can't be
    # suffix-disjointed.  Their corpus-side scan shape is probed via
    # ann_int8_topk / ann_cosine_topk instead.
    # retrieval_quality_metrics is excluded for the same reason: its
    # dense retrieval leg is the same query-carved |Q|x|C| workload.
    "ann_int8_topk",
    "text_bpe_train",
    "text_quality_pr_curve",
    # round-8 session-3 additions: gopher and c4 are pure per-row scans
    # (should be ~linear wall growth, flat per-byte); ppl_buckets is
    # bigram_nll + a histogram cut (growth should track text_bigram_nll);
    # source_overlap is vocabulary-linear with a per-gram sources²
    # factor — at sf1 the replica token spaces are disjoint, so each
    # gram's source-set stays replica-local (≤ the sf0.1 source count)
    "text_gopher_rules",
    "curation_ppl_buckets",
    "curation_c4_lines",
    "curation_source_overlap",
    # fertility = the Arrow BPE scan (text_bpe_tokens' shape) + a
    # groups-sized rollup
    "text_bpe_fertility",
    # decon spans: segmentation explode + broadcast gram probe + per-doc
    # rebuild — corpus-linear like dedup_paragraph_spans
    "curation_decon_spans",
    # lang segments: explode + per-row marker scoring + (id, lang) count
    "text_lang_segments",
    # trained softmax lang classifier: per round one broadcast weight
    # join + two corpus-linear shuffles; scoring is the same shape
    "text_lang_classifier",
    # CCNet composition = classifier + bigram chain + one histogram cut
    "pipeline_ccnet_corpus",
    # minhash overlap sketch: gram explode + sources-sized partial-min agg
    "curation_source_overlap_minhash",
    # keep-best exact dedup: same 32-byte-key shuffle as dedup_exact
    "dedup_exact_best_docs",
    # URL canonicalize+domain+block: pure per-row algebra, zero shuffle
    "curation_url_canonical",
    # URL-exact dedup: 32-byte md5(canonical)-key shuffle, never text
    "dedup_exact_url",
    # snapshot-scoped dedup: (snapshot, md5) winner shuffle + fp min-agg
    "dedup_snapshot_scoped",
    # persisted-artifact tokenize: the Arrow BPE scan, table from parquet
    "text_bpe_persisted",
    # datasheet: three map-combined corpus-linear aggregates, text
    # never shuffles (32-byte fp + counters only)
    "curation_corpus_datasheet",
    # snapshot drift: ONE unpivoted corpus-linear groupBy, histogram-
    # sized everything after
    "curation_snapshot_drift",
    # dedup_semantic_keep is EXCLUDED for dedup_semantic_pairs' reason
    # (verbatim replica embeddings → pair output grows ~100× by
    # workload construction, not operator shape); its corpus-side scan
    # and CC rounds are probed via dedup_keep_list instead.
    # scale_skew_report's registered form reads lineitem, which the
    # sf1 synthesizer does not replicate — probed as the
    # skew_report_docs SCALABLE special over documents.source instead.
    # round-11 session-3 additions (mixture/audit family, staged r14):
    # temperature mix = ONE groups-sized count + broadcast hash gate
    # (sources unchanged by the synthesizer, so the plan stays
    # groups-sized); sif topk = one wordcount shuffle + per-row folds +
    # single-query brute cosine; hotspots = the substring-spans gram
    # shuffle shape (replica-disjoint grams keep counts replica-local);
    # char entropy = pure per-row histogram algebra, zero shuffle
    "curation_temperature_mix",
    "text_sif_embed_topk",
    "dedup_ngram_hotspots",
    "text_char_entropy",
    # winnowing selects ~2/(w+1) of the gram hashes; the pair join is
    # stop-fingerprint-bounded — shuffle shape is substring-spans-sparse
    "dedup_winnow_pairs",
    # the RefinedWeb composition: md5-key URL shuffle + per-row gates +
    # one groups-sized sampling plan (sources unchanged at sf1)
    "pipeline_refinedweb_corpus",
    # epoch plan: one (lang, tokens) sum + groups-frame algebra
    "curation_epoch_plan",
    # match spans: corpus pruned to pair members; alignment join is
    # match-bounded, windows partition per (pair, diagonal)
    "dedup_winnow_spans",
    # round-12 additions (crawl stage-0 family, staged r16): all three
    # are pure row-local column algebra — extraction is the regex
    # chain, intradoc dedup the per-row O(L²) prefix scan, the markup
    # pipeline their zero-shuffle composition.  Note the sf1 '#r'
    # token suffixes stop the fixtures' ' table '/' query ' lineify
    # replaces from firing on replicas (fewer paragraphs/lines per
    # replica page) — the scan shapes are unchanged.
    "text_html_extract",
    "dedup_intradoc_lines",
    "pipeline_refinedweb_html",
    # Bloom gate (staged r17): one position-explode bit_or onto a
    # 256 KB word table + a broadcast-join probe — both corpus-linear;
    # m=2^20 keeps the sf1 build at ~17% fill (the gate refuses past
    # 50%, so the probe also guards the synthesizer's duplication)
    "dedup_bloom_novel",
    # round-13 staging (r18 batch): warc demux is one mapInPandas pass
    # over 8 archive blobs; mirrors shuffle (domain, path-id) ints with
    # a 40-host-bounded pair join.  curation_icp_order is NOT probed at
    # fixed k: the synthesizer's 10 exact-duplicate replicas land in
    # the same trained cell, so within-cell pair counts grow 100× at
    # 10× data BY CONSTRUCTION (measured 15.5× wall at k=8) — the same
    # exclusion as the dedup-pair operators; the icp_order_scaled_k
    # SCALABLE probe demonstrates the k-grows-with-corpus contract
    # (cells stay bounded, the SemDeDup sizing).  Since r14 that
    # contract is ENFORCED, not advisory: icp_order refuses when the
    # largest trained cell exceeds max_cell_size (default 200k) — the
    # fixed-k mis-sizing this exclusion documents now raises instead
    # of silently going quadratic (curation.py icp_order)
    "scan_warc_demux",
    "dedup_url_mirrors",
    # r14: the FULL image-dedup pipeline is now probeable — dhash_pairs
    # groups exact-dup hashes to a min-id representative before the
    # banded join (star pairs are linear in duplicate mass; only the 32
    # DISTINCT fixture hashes enter the join), so the synthesizer's
    # duplicate replicas no longer square the output.  image_dhash_stage
    # (SCALABLE) still times the decode+hash stage alone.
    "multimodal_image_dedup",
    # round-14 staging (r19 batch): the audio/video fixtures
    # synthesize from doc_id alone — corpus-linear decode passes, a
    # 32-distinct-hash-bounded banded join for audio, constant
    # family-of-4 dup groups for video; the robots gate is
    # zero-shuffle broadcast array-HOF algebra
    "multimodal_audio_dedup",
    "multimodal_video_dedup",
    "curation_robots_gate",
]
#: bench-only scalable dedup variants (not in queries(); timed here too).
#: retrieval_metrics_layer probes the metric battery at FIXED query
#: count (VERDICT r10 ask #6): the registered query's dense-retrieval
#: leg carves queries from the corpus (|Q|×|C| grows 100× at 10× data
#: by workload construction, same exclusion as retrieval_hybrid_rrf),
#: so the probe fixes |Q| to replica 0's carve and scales only the
#: qrels side — growth must track the qrels scan, never retrieval.
SCALABLE = [
    "dedup_minhash_lsh_scalable",
    "dedup_simhash_scalable",
    "retrieval_metrics_layer",
    "skew_report_docs",
    "image_dhash_stage",
    "icp_order_scaled_k",
    # the incremental URL path (r12 registrant family): build the
    # canonical-URL fingerprint index from 90% of the corpus, probe the
    # other 10% against it (canonicalize → md5 key → anti-join) — the
    # batch-shaped twin of stream_dedup_url's per-micro-batch work;
    # both legs are corpus-linear, index rows are 32-char keys
    "url_index_probe",
]
#: subset whose DuckDB oracles are corpus-linear → safe to re-hash at sf1.
#: dedup_keep_list stays timing-only: its oracle walks the pair graph
#: with a recursive CTE (pair-quadratic in cluster size on DuckDB's
#: single node); curation_negative_samples stays timing-only: its
#: oracle ranks every (query × pool) candidate with a window, which is
#: oracle-side-quadratic in the probed pool.
ORACLE_AT_SF1 = [
    "dedup_substring_spans",
    "text_bm25_topk",
    "curation_dsir_weights",
    "curation_boilerplate",
    "text_tfidf_terms",
    "text_unigram_nll",
    "text_source_kl",
    "curation_budget_mix",
    "text_bpe_tokens",
    # round-8: linear oracles (paragraph fp rollup; bigram model join;
    # SQL LR train+score).  pipeline_pretrain_corpus stays timing-only:
    # its oracle embeds the recursive-CTE pair closure (single-node
    # quadratic), like dedup_keep_list
    "dedup_paragraph_spans",
    "text_bigram_nll",
    "text_quality_classifier",
    # round-8 session additions (quantize+brute over 10× vectors; LR
    # train + grid histogram).  text_bpe_train is NOT in this list:
    # its 12-round CTE-cascade twin OOMs single-node at the 10×
    # vocabulary, so bpe_oracle_sf1() replays it round-by-round
    # through temp tables instead (bounded memory, same merges) —
    # reported under oracle_sf1.text_bpe_train_sf1 in --isolated runs
    "ann_int8_topk",
    "text_quality_pr_curve",
    # round-8 session-3: all four oracles are corpus-linear (per-row
    # rules; bigram join + histogram cut; per-row line filter; gram-
    # level equi-join)
    "text_gopher_rules",
    "curation_ppl_buckets",
    "curation_c4_lines",
    "curation_source_overlap",
    # fertility's oracle replays the word-fold cascade per DISTINCT
    # word like text_bpe_tokens' (already probed linear at sf1)
    "text_bpe_fertility",
    # decon-spans oracle is gram-equi-join + rebuild — corpus-linear
    "curation_decon_spans",
    # lang-segments oracle is per-span scoring + doc rollup — linear
    "text_lang_segments",
    # softmax-LR oracle: per-round joins/windows over the feature
    # table — corpus-linear like the binary classifier's
    "text_lang_classifier",
    # composition of linear oracles (classifier + bigram + cut)
    "pipeline_ccnet_corpus",
    # minhash-overlap oracle is gram-hash mins per source — linear
    "curation_source_overlap_minhash",
    # keep-best oracle is one ranked window per md5 group — linear
    "dedup_exact_best_docs",
    # URL oracles are per-row scalar pipelines (+ one ranked window)
    "curation_url_canonical",
    "dedup_exact_url",
    # scoped-dedup oracle: two grouped mins over (snapshot, fp) — linear
    "dedup_snapshot_scoped",
    # artifact-tokenize oracle: the certified word-fold cascade — linear
    "text_bpe_persisted",
    # datasheet + drift oracles: grouped counts/distincts over the
    # corpus, rollups histogram-sized — linear
    "curation_corpus_datasheet",
    "curation_snapshot_drift",
    # r14-staged: temperature-mix oracle is groups-sized algebra + one
    # gated count; sif oracle is the hash_embed-style per-row fold +
    # single-query brute cosine; hotspots oracle is a gram equi-group;
    # entropy oracle is a per-row histogram fold — all corpus-linear
    "curation_temperature_mix",
    "text_sif_embed_topk",
    "dedup_ngram_hotspots",
    "text_char_entropy",
    # winnow oracle: gram window-mins + stop-fingerprint-bounded pair
    # join — corpus-linear at fixed per-replica duplication.
    # pipeline_refinedweb_corpus is deliberately EXCLUDED here: the
    # sf1 synthesizer's per-replica '#r' token suffixes make every
    # word count as a '#' symbol, so the Gopher symbol-ratio gate
    # rejects the whole 10× corpus (workload artifact, not operator
    # shape) and the compare would be a vacuous empty≡empty at ~95 s
    # of DuckDB time — its five stage oracles are each covered
    # individually, and its wall-ratio stays probed in HEAVIES (the
    # URL/gate scans still run in full at sf1)
    "dedup_winnow_pairs",
    # epoch-plan oracle: one perdoc token scan + groups algebra — linear
    "curation_epoch_plan",
    # spans oracle: winnow_pairs oracle + member-pruned alignment —
    # pair-bounded at fixed per-replica duplication
    "dedup_winnow_spans",
    # stage-0 oracles: per-row regex/list chains, corpus-linear; the
    # '#r' suffix only shrinks per-replica line counts, never the shape
    "text_html_extract",
    "dedup_intradoc_lines",
    "pipeline_refinedweb_html",
    # bloom oracle: grouped bit_or + a word-table join — corpus-linear
    "dedup_bloom_novel",
    # warc oracle: string algebra + one window cumsum — corpus-linear;
    # mirrors oracle: 40-host-bounded pair join over path-id ints.
    # curation_icp_order is deliberately EXCLUDED: its oracle replays
    # the within-cell all-pairs cosine as a DuckDB list_reduce fold
    # (millions of 64-element folds single-node) and the recursive
    # walk's list_contains is O(visited) per step — timing-only at sf1
    "scan_warc_demux",
    "dedup_url_mirrors",
    # image-dedup oracle: closed-form hash groups + a 32-distinct-hash
    # banded join — corpus-linear star pairs (the r14 grouped shape)
    "multimodal_image_dedup",
    # r19 batch: audio/video oracles are closed-form band/md5-byte
    # arithmetic per doc (corpus-linear, doc_id-derived — immune to
    # the '#r' text-suffix artifact); robots oracle is the certified
    # canonicalization plus a 74-rule VALUES join — corpus-linear
    "multimodal_audio_dedup",
    "multimodal_video_dedup",
    "curation_robots_gate",
]


def synthesize(spark) -> None:
    if os.path.isdir(f"{SF1}/documents.parquet"):
        return
    os.makedirs(SF1, exist_ok=True)
    docs = load_table(spark, SF01, "documents")
    reps = (
        docs.crossJoin(
            F.broadcast(
                spark.range(REPLICAS).select(F.col("id").cast("int").alias("__r"))
            )
        )
        .select(
            (F.col("doc_id") + F.col("__r").cast("bigint") * ID_STRIDE).alias("doc_id"),
            F.array_join(
                F.transform(
                    F.split(F.col("text"), " "),
                    lambda t: F.concat(t, F.lit("#"), F.col("__r").cast("string")),
                ),
                " ",
            ).alias("text"),
            "lang",
            F.concat(F.col("source"), F.lit("#"), F.col("__r").cast("string")).alias(
                "source"
            ),
        )
        # n_chars must describe the REWRITTEN text (every token gained a
        # '#r' suffix) — carrying the source value through would leave
        # the sf1 corpus internally inconsistent for any future heavy
        # that reads n_chars
        .withColumn("n_chars", F.length("text"))
    )
    reps.repartition(32).write.mode("overwrite").parquet(f"{SF1}/documents.parquet")
    # embeddings: same vectors under shifted ids — the embedding HEAVIES
    # timed at sf1 (k-means, PQ, brute cosine) are corpus-LINEAR (no
    # pairwise candidate generation), so duplicate vectors cannot blow
    # up their output the way they would for the dedup-pair operators
    # (which are deliberately NOT timed on this table)
    emb = load_table(spark, SF01, "embeddings")
    emb_reps = (
        emb.crossJoin(
            F.broadcast(
                spark.range(REPLICAS).select(F.col("id").cast("int").alias("__r"))
            )
        )
        .select(
            (F.col("vec_id") + F.col("__r").cast("bigint") * ID_STRIDE).alias("vec_id"),
            "embedding",
            "label",
        )
    )
    emb_reps.repartition(32).write.mode("overwrite").parquet(f"{SF1}/embeddings.parquet")


def run_once(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def bpe_oracle_sf1(spark) -> dict:
    """sf1 DuckDB oracle for text_bpe_train, replayed ROUND-BY-ROUND
    through temp tables instead of one 12-stage CTE cascade (which
    materializes every intermediate word table at once and OOMs
    single-node at the 10× vocabulary — measured 2026-08-15).  Each
    round holds exactly one word table + one pair table in memory, so
    the replay is bounded by the vocabulary like the Spark side.

    Returns {"rows_match": bool, "n": int} comparing the full merge
    table (rank, lhs, rhs) against the staged Spark query at SF1."""
    import duckdb

    qs = {**entrymod._STAGED_QUERIES, **entrymod.queries()}
    sdf = qs["text_bpe_train"](spark, SF1)
    got = [(int(r[0]), r[1], r[2]) for r in sdf.collect()]

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{SF1}/documents.parquet/*.parquet'"
    )
    norm = entrymod._NORM  # the exact normalizer the CTE oracle uses
    con.execute(f"""
      CREATE TEMP TABLE w AS
      SELECT list_filter(list_transform(range(1, length(w) + 1), j -> w[j]),
                         x -> x <> '') AS syms,
             CAST(count(*) AS BIGINT) AS cnt
      FROM (
        SELECT unnest(regexp_extract_all({norm},
                      '[A-Za-z]+|[0-9]|[^A-Za-z0-9 ]')) AS w
        FROM documents WHERE doc_id IS NOT NULL
      )
      WHERE w <> chr(31)
      GROUP BY w
    """)
    merges: list[tuple[int, str, str]] = []
    for rank in range(12):
        row = con.execute("""
          SELECT a, b FROM (
            SELECT syms[j] AS a, syms[j + 1] AS b, cnt FROM (
              SELECT syms, cnt, unnest(range(1, len(syms))) AS j
              FROM w WHERE len(syms) >= 2
            )
          )
          WHERE regexp_matches(a, '^[A-Za-z0-9]+$')
            AND regexp_matches(b, '^[A-Za-z0-9]+$')
          GROUP BY a, b HAVING sum(cnt) >= 2
          ORDER BY sum(cnt) DESC, a, b LIMIT 1
        """).fetchone()
        if row is None:
            break
        a, b = row
        merges.append((rank, a, b))
        con.execute(
            """
          CREATE TEMP TABLE w2 AS
          SELECT string_split(
                   list_reduce(syms, (acc, x) -> CASE
                     WHEN (acc = $a OR ends_with(acc, chr(31) || $a)) AND x = $b
                     THEN left(acc, length(acc) - length($a)) || $a || $b
                     ELSE acc || chr(31) || x END),
                   chr(31)) AS syms, cnt
          FROM w
        """,
            {"a": a, "b": b},
        )
        con.execute("DROP TABLE w")
        con.execute("ALTER TABLE w2 RENAME TO w")
    return {"rows_match": got == merges, "n": len(merges)}


def isolated(probe_names: list[str], skip_oracle: bool) -> None:
    """One fresh JVM per probe (VERDICT r8 ask #2): a long same-JVM
    run contaminates late entries — accumulated broadcast/code-cache
    state inflated two r8 operators 4–13× (bm25 5.65× vs 3.82× fresh;
    bpe 12.93× vs 1.11× fresh).  The canonical artifact times every
    operator against identical cold-JVM state; BASELINE.md §3 quotes
    these numbers verbatim."""
    here = os.path.abspath(__file__)
    merged: dict[str, dict] = {}
    for name in probe_names:
        proc = subprocess.run(
            [sys.executable, here, f"--only={name}", "--skip-oracle"],
            capture_output=True, text=True,
        )
        line = proc.stdout.strip().splitlines()[-1] if proc.stdout.strip() else "{}"
        try:
            part = json.loads(line)["timings"]
        except (json.JSONDecodeError, KeyError):
            part = {name: {"error": (proc.stderr or "no output")[-300:]}}
        merged.update(part)
        for n, t in part.items():
            print(f"[isolated] {n}: {t}", file=sys.stderr)

    oracle: dict = {}
    # compute the filtered list FIRST: an --only target outside
    # ORACLE_AT_SF1 must SKIP the oracle child entirely — passing zero
    # names would make check_oracle run its full suite
    oracle_names = [n for n in ORACLE_AT_SF1 if n in probe_names]
    if not skip_oracle and oracle_names:
        proc = subprocess.run(
            [sys.executable, "scripts/check_oracle.py", SF1, *oracle_names],
            capture_output=True, text=True,
            cwd=os.path.dirname(os.path.dirname(here)),
        )
        tail = proc.stdout.strip().splitlines()
        oracle = {"rc": proc.returncode, "summary": tail[-1] if tail else ""}
        print(proc.stdout, file=sys.stderr)
    if not skip_oracle:
        # bpe_train's sf1 oracle runs round-by-round in its own JVM
        # (deliberately OUTSIDE ORACLE_AT_SF1 — the CTE cascade OOMs)
        if "text_bpe_train" in probe_names:
            proc = subprocess.run(
                [sys.executable, here, "--bpe-oracle-sf1"],
                capture_output=True, text=True,
            )
            line = (proc.stdout.strip().splitlines() or ["{}"])[-1]
            try:
                oracle["text_bpe_train_sf1"] = json.loads(line)
            except json.JSONDecodeError:
                oracle["text_bpe_train_sf1"] = {"error": (proc.stderr or "?")[-300:]}
            print(f"bpe sf1 oracle: {oracle['text_bpe_train_sf1']}", file=sys.stderr)

    print(json.dumps({"metric": "scale_stability", "replicas": REPLICAS,
                      "protocol": "fresh-jvm-per-operator",
                      "timings": merged, "oracle_sf1": oracle}))


def main() -> None:
    skip_oracle = "--skip-oracle" in sys.argv
    only: list[str] | None = None
    for arg in sys.argv[1:]:
        if arg.startswith("--only="):
            only = [n for n in arg.split("=", 1)[1].split(",") if n]
    if "--isolated" in sys.argv:
        isolated([n for n in HEAVIES + SCALABLE if only is None or n in only],
                 skip_oracle)
        return
    spark = get_session(
        "scale_stability",
        master="local[32]",
        shuffle_partitions=64,
        extra_confs={"spark.ui.enabled": "false"},
    )
    from bench import quiet_tiny_window_warnings

    quiet_tiny_window_warnings(spark)
    synthesize(spark)
    if "--bpe-oracle-sf1" in sys.argv:
        print(json.dumps(bpe_oracle_sf1(spark)))
        return

    from rheoceros_spark.operators import minhash_lsh_pairs, simhash_pairs

    def scalable(name, sf_dir):
        if name == "icp_order_scaled_k":
            # the ICP scale contract: k grows with the corpus so cells
            # (and therefore the within-cell pair set and each walk
            # task) stay bounded — k=8 at sf0.1, k=80 at 10× data
            from rheoceros_spark.operators.curation import icp_order

            emb = load_table(spark, sf_dir, "embeddings")
            k = 80 if sf_dir == SF1 else 8
            return icp_order(emb, k=k, iters=2, m=4)
        if name == "image_dhash_stage":
            # hash stage only: the PAIR join's output is quadratic in
            # duplicate-group size by the synthesizer's construction
            # (the dedup-pair exclusion rule), but the decode+hash
            # stage is corpus-LINEAR and is what dominates at 100 TB
            from rheoceros_spark.operators.multimodal import image_dhash

            return image_dhash(entrymod.dhash_fixture_media(spark, sf_dir))
        if name == "skew_report_docs":
            from rheoceros_spark.operators.scale import skew_report

            return skew_report(
                load_table(spark, sf_dir, "documents"), "source", top=10
            )
        if name == "retrieval_metrics_layer":
            from rheoceros_spark.operators.similarity import retrieval_metrics

            emb = load_table(spark, sf_dir, "embeddings").where(
                F.col("vec_id").isNotNull()
            )
            # replica-0 carve: vec_id < ID_STRIDE holds at sf0.1 (ids
            # 0..1999) and selects exactly the same 20 queries at sf1
            queries = emb.where(
                (F.col("vec_id") % 101 == 0) & (F.col("vec_id") < ID_STRIDE)
            ).select(F.col("vec_id").alias("query_id"))
            # corpus-independent synthetic top-10 per query: the probe
            # times the metric layer, not retrieval
            results = queries.crossJoin(
                spark.range(1, 11).select(F.col("id").cast("int").alias("rank"))
            ).select(
                "query_id",
                (F.col("query_id") * 7 + F.col("rank")).alias("doc_id"),
                "rank",
            )
            qrels = (
                F.broadcast(queries)
                .crossJoin(emb.select(F.col("vec_id").alias("doc_id")))
                .where(
                    (F.col("doc_id") % 7 == F.col("query_id") % 7)
                    & (F.col("doc_id") != F.col("query_id"))
                )
            )
            return retrieval_metrics(results, qrels, k=10)
        if name == "url_index_probe":
            from rheoceros_spark.operators.urls import (
                check_url_index,
                url_canonicalize,
                url_index_write,
            )

            docs = load_table(spark, sf_dir, "documents").withColumn(
                "url", F.expr(entrymod._URL_FIXTURE)
            )
            idx = url_index_write(
                docs.where(F.col("doc_id") % 10 != 0),
                f"{SF1}/__url_index_probe",
                url_col="url",
            )
            check_url_index(idx)
            from rheoceros_spark.operators.scale import plan_barrier

            # barrier before the IS NOT NULL filter — unbarriered, the
            # pushdown rule inlines the whole canonicalization chain
            # into the predicate (measured 29 s of optimizer time in
            # the first probe run vs ~2 s barriered)
            batch = plan_barrier(
                url_canonicalize(docs.where(F.col("doc_id") % 10 == 0)),
                "url_probe_rows_in",
            )
            keyed = batch.where(F.col("canonical_url").isNotNull()).select(
                "doc_id", F.md5("canonical_url").alias("fp")
            )
            return keyed.join(idx.select("fp"), "fp", "left_anti")
        docs = load_table(spark, sf_dir, "documents")
        if name == "dedup_minhash_lsh_scalable":
            return minhash_lsh_pairs(docs, threshold=0.5)
        return simhash_pairs(docs, max_hamming=3)

    # driver-window retirees (ann_pq_topk) and staged-for-next-round
    # queries stay probed for scale
    queries = {
        **entrymod.retired_queries(),
        **entrymod._STAGED_QUERIES,
        **entrymod.queries(),
    }
    iters = int(os.environ.get("SPARK_GRAFT_SCALE_ITERS", "2"))
    results: dict[str, dict] = {}
    probe_names = [
        n for n in HEAVIES + SCALABLE if only is None or n in only
    ]
    for name in probe_names:
        fn = (lambda s, d, _n=name: scalable(_n, d)) if name in SCALABLE else queries[name]
        # warm the per-plan codegen at the small sf, untimed
        run_once(fn(spark, "/root/testdata/sf0.001"))
        t = {}
        for sf_name, sf_dir in (("sf0.1", SF01), ("sf1", SF1)):
            best = None
            for _ in range(iters):
                # cold-cache every iteration (bm25 caches its matched
                # frame internally; min-of-N must not time a warm cache)
                spark.catalog.clearCache()
                t0 = time.time()
                run_once(fn(spark, sf_dir))
                el = time.time() - t0
                best = el if best is None or el < best else best
            t[sf_name] = round(best, 3)
        t["ratio"] = round(t["sf1"] / t["sf0.1"], 2)
        results[name] = t
        print(f"{name}: {t}", file=sys.stderr)

    oracle = {}
    oracle_names = [
        n for n in ORACLE_AT_SF1 if only is None or n in only
    ]
    if not skip_oracle and oracle_names:
        proc = subprocess.run(
            [sys.executable, "scripts/check_oracle.py", SF1, *oracle_names],
            capture_output=True, text=True,
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        )
        tail = proc.stdout.strip().splitlines()
        oracle = {"rc": proc.returncode, "summary": tail[-1] if tail else ""}
        print(proc.stdout, file=sys.stderr)

    print(json.dumps({"metric": "scale_stability", "replicas": REPLICAS,
                      "timings": results, "oracle_sf1": oracle}))


if __name__ == "__main__":
    main()
