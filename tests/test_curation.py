"""Curation-operator semantics: deterministic sampling, PII redaction,
vocab top-k, decontamination, duplicate clustering."""

import pytest
from pyspark.sql import functions as F

from rheoceros_spark.operators import (
    contamination_ngrams,
    dup_clusters,
    hash_sample,
    pii_redact,
    stratified_hash_sample,
    vocab_top_tokens,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string, lang string")


def test_hash_sample_deterministic_and_monotone(spark):
    df = spark.range(2000).withColumnRenamed("id", "doc_id")
    s1 = {r.doc_id for r in hash_sample(df, 0.2, key_col="doc_id").collect()}
    s2 = {r.doc_id for r in hash_sample(df, 0.2, key_col="doc_id").collect()}
    assert s1 == s2  # pure function of the key
    s_big = {r.doc_id for r in hash_sample(df, 0.5, key_col="doc_id").collect()}
    assert s1 <= s_big  # rate 0.2 sample is a subset of rate 0.5
    assert 0.1 < len(s1) / 2000 < 0.3 and 0.4 < len(s_big) / 2000 < 0.6


def test_hash_sample_seed_changes_selection(spark):
    df = spark.range(2000).withColumnRenamed("id", "doc_id")
    a = {r.doc_id for r in hash_sample(df, 0.3, seed=0).collect()}
    b = {r.doc_id for r in hash_sample(df, 0.3, seed=1).collect()}
    assert a != b


def test_stratified_rates(spark):
    df = spark.range(3000).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 3 == 0, "en").when(F.col("id") % 3 == 1, "de")
        .otherwise("fr").alias("lang"),
    )
    out = stratified_hash_sample(df, {"en": 0.8, "de": 0.2}, default_rate=0.0)
    counts = {r.lang: r.cnt for r in out.groupBy("lang").agg(F.count("*").alias("cnt")).collect()}
    assert counts.get("fr", 0) == 0
    assert 0.6 < counts["en"] / 1000 < 1.0
    assert 0.1 < counts["de"] / 1000 < 0.35


def test_pii_redact_patterns(spark):
    df = _docs(
        spark,
        [
            (1, "mail bob.smith+x@corp.example.org now", "en"),
            (2, "ssn 123-45-6789 phone 555-123-4567", "en"),
            (3, "server at 192.168.1.250 ok", "en"),
            (4, "nothing sensitive here", "en"),
        ],
    )
    rows = {r.doc_id: r for r in pii_redact(df).collect()}
    assert rows[1].redacted == "mail <EMAIL> now" and rows[1].hits_email == 1
    assert rows[2].redacted == "ssn <SSN> phone <PHONE>"
    assert rows[2].hits_ssn == 1 and rows[2].hits_phone == 1
    assert rows[3].redacted == "server at <IP> ok" and rows[3].hits_ip == 1
    assert rows[4].redacted == "nothing sensitive here"
    assert rows[4].hits_email == rows[4].hits_ssn == rows[4].hits_ip == 0


def test_vocab_top_tokens_ranking_and_ties(spark):
    df = _docs(
        spark,
        [
            (1, "b b b a a c", "en"),
            (2, "a z", "en"),
            (3, "x x y", "de"),
        ],
    )
    out = vocab_top_tokens(df, k=2, group_col="lang").collect()
    en = sorted([(r.token, r.cnt, r.rank) for r in out if r.lang == "en"], key=lambda t: t[2])
    # a and b tie at 3; 'a' wins the tie alphabetically
    assert en == [("a", 3, 1), ("b", 3, 2)]
    de = [(r.token, r.rank) for r in out if r.lang == "de"]
    assert sorted(de, key=lambda t: t[1]) == [("x", 1), ("y", 2)]


def test_contamination_flags_shared_ngrams(spark):
    shared = "one two three four five six seven eight"
    corpus = _docs(
        spark,
        [
            (1, shared + " tail words here", "en"),
            (2, "totally different text with no overlap at all", "en"),
        ],
    )
    bench = _docs(spark, [(100, shared + " other continuation", "en")])
    rows = {r.doc_id: r for r in contamination_ngrams(corpus, bench, n=8).collect()}
    assert rows[1].contaminated >= 1 and rows[1].contamination_ratio > 0
    assert rows[2].contaminated == 0 and rows[2].contamination_ratio == 0.0


def test_dup_clusters_chain_and_islands(spark):
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (20, 21), (21, 22)],
        "a bigint, b bigint",
    )
    got = {r.doc_id: r.cluster_id for r in dup_clusters(pairs).collect()}
    # chains collapse to the min id of each component
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 20: 20, 21: 20, 22: 20}


def test_dup_clusters_long_chain_converges(spark):
    # adversarial: one 15-node path graph (diameter 14)
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(15)], "a bigint, b bigint"
    )
    got = {r.doc_id: r.cluster_id for r in dup_clusters(pairs, max_iter=30).collect()}
    assert set(got.values()) == {0} and len(got) == 16


def test_dup_clusters_default_escalates_on_adversarial_chain(spark):
    """A 1000-node path graph (diameter 999) through the DEFAULT entry
    point: label propagation alone would need ~999 rounds; the
    escalation to star alternation on the label-contracted quotient
    must converge within the default budgets with no warning."""
    import warnings

    n = 1000
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(n)], "a bigint, b bigint"
    )
    with warnings.catch_warnings():
        warnings.simplefilter("error", RuntimeWarning)  # under-merge warn → fail
        got = {r.doc_id: r.cluster_id for r in dup_clusters(pairs).collect()}
    assert len(got) == n + 1
    assert set(got.values()) == {0}


def test_dup_clusters_escalation_disabled_warns(spark):
    """escalate_after=None restores the pure label-propagation path:
    exhausting max_iter under-merges and must say so."""
    import warnings

    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(40)], "a bigint, b bigint"
    )
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        dup_clusters(pairs, max_iter=3, escalate_after=None).collect()
    assert any("under-merged" in str(w.message) for w in caught)


def test_dup_clusters_escalation_mixed_components_exact(spark):
    """Escalation composes quotient roots back correctly when some
    components already merged before the switch (their labels have no
    quotient edge) and others are still mid-chain."""
    edges = [(i, i + 1) for i in range(30)]          # long chain 0..30
    edges += [(100, 101), (101, 102)]                # shallow island
    edges += [(200, 201)]                            # pair
    pairs = spark.createDataFrame(edges, "a bigint, b bigint")
    got = {r.doc_id: r.cluster_id for r in dup_clusters(pairs, escalate_after=2).collect()}
    assert {got[i] for i in range(31)} == {0}
    assert got[100] == got[101] == got[102] == 100
    assert got[200] == got[201] == 200
    assert len(got) == 31 + 3 + 2


def test_dup_clusters_string_ids_converge(spark):
    """String doc ids: the fixpoint check must be type-agnostic —
    a numeric sum(label) is NULL for strings, which would mask
    convergence and burn max_iter rounds + a spurious warning."""
    import warnings

    pairs = spark.createDataFrame(
        [("docA", "docB"), ("docB", "docC"), ("docX", "docY")],
        "a string, b string",
    )
    with warnings.catch_warnings():
        warnings.simplefilter("error", RuntimeWarning)  # spurious warn → fail
        got = {r.doc_id: r.cluster_id for r in dup_clusters(pairs, max_iter=10).collect()}
    assert got == {"docA": "docA", "docB": "docA", "docC": "docA",
                   "docX": "docX", "docY": "docX"}


def test_incremental_index_roundtrip(spark, tmp_path):
    from rheoceros_spark.operators import build_minhash_index, dedup_against_index

    corpus = _docs(
        spark,
        [
            (1, "the quick brown fox jumps over the lazy dog again and again", "en"),
            (2, "completely unrelated corpus text about spark shuffles", "en"),
        ],
    )
    # persisted index, re-read from parquet (the incremental contract)
    path = str(tmp_path / "mh_index")
    build_minhash_index(corpus, path=path)
    index = spark.read.parquet(path)

    batch = _docs(
        spark,
        [
            (100, "the quick brown fox jumps over the lazy dog again and again", "en"),
            (101, "novel document with entirely new content", "en"),
        ],
    )
    hits = dedup_against_index(batch, index, threshold=0.5).collect()
    assert {(r.new_id, r.dup_of) for r in hits} == {(100, 1)}
    assert hits[0].jaccard == 1.0


def test_incremental_probe_plan_is_equi_join(spark):
    from rheoceros_spark.operators import build_minhash_index, dedup_against_index

    corpus = _docs(spark, [(1, "a b c d e f", "en")])
    batch = _docs(spark, [(2, "a b c d e g", "en")])
    out = dedup_against_index(batch, build_minhash_index(corpus))
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan


def test_dup_clusters_empty_pairs_fast(spark):
    pairs = spark.createDataFrame([], "a bigint, b bigint")
    assert dup_clusters(pairs).count() == 0


class TestDupClustersStar:
    """Large-star/small-star CC: O(log² n) rounds on any shape — the
    path where min-label propagation's O(diameter) rounds would die."""

    def test_thousand_node_path_graph_converges(self, spark):
        from rheoceros_spark.operators.curation import dup_clusters_star

        n = 1000  # diameter 999: label propagation would need ~999 rounds
        pairs = spark.createDataFrame(
            [(i, i + 1) for i in range(n)], "a bigint, b bigint"
        )
        got = {r.doc_id: r.cluster_id for r in dup_clusters_star(pairs, max_iter=30).collect()}
        assert len(got) == n + 1
        assert set(got.values()) == {0}

    def test_matches_label_propagation_on_mixed_graph(self, spark):
        from rheoceros_spark.operators.curation import dup_clusters_star

        pairs = spark.createDataFrame(
            [(1, 2), (2, 3), (3, 4), (10, 11), (20, 21), (21, 22), (4, 1)],
            "a bigint, b bigint",
        )
        star = {r.doc_id: r.cluster_id for r in dup_clusters_star(pairs).collect()}
        prop = {r.doc_id: r.cluster_id for r in dup_clusters(pairs).collect()}
        assert star == prop

    def test_string_ids(self, spark):
        from rheoceros_spark.operators.curation import dup_clusters_star

        pairs = spark.createDataFrame(
            [("docB", "docA"), ("docB", "docC"), ("docY", "docX")],
            "a string, b string",
        )
        got = {r.doc_id: r.cluster_id for r in dup_clusters_star(pairs).collect()}
        assert got == {"docA": "docA", "docB": "docA", "docC": "docA",
                       "docX": "docX", "docY": "docX"}

    def test_empty(self, spark):
        from rheoceros_spark.operators.curation import dup_clusters_star

        pairs = spark.createDataFrame([], "a bigint, b bigint")
        assert dup_clusters_star(pairs).count() == 0

    def test_non_convergence_still_one_row_per_node(self, spark):
        """max_iter exhaustion mid-contraction must yield a well-formed
        (possibly under-merged) label map: exactly one row per node, no
        conflicting labels to fan out downstream joins."""
        import warnings

        from rheoceros_spark.operators.curation import dup_clusters_star

        n = 200  # long chain, deliberately starved of rounds
        pairs = spark.createDataFrame(
            [(i, i + 1) for i in range(n)], "a bigint, b bigint"
        )
        with warnings.catch_warnings(record=True) as caught:
            warnings.simplefilter("always")
            rows = dup_clusters_star(pairs, max_iter=1).collect()
        assert any("no fixpoint" in str(w.message) for w in caught)
        ids = [r.doc_id for r in rows]
        assert len(ids) == len(set(ids)), "duplicate doc_id rows in label map"
        assert len(ids) == n + 1
        # labels point at some smaller-or-equal node (a valid tentative label)
        assert all(r.cluster_id <= r.doc_id for r in rows)


def test_index_param_mismatch_raises(spark):
    import pytest as _pytest

    from rheoceros_spark.operators import build_minhash_index, dedup_against_index

    corpus = _docs(spark, [(1, "a b c d e f", "en")])
    batch = _docs(spark, [(2, "a b c d e g", "en")])
    idx = build_minhash_index(corpus, bands=4)
    with _pytest.raises(ValueError, match="built with"):
        dedup_against_index(batch, idx, bands=8, num_hashes=16)


def test_persisted_index_returns_materialized_scan(spark, tmp_path):
    from rheoceros_spark.operators import build_minhash_index

    corpus = _docs(spark, [(1, "a b c d e f", "en")])
    path = str(tmp_path / "idx")
    idx = build_minhash_index(corpus, path=path)
    # the returned frame scans the written files, not the corpus plan
    assert any(path in f for f in idx.inputFiles())


class TestShuffleAndPack:
    """Deterministic training-data shuffle + sequence packing."""

    def test_shuffle_deterministic_and_seed_sensitive(self, spark):
        from rheoceros_spark.operators.curation import shuffle_shards

        docs = spark.range(500).select(F.col("id").alias("doc_id"))
        a = {r.doc_id: (r.shard, r.sort_key) for r in shuffle_shards(docs, seed=7).collect()}
        b = {r.doc_id: (r.shard, r.sort_key) for r in shuffle_shards(docs, seed=7).collect()}
        c = {r.doc_id: (r.shard, r.sort_key) for r in shuffle_shards(docs, seed=8).collect()}
        assert a == b
        assert a != c

    def test_shuffle_shards_roughly_balanced(self, spark):
        from rheoceros_spark.operators.curation import shuffle_shards

        docs = spark.range(2000).select(F.col("id").alias("doc_id"))
        sizes = (
            shuffle_shards(docs, n_shards=16, seed=1)
            .groupBy("shard").count().collect()
        )
        assert len(sizes) == 16
        for r in sizes:  # E=125; a uniform hash stays well inside 2x
            assert 60 <= r["count"] <= 250, (r["shard"], r["count"])

    def test_shuffle_is_pure_projection(self, spark):
        from rheoceros_spark.operators.curation import shuffle_shards

        docs = spark.range(100).select(F.col("id").alias("doc_id"))
        plan = shuffle_shards(docs)._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan

    def test_pack_matches_python_reference(self, spark):
        from rheoceros_spark.operators.curation import pack_sequences, shuffle_shards

        docs = spark.range(300).select(
            F.col("id").alias("doc_id"),
            (F.col("id") % 97 + 3).alias("n_tokens"),
        )
        sh = shuffle_shards(docs, n_shards=4, seed=5)
        got = pack_sequences(sh, budget=256).collect()
        # python reference: same order, same streaming fill
        by_shard: dict = {}
        for r in sorted(got, key=lambda r: (r.shard, r.sort_key, r.doc_id)):
            cum = by_shard.get(r.shard, 0) + r.n_tokens
            by_shard[r.shard] = cum
            expected_bin = (cum - r.n_tokens) // 256
            assert r.bin_id == expected_bin, (r.doc_id, r.bin_id, expected_bin)

    def test_pack_bins_fill_to_budget(self, spark):
        from rheoceros_spark.operators.curation import pack_sequences, shuffle_shards

        docs = spark.range(400).select(
            F.col("id").alias("doc_id"), F.lit(50).alias("n_tokens")
        )
        sh = shuffle_shards(docs, n_shards=2, seed=3)
        stats = (
            pack_sequences(sh, budget=200)
            .groupBy("shard", "bin_id")
            .agg(F.sum("n_tokens").alias("tok"))
            .collect()
        )
        # uniform 50-token docs into 200-budget bins: every full bin
        # holds exactly 4 docs; only each shard's last bin may be short
        last = {r.shard: max(x.bin_id for x in stats if x.shard == r.shard) for r in stats}
        for r in stats:
            if r.bin_id < last[r.shard]:
                assert r.tok == 200, (r.shard, r.bin_id, r.tok)


class TestFilterFunnel:
    def test_monotone_stages(self, spark, sf_dir):
        from rheoceros_spark.operators.curation import filter_funnel

        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        rows = sorted(filter_funnel(docs).collect(), key=lambda r: r.stage)
        assert [r.stage_name for r in rows] == [
            "ingest", "lang", "quality", "repetition", "dedup",
        ]
        counts = [r.n_docs for r in rows]
        assert counts[0] == docs.count()
        # each stage only removes documents
        assert all(a >= b for a, b in zip(counts, counts[1:]))
        assert counts[-1] > 0

    def test_dedup_stage_collapses_exact_copies(self, spark):
        from rheoceros_spark.operators.curation import filter_funnel

        # three identical high-quality English docs + one distinct -> the
        # dedup stage keeps 2 of the 4 lang/quality/repetition survivors
        base = (
            "the cat and the dog walked to a park in town and it was that "
            "good day for all of them to be out in a field of green grass"
        )
        other = base.replace("cat", "fox")
        df = spark.createDataFrame(
            [(1, base), (2, base), (3, base), (4, other)],
            "doc_id long, text string",
        )
        rows = {r.stage_name: r.n_docs for r in filter_funnel(df).collect()}
        assert rows["ingest"] == 4
        assert rows["repetition"] == 4
        assert rows["dedup"] == 2


class TestSemanticContamination:
    def test_bucket_blocking_matches_brute_force_within_buckets(self, spark, sf_dir):
        from pyspark.sql import functions as F
        from rheoceros_spark.operators.curation import semantic_contamination

        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        corp = emb.where(F.col("vec_id") % 97 != 0)
        bench = emb.where(F.col("vec_id") % 97 == 0)
        got = semantic_contamination(corp, bench, threshold=0.1).collect()
        assert len(got) > 0
        for r in got:
            assert r.cos_r >= 0.1
        # bench side must be the broadcast side (corpus never shuffles)
        plan = (
            semantic_contamination(corp, bench, threshold=0.1)
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "BroadcastHashJoin" in plan

    def test_identical_vector_always_caught(self, spark):
        from pyspark.sql import Row
        from rheoceros_spark.operators.curation import semantic_contamination

        vec = [float((j * 13) % 7 - 3) for j in range(64)]
        other = [float((j * 5) % 11 - 5) for j in range(64)]
        corp = spark.createDataFrame(
            [Row(vec_id=1, embedding=vec), Row(vec_id=2, embedding=other)],
            "vec_id long, embedding array<float>",
        )
        bench = spark.createDataFrame(
            [Row(vec_id=100, embedding=vec)], "vec_id long, embedding array<float>"
        )
        got = semantic_contamination(corp, bench, threshold=0.99)
        rows = got.collect()
        # an exact copy shares every plane sign -> same bucket -> cos 1.0
        assert [(r.vec_id, r.bench_id) for r in rows] == [(1, 100)]
        assert rows[0].cos_r == 1.0

    def test_threshold_validation(self, spark):
        from pyspark.sql import Row
        from rheoceros_spark.operators.curation import semantic_contamination

        df = spark.createDataFrame([Row(vec_id=1, embedding=[0.0] * 64)],
                                   "vec_id long, embedding array<float>")
        with pytest.raises(ValueError, match="threshold"):
            semantic_contamination(df, df, threshold=1.5)


# ---------------------------------------------------------------------------
# round 6: corpus shaping — domain caps, splits, negatives, boilerplate
# ---------------------------------------------------------------------------

def _sourced(spark, n, n_sources):
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("src"), (F.col("id") % n_sources).cast("string")).alias("source"),
    )


class TestDomainCap:
    def test_cap_enforced_and_deterministic(self, spark):
        from rheoceros_spark.operators import domain_cap

        df = _sourced(spark, 300, 3)  # 100 docs per source
        out = domain_cap(df, cap=10).collect()
        per = {}
        for r in out:
            per.setdefault(r.source, []).append(r.doc_id)
        assert set(per) == {"src0", "src1", "src2"}
        assert all(len(v) == 10 for v in per.values())
        again = domain_cap(df, cap=10).collect()
        assert sorted((r.source, r.doc_id) for r in out) == sorted(
            (r.source, r.doc_id) for r in again
        )

    def test_cap_subset_monotone_and_seed_reshuffles(self, spark):
        from rheoceros_spark.operators import domain_cap

        df = _sourced(spark, 200, 2)
        keep5 = {r.doc_id for r in domain_cap(df, cap=5).collect()}
        keep20 = {r.doc_id for r in domain_cap(df, cap=20).collect()}
        assert keep5 <= keep20  # same hash order => prefix property
        other = {r.doc_id for r in domain_cap(df, cap=5, seed=7).collect()}
        assert other != keep5

    def test_small_domains_survive_whole(self, spark):
        from rheoceros_spark.operators import domain_cap

        df = _sourced(spark, 9, 3)  # 3 docs per source, cap above size
        assert domain_cap(df, cap=10).count() == 9

    def test_rejects_bad_cap(self, spark):
        from rheoceros_spark.operators import domain_cap

        with pytest.raises(ValueError, match="cap"):
            domain_cap(_sourced(spark, 4, 2), cap=0)


class TestGroupSplit:
    def test_groups_never_straddle(self, spark):
        from rheoceros_spark.operators import group_split

        df = _sourced(spark, 1000, 40)
        out = group_split(df).collect()
        per_group = {}
        for r in out:
            per_group.setdefault(r.source, set()).add(r.split)
        assert all(len(s) == 1 for s in per_group.values()), "a group straddled splits"
        assert {r.split for r in out} <= {"train", "val", "test"}

    def test_fractions_roughly_honored(self, spark):
        from rheoceros_spark.operators import group_split

        # many tiny groups => group-level buckets approach the fractions
        df = _sourced(spark, 5000, 5000)
        counts = {
            r["split"]: r["n"]
            for r in group_split(df, splits=(("train", 0.8), ("val", 0.1), ("test", 0.1)))
            .groupBy("split").agg(F.count("*").alias("n")).collect()
        }
        assert 0.7 < counts.get("train", 0) / 5000 < 0.9
        assert 0.05 < counts.get("val", 0) / 5000 < 0.15
        assert 0.05 < counts.get("test", 0) / 5000 < 0.15

    def test_stable_under_new_rows(self, spark):
        from rheoceros_spark.operators import group_split

        small = _sourced(spark, 100, 10)
        grown = _sourced(spark, 200, 10)  # same groups, more rows
        a = {r.source: r.split for r in group_split(small).collect()}
        b = {r.source: r.split for r in group_split(grown).collect()}
        assert a == {g: b[g] for g in a}  # adding rows never moves a group

    def test_rejects_bad_fractions(self, spark):
        from rheoceros_spark.operators import group_split

        with pytest.raises(ValueError, match="sum to 1"):
            group_split(_sourced(spark, 4, 2), splits=(("train", 0.5), ("val", 0.1)))

    def test_null_group_lands_in_last_split_and_matches_oracle(self, spark):
        from rheoceros_spark.operators import group_split

        df = spark.createDataFrame(
            [(1, "siteA"), (2, None), (3, "siteB"), (4, None)],
            "doc_id bigint, source string",
        )
        got = {r.doc_id: r.split for r in group_split(df).collect()}
        assert got[2] == "test" and got[4] == "test"
        # cross-engine: the NULL-propagating || oracle agrees (concat()
        # would skip the NULL and hash '0:' into a real bucket)
        import duckdb

        want = {
            r[0]: r[1]
            for r in duckdb.sql(
                """
                SELECT doc_id, CASE
                  WHEN (CAST(('0x' || substr(md5('0' || ':' || source), 1, 15)) AS BIGINT))
                       % 1000000 < 900000 THEN 'train'
                  WHEN (CAST(('0x' || substr(md5('0' || ':' || source), 1, 15)) AS BIGINT))
                       % 1000000 < 950000 THEN 'val'
                  ELSE 'test' END AS split
                FROM (VALUES (1, 'siteA'), (2, NULL), (3, 'siteB'), (4, NULL))
                     AS t(doc_id, source)
                """
            ).fetchall()
        }
        assert got == want


class TestNegativeSamples:
    def test_k_negatives_never_same_source(self, spark):
        from rheoceros_spark.operators import negative_samples

        corpus = _sourced(spark, 400, 4)
        qry = corpus.where(F.col("doc_id") % 100 == 0).select(
            F.col("doc_id").alias("query_id"), "source"
        )
        out = negative_samples(corpus, qry, k=3, n_buckets=4).collect()
        by_q = {}
        src = {r.doc_id: r.source for r in corpus.collect()}
        for r in out:
            by_q.setdefault(r.query_id, []).append(r)
            assert r.neg_source != src[r.query_id]
        assert all(len(v) == 3 for v in by_q.values())
        assert all(sorted(x.neg_rank for x in v) == [1, 2, 3] for v in by_q.values())

    def test_deterministic_and_seed_sensitive(self, spark):
        from rheoceros_spark.operators import negative_samples

        corpus = _sourced(spark, 200, 4)
        qry = corpus.limit(5).select(F.col("doc_id").alias("query_id"), "source")
        a = sorted((r.query_id, r.neg_id) for r in negative_samples(corpus, qry, k=2).collect())
        b = sorted((r.query_id, r.neg_id) for r in negative_samples(corpus, qry, k=2).collect())
        c = sorted((r.query_id, r.neg_id) for r in negative_samples(corpus, qry, k=2, seed=9).collect())
        assert a == b
        assert a != c


class TestBoilerplateNgrams:
    def test_template_grams_flagged_per_source(self, spark):
        from rheoceros_spark.operators import boilerplate_ngrams

        chrome = "copyright acme corp all rights reserved"
        rows = [(i, f"{chrome} unique words {i} here now", "siteA") for i in range(5)]
        rows += [(10, "totally different text entirely", "siteB")]
        # same chrome on siteB only once -> NOT boilerplate there
        rows += [(11, f"{chrome} single occurrence", "siteB")]
        df = spark.createDataFrame(rows, "doc_id bigint, text string, source string")
        out = {r.doc_id: r for r in boilerplate_ngrams(df, n=3, min_docs=3).collect()}
        assert all(out[i].n_boiler > 0 for i in range(5)), "siteA chrome missed"
        assert out[10].n_boiler == 0 and out[11].n_boiler == 0, "cross-source leak"
        assert all(0 <= out[i].boiler_frac <= 1 for i in range(5))

    def test_rejects_bad_params(self, spark):
        from rheoceros_spark.operators import boilerplate_ngrams

        df = spark.createDataFrame([(1, "a b c", "s")], "doc_id bigint, text string, source string")
        with pytest.raises(ValueError, match="min_docs"):
            boilerplate_ngrams(df, min_docs=1)


class TestDedupKeepList:
    def test_chain_keeps_min_and_unpaired_keep_self(self, spark):
        from rheoceros_spark.operators import dedup_keep_list

        docs = spark.createDataFrame(
            [(i,) for i in range(6)], "doc_id bigint"
        )
        pairs = spark.createDataFrame(
            [(1, 2), (2, 3), (4, 5)], "a bigint, b bigint"
        )
        out = {r.doc_id: (r.keep_id, r.is_dup) for r in dedup_keep_list(docs, pairs).collect()}
        assert out[0] == (0, False)          # unpaired keeps itself
        assert out[1] == (1, False)          # cluster representative
        assert out[2] == (1, True)
        assert out[3] == (1, True)           # chained through 2
        assert out[4] == (4, False) and out[5] == (4, True)


def test_dedup_keep_list_custom_id_column(spark):
    from rheoceros_spark.operators import dedup_keep_list

    docs = spark.createDataFrame([(i,) for i in range(4)], "vec_id bigint")
    pairs = spark.createDataFrame([(1, 2)], "a bigint, b bigint")
    out = {r.vec_id: (r.keep_id, r.is_dup)
           for r in dedup_keep_list(docs, pairs, id_col="vec_id").collect()}
    assert out == {0: (0, False), 1: (1, False), 2: (1, True), 3: (3, False)}


def test_corpus_diff_statuses(spark):
    from rheoceros_spark.operators import corpus_diff

    old = spark.createDataFrame(
        [(1, "same text"), (2, "will change"), (3, "to be removed")],
        "doc_id bigint, text string",
    )
    new = spark.createDataFrame(
        [(1, "Same   TEXT"), (2, "changed now"), (4, "brand new doc")],
        "doc_id bigint, text string",
    )
    out = {r.doc_id: r.status for r in corpus_diff(old, new).collect()}
    # normalization makes whitespace/case churn read as unchanged
    assert out == {1: "unchanged", 2: "changed", 3: "removed", 4: "added"}


def test_corpus_diff_null_text_presence(spark):
    """NULL-text docs must diff by PRESENCE, not fingerprint nullity
    (review-caught: fp-null presence tests read every NULL-text row as
    'added')."""
    from rheoceros_spark.operators import corpus_diff

    old = spark.createDataFrame(
        [(1, None), (2, None), (3, None)], "doc_id bigint, text string"
    )
    new = spark.createDataFrame(
        [(2, "now has text"), (3, None)], "doc_id bigint, text string"
    )
    out = {r.doc_id: r.status for r in corpus_diff(old, new).collect()}
    assert out == {1: "removed", 2: "changed", 3: "unchanged"}


def test_ngram_novelty_semantics_and_deferred_oracle(spark):
    """ngram_novelty is deferred from the round-6 driver window (the
    50-slot window hit its cap) but must stay cross-engine verified:
    run the stashed oracle through DuckDB against the Spark operator at
    sf0.001, plus direct semantics checks."""
    from rheoceros_spark.operators import ngram_novelty

    # semantics: fully-copied doc → 0 novelty; fresh doc → 1.0
    ref_rows = [(100 + i, f"common text block number {i} with shared phrasing all around", ) for i in range(3)]
    corpus_rows = [
        (1, ref_rows[0][1]),
        (2, "entirely fresh never seen words combination here today absolutely"),
    ]
    ref = spark.createDataFrame(ref_rows, "doc_id bigint, text string")
    corpus = spark.createDataFrame(corpus_rows, "doc_id bigint, text string")
    out = {r.doc_id: r for r in ngram_novelty(corpus, ref, n=4).collect()}
    assert out[1].novelty_ratio == 0.0
    assert out[2].novelty_ratio == 1.0

    # cross-engine: stashed oracle vs the Spark query shape, sf0.001
    import duckdb

    import __spark_entry__ as entry
    from pyspark.sql import functions as F
    from rheoceros_spark.sources.io import load_table

    sf = "/root/testdata/sf0.001"
    docs = load_table(spark, sf, "documents")
    got = sorted(
        tuple(r)
        for r in ngram_novelty(
            docs.where(F.col("doc_id") % 7 == 0),
            docs.where(F.col("doc_id") % 7 != 0),
            n=8,
        ).collect()
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{sf}/documents.parquet'"
    )
    want = sorted(
        tuple(r) for r in con.execute(entry._ORACLES["curation_ngram_novelty"]).fetchall()
    )
    assert got == want and got


def test_corpus_diff_indexed_rejects_mixed_algo_index(spark):
    """An APPEND-maintained index that mixes fingerprint schemes across
    appends must fail loudly — a single-row sample check would pass and
    silently misclassify the other scheme's documents as 'changed'."""
    from rheoceros_spark.operators.curation import (
        FINGERPRINT_ALGO,
        corpus_diff_indexed,
        fingerprint_index_write,
    )

    good = fingerprint_index_write(
        spark.createDataFrame([(1, "alpha"), (2, "beta")], "doc_id bigint, text string")
    )
    rogue = good.limit(1).withColumn("fp_algo", F.lit("md5_norm_v2"))
    mixed = good.union(rogue)
    new = spark.createDataFrame([(1, "alpha")], "doc_id bigint, text string")
    with pytest.raises(ValueError, match="md5_norm_v2"):
        corpus_diff_indexed(new, mixed)
    # a uniform index under the engine's algo still works
    out = {r.doc_id: r.status for r in corpus_diff_indexed(new, good).collect()}
    assert out[1] == "unchanged" and out[2] == "removed"
    assert FINGERPRINT_ALGO == "md5_norm_v1"


# ---------------------------------------------------------------------------
# cluster_profile — corpus cartography
# ---------------------------------------------------------------------------

def test_cluster_profile_partitions_and_aggregates(spark, sf_dir):
    """Every embedded document lands in exactly one cell; per-cell
    counts sum to the joined corpus; the dominant source really is the
    cell's modal source."""
    from rheoceros_spark.operators.curation import cluster_profile

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    prof = cluster_profile(docs, emb, k=4, iters=1).collect()
    assert 1 <= len(prof) <= 4
    joined_n = (
        docs.where(F.col("doc_id").isNotNull())
        .join(
            emb.where(F.col("vec_id").isNotNull()).select(
                F.col("vec_id").alias("doc_id")
            ),
            "doc_id",
        )
        .count()
    )
    assert sum(r.n_docs for r in prof) == joined_n
    for r in prof:
        assert r.top_source_docs <= r.n_docs
        assert 0 <= r.mean_quality_q <= 1_000_000
        assert r.total_tokens >= r.n_docs  # every doc has >= 1 token here


def test_cluster_profile_reuses_provided_centroids(spark, sf_dir):
    """Passing a trained codebook must skip retraining and produce the
    same cells as training inline with identical params."""
    from rheoceros_spark.operators.curation import cluster_profile
    from rheoceros_spark.operators.similarity import kmeans_centroids

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    base = emb.where(F.col("vec_id").isNotNull()).select("vec_id", "embedding")
    cents = kmeans_centroids(base, 4, 1, "embedding", "vec_id")
    a = {
        r.cell: (r.n_docs, r.top_source)
        for r in cluster_profile(docs, emb, k=4, iters=1).collect()
    }
    b = {
        r.cell: (r.n_docs, r.top_source)
        for r in cluster_profile(docs, emb, k=4, iters=1, cents=cents).collect()
    }
    assert a == b


def test_cluster_profile_modal_source_tie_breaks_ascending(spark):
    from rheoceros_spark.operators.curation import cluster_profile

    # 4 identical vectors -> one cell; sources split 2/2 -> 'a' wins tie
    emb = spark.createDataFrame(
        [(i, [1.0, 0.0]) for i in range(4)], "vec_id long, embedding array<float>"
    )
    docs = spark.createDataFrame(
        [(0, "x y z", "b"), (1, "x y", "a"), (2, "z", "b"), (3, "w", "a")],
        "doc_id long, text string, source string",
    )
    prof = cluster_profile(docs, emb, k=1, iters=1).collect()
    assert len(prof) == 1
    r = prof[0]
    assert r.n_docs == 4 and r.top_source == "a" and r.top_source_docs == 2
    assert r.total_tokens == 7


class TestPplBuckets:
    """CCNet head/middle/tail bucketing: value-granular cuts, exact
    integer boundary semantics, per-group independence, NULL scores."""

    def _buckets(self, spark, rows, **kw):
        from rheoceros_spark.operators.curation import ppl_buckets

        df = spark.createDataFrame(rows, "doc_id long, source string, nll double")
        out = ppl_buckets(df, score_col="nll", group_col="source", **kw)
        return {r.doc_id: r.ppl_bucket for r in out.collect()}

    def test_even_split_30_40_30(self, spark):
        # 10 distinct scores: cum% = 10,20,...,100 -> 3 head, 4 middle, 3 tail
        rows = [(i, "a", float(i)) for i in range(10)]
        got = self._buckets(spark, rows)
        assert [got[i] for i in range(10)] == (
            ["head"] * 3 + ["middle"] * 4 + ["tail"] * 3
        )

    def test_tied_scores_share_one_bucket(self, spark):
        # 4 rows share the lowest score: cum 4/10 = 40% > 30% -> ALL middle
        rows = [(i, "a", 1.0) for i in range(4)] + [
            (i, "a", float(i)) for i in range(4, 10)
        ]
        got = self._buckets(spark, rows)
        assert {got[i] for i in range(4)} == {"middle"}
        # no row is head: the first distinct value already crosses the cut
        assert "head" not in got.values()

    def test_boundary_is_inclusive(self, spark):
        # 10 rows, head_pct=30: cum 3 -> 100*3 <= 30*10 holds, row 2 is head
        rows = [(i, "a", float(i)) for i in range(10)]
        got = self._buckets(spark, rows, head_pct=30, tail_pct=30)
        assert got[2] == "head" and got[3] == "middle"

    def test_groups_cut_independently(self, spark):
        rows = [(i, "a", float(i)) for i in range(10)] + [
            (100 + i, "b", float(1000 + i)) for i in range(10)
        ]
        got = self._buckets(spark, rows)
        # same positional buckets despite disjoint score ranges
        assert got[0] == "head" and got[100] == "head"
        assert got[9] == "tail" and got[109] == "tail"

    def test_null_score_gets_null_bucket(self, spark):
        rows = [(0, "a", None)] + [(i, "a", float(i)) for i in range(1, 11)]
        got = self._buckets(spark, rows)
        assert got[0] is None and got[1] == "head"

    def test_rejects_bad_percentages(self, spark):
        import pytest as _pt

        from rheoceros_spark.operators.curation import ppl_buckets

        df = spark.createDataFrame([(1, "a", 1.0)], "doc_id long, source string, nll double")
        with _pt.raises(ValueError, match="head_pct"):
            ppl_buckets(df, head_pct=60, tail_pct=50)
        with _pt.raises(ValueError, match="head_pct"):
            ppl_buckets(df, head_pct=0, tail_pct=30)


class TestSourceOverlap:
    """Cross-source n-gram overlap matrix: hand-computed counts,
    zero-pair completeness, quantized ratio exactness."""

    def _mat(self, spark, rows, n=1):
        from rheoceros_spark.operators.curation import source_overlap

        df = spark.createDataFrame(rows, "doc_id long, source string, text string")
        out = source_overlap(df, n=n)
        return {(r.source_a, r.source_b): r for r in out.collect()}

    def test_hand_computed_unigram_overlap(self, spark):
        rows = [(1, "a", "w x"), (2, "a", "y"), (3, "b", "w z"), (4, "c", "q")]
        m = self._mat(spark, rows, n=1)
        # complete matrix: all 3 unordered pairs present
        assert set(m) == {("a", "b"), ("a", "c"), ("b", "c")}
        ab = m[("a", "b")]
        assert (ab.n_grams_a, ab.n_grams_b, ab.n_common) == (3, 2, 1)
        assert ab.containment_a == 0.333333  # floor(1e6/3)/1e6 — exact
        assert ab.containment_b == 0.5
        assert ab.jaccard == 0.25
        assert m[("a", "c")].n_common == 0 and m[("b", "c")].jaccard == 0.0

    def test_multiplicity_ignored(self, spark):
        # repeated grams within/between docs of one source count once
        rows = [(1, "a", "w w w"), (2, "a", "w"), (3, "b", "w")]
        m = self._mat(spark, rows, n=1)
        r = m[("a", "b")]
        assert (r.n_grams_a, r.n_grams_b, r.n_common) == (1, 1, 1)
        assert r.jaccard == 1.0

    def test_short_docs_use_partial_gram_convention(self, spark):
        # <n tokens -> ONE padded partial gram (the ngram_novelty
        # convention); identical short docs across sources overlap fully
        rows = [(1, "a", "w x"), (2, "b", "w x")]
        m = self._mat(spark, rows, n=3)
        r = m[("a", "b")]
        assert (r.n_grams_a, r.n_grams_b, r.n_common) == (1, 1, 1)

    def test_three_source_gram_yields_all_pairs(self, spark):
        rows = [(1, "a", "w"), (2, "b", "w"), (3, "c", "w")]
        m = self._mat(spark, rows, n=1)
        assert all(m[p].n_common == 1 for p in m) and len(m) == 3

    def test_rejects_bad_n(self, spark):
        import pytest as _pt

        from rheoceros_spark.operators.curation import source_overlap

        df = spark.createDataFrame([(1, "a", "w")], "doc_id long, source string, text string")
        with _pt.raises(ValueError, match="n must be"):
            source_overlap(df, n=0)


class TestSourceOverlapMinhash:
    """MinHash sketch twin of the exact overlap matrix: identical
    sources estimate 1.0 exactly, disjoint near 0, and the estimate
    tracks the exact Jaccard within the k=64 statistical bound."""

    def _docs(self, spark, rows):
        return spark.createDataFrame(rows, "doc_id long, source string, text string")

    def test_identical_sources_estimate_one(self, spark):
        from rheoceros_spark.operators.curation import source_overlap_minhash

        text = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
        df = self._docs(spark, [(1, "a", text), (2, "b", text)])
        r = source_overlap_minhash(df, n=3, num_hashes=32).collect()[0]
        assert r.n_matches == 32 and r.est_jaccard == 1.0

    def test_disjoint_sources_estimate_near_zero(self, spark):
        from rheoceros_spark.operators.curation import source_overlap_minhash

        df = self._docs(
            spark,
            [(1, "a", "aa bb cc dd ee ff gg hh"), (2, "b", "qq ww rr tt yy uu ii oo")],
        )
        r = source_overlap_minhash(df, n=3, num_hashes=64).collect()[0]
        assert r.est_jaccard < 0.1

    def test_estimate_tracks_exact_on_corpus(self, spark, sf_dir):
        from rheoceros_spark.operators.curation import (
            source_overlap,
            source_overlap_minhash,
        )

        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        exact = {
            (r.source_a, r.source_b): r.jaccard
            for r in source_overlap(docs, n=8).collect()
        }
        est = {
            (r.source_a, r.source_b): r.est_jaccard
            for r in source_overlap_minhash(docs, n=8, num_hashes=64).collect()
        }
        assert set(est) == set(exact)
        # 4-sigma bound at k=64: sigma = sqrt(J(1-J)/64) <= 0.0625
        for pair, j in exact.items():
            assert abs(est[pair] - j) <= 0.25, (pair, j, est[pair])

    def test_rejects_bad_params(self, spark):
        import pytest as _pt

        from rheoceros_spark.operators.curation import source_overlap_minhash

        df = self._docs(spark, [(1, "a", "x")])
        with _pt.raises(ValueError, match="must be"):
            source_overlap_minhash(df, n=0)
        with _pt.raises(ValueError, match="must be"):
            source_overlap_minhash(df, num_hashes=0)


class TestPplThresholds:
    """Persisted-threshold form of the perplexity gate: assign against
    ppl_thresholds must reproduce ppl_buckets bit-for-bit, survive
    persistence round-trips, and stream statelessly."""

    def _scored(self, spark, rows):
        return spark.createDataFrame(rows, "doc_id long, source string, nll double")

    def test_assign_reproduces_ppl_buckets(self, spark):
        from rheoceros_spark.operators.curation import (
            ppl_bucket_assign,
            ppl_buckets,
            ppl_thresholds,
        )

        rows = (
            [(i, "a", float(i)) for i in range(10)]
            + [(100 + i, "b", 5.0) for i in range(4)]  # all-tied group
            + [(200 + i, "c", float(i % 3)) for i in range(9)]
            + [(300, "a", None)]
        )
        df = self._scored(spark, rows)
        direct = {r.doc_id: r.ppl_bucket for r in ppl_buckets(df).collect()}
        thr = ppl_thresholds(df)
        assigned = {
            r.doc_id: r.ppl_bucket for r in ppl_bucket_assign(df, thr).collect()
        }
        assert assigned == direct

    def test_thresholds_survive_parquet_roundtrip(self, spark, tmp_path):
        from rheoceros_spark.operators.curation import (
            ppl_bucket_assign,
            ppl_buckets,
            ppl_thresholds,
        )

        train = self._scored(spark, [(i, "a", float(i)) for i in range(10)])
        p = str(tmp_path / "thr.parquet")
        ppl_thresholds(train).write.mode("overwrite").parquet(p)
        thr = spark.read.parquet(p)
        # NEW data labeled against the trained cuts: scores 0-2 head,
        # 3-6 middle, 7+ tail (the 30/40/30 cuts of the train set)
        new = self._scored(spark, [(50, "a", 1.0), (51, "a", 5.0), (52, "a", 9.5)])
        got = {r.doc_id: r.ppl_bucket for r in ppl_bucket_assign(new, thr).collect()}
        assert got == {50: "head", 51: "middle", 52: "tail"}

    def test_unknown_group_and_null_score_get_null_bucket(self, spark):
        from rheoceros_spark.operators.curation import (
            ppl_bucket_assign,
            ppl_thresholds,
        )

        train = self._scored(spark, [(i, "a", float(i)) for i in range(10)])
        thr = ppl_thresholds(train)
        new = self._scored(spark, [(1, "zz", 1.0), (2, "a", None)])
        got = {r.doc_id: r.ppl_bucket for r in ppl_bucket_assign(new, thr).collect()}
        assert got == {1: None, 2: None}

    def test_stream_gate_matches_batch(self, spark, tmp_path):
        from pyspark.sql import functions as F  # noqa: F811

        from rheoceros_spark.operators.curation import (
            ppl_bucket_assign,
            ppl_thresholds,
        )
        from rheoceros_spark.streaming.stream import stream_ppl_gate

        train = self._scored(spark, [(i, "a", float(i)) for i in range(10)])
        thr = ppl_thresholds(train)
        new = self._scored(
            spark, [(i, "a", float(i) + 0.5) for i in range(10)]
        )
        batch = {r.doc_id: r.ppl_bucket for r in ppl_bucket_assign(new, thr).collect()}

        src = str(tmp_path / "ppl_src")
        new.coalesce(1).write.mode("overwrite").parquet(src)
        out = []
        sdf = spark.readStream.schema(new.schema).parquet(src)
        q = (
            stream_ppl_gate(sdf, thr)
            .writeStream.foreachBatch(lambda b, i: out.extend(b.collect()))
            .trigger(availableNow=True)
            .option("checkpointLocation", str(tmp_path / "ckpt_ppl"))
            .start()
        )
        q.awaitTermination(120)
        assert {r.doc_id: r.ppl_bucket for r in out} == batch


def test_source_overlap_ignores_blank_rows(spark):
    # review-caught: blank rows padded a '' gram shared by any two
    # sources containing one; both the exact matrix and the minhash
    # twin must treat all-blank sources as having NO shared content
    from rheoceros_spark.operators.curation import (
        source_overlap,
        source_overlap_minhash,
    )

    df = spark.createDataFrame(
        [(1, "a", "real words here"), (2, "a", ""), (3, "b", "   "),
         (4, "b", "other text entirely"), (5, "c", "")],
        "doc_id long, source string, text string",
    )
    exact = {(r.source_a, r.source_b): r for r in source_overlap(df, n=2).collect()}
    assert exact[("a", "b")].n_common == 0
    # source c has ONLY blank rows -> no grams -> absent from the matrix
    assert ("a", "c") not in exact and ("b", "c") not in exact
    est = {
        (r.source_a, r.source_b): r
        for r in source_overlap_minhash(df, n=2, num_hashes=16).collect()
    }
    assert est[("a", "b")].est_jaccard < 1.0
    assert ("a", "c") not in est
