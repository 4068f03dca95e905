"""Round-13 additions: in-context pretraining ordering (icp_order) and
fuzzy host-level mirror detection (url_mirror_pairs) — edge semantics
the fixture corpus can't exercise: tie-breaks, restarts, singleton
cells, the stop-path df-cap, and the packing composition."""

import pytest
from pyspark.sql import functions as F

from rheoceros_spark.operators.curation import icp_order, pack_sequences
from rheoceros_spark.operators.urls import url_mirror_pairs


def _vecs(spark, rows):
    return spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")


class TestIcpOrder:
    def test_walk_is_greedy_with_restart_and_tiebreaks(self, spark):
        """Hand-built geometry, ONE cell (k=1): the walk must start at
        the smallest id, hop to the most-similar unvisited neighbor,
        and restart at the smallest unvisited id when the top-m
        frontier is exhausted."""
        # 0 and 1 nearly parallel; 2 orthogonal-ish to both; 3 opposite
        rows = [
            (0, [1.0, 0.0, 0.0]),
            (1, [0.999, 0.04, 0.0]),
            (2, [0.0, 1.0, 0.0]),
            (3, [-1.0, 0.001, 0.0]),
        ]
        out = icp_order(_vecs(spark, rows), k=1, iters=1, m=1).orderBy("pos")
        got = [(r.vec_id, r.link_sim_q is None) for r in out.collect()]
        # m=1: 0's only neighbor is 1; 1's only neighbor is 0 (visited)
        # → restart at min unvisited (2); 2's top neighbor is 0 or 1
        # (visited) → restart at 3
        assert got[0] == (0, True)
        assert got[1] == (1, False)
        assert [g[0] for g in got] == [0, 1, 2, 3]
        assert got[2][1] and got[3][1]  # both were restarts

    def test_positions_tile_each_cell_and_cover_all_ids(self, spark, sf_dir):
        from rheoceros_spark.sources.io import load_table

        emb = load_table(spark, sf_dir, "embeddings")
        out = icp_order(emb, k=8, iters=2, m=4)
        rows = out.collect()
        assert len(rows) == emb.where(F.col("vec_id").isNotNull()).count()
        assert len({r.vec_id for r in rows}) == len(rows)  # a permutation
        by_cell = {}
        for r in rows:
            by_cell.setdefault(r.cell, []).append(r.pos)
        for cell, ps in by_cell.items():
            assert sorted(ps) == list(range(len(ps))), cell
        # every non-restart link carries a quantized similarity
        assert any(r.link_sim_q is not None for r in rows)
        # pos 0 of every cell is a start → NULL link
        assert all(
            r.link_sim_q is None for r in rows if r.pos == 0
        )

    def test_m_validation_is_loud(self, spark):
        with pytest.raises(ValueError, match="m must be"):
            icp_order(_vecs(spark, [(0, [1.0, 0.0])]), m=0)

    def test_zero_norm_and_null_embeddings_order_via_restart(self, spark):
        """A zero-norm (or NULL) embedding yields NULL cosines; those
        edges must be DROPPED at the edge build — with m larger than
        the non-null neighbor count they would otherwise survive the
        top-m window as NaN and crash the integer walk.  The affected
        docs still appear in the order, linked through restarts."""
        rows = [
            (0, [1.0, 0.0, 0.0]),
            (1, [0.999, 0.04, 0.0]),
            (2, [0.0, 0.0, 0.0]),  # zero norm → NULL sim to everything
            (3, None),  # NULL embedding
        ]
        out = icp_order(_vecs(spark, rows), k=1, iters=1, m=3).collect()
        assert sorted(r.vec_id for r in out) == [0, 1, 2, 3]
        by_id = {r.vec_id: r for r in out}
        # the degenerate docs can only be reached by restart: no
        # incoming edge carries a similarity
        assert by_id[2].link_sim_q is None
        assert by_id[3].link_sim_q is None
        # the real pair still walks with a quantized link
        assert by_id[1].link_sim_q is not None or by_id[0].link_sim_q is not None

    def test_cell_size_guard_refuses_undersized_k(self, spark):
        """The 10-100k SemDeDup sizing is enforced, not a docstring:
        k=1 over 40 docs with max_cell_size=8 must refuse loudly."""
        rows = [(i, [1.0, float(i % 7) / 7.0]) for i in range(40)]
        with pytest.raises(ValueError, match="max_cell_size"):
            icp_order(_vecs(spark, rows), k=1, iters=1, m=2, max_cell_size=8)
        # the opt-out accepts the quadratic cost knowingly
        out = icp_order(
            _vecs(spark, rows), k=1, iters=1, m=2, max_cell_size=None
        ).collect()
        assert len(out) == 40

    def test_salted_pair_join_is_invisible_in_the_output(self, spark):
        """The r14 skew salt (a-side hashed, b-side exploded) splits a
        hot cell across tasks but must not change a single edge: the
        pair set, top-m edges, and therefore the walk are identical
        for salt=1 (the unsalted plan) and any salt > 1."""
        rows = [
            (i, [float((i * 13) % 11) / 11.0, float((i * 7) % 5) / 5.0, 1.0])
            for i in range(60)
        ]
        base = icp_order(
            _vecs(spark, rows), k=2, iters=1, m=3, salt=1
        ).orderBy("cell", "pos").collect()
        for s in (4, 16):
            salted = icp_order(
                _vecs(spark, rows), k=2, iters=1, m=3, salt=s
            ).orderBy("cell", "pos").collect()
            assert [tuple(r) for r in salted] == [tuple(r) for r in base], s

    def test_composes_with_pack_sequences(self, spark):
        """The ICP contract (Shi et al. §3: pack the WALK order into
        context windows): feed (cell → shard, pos → sort key) into
        pack_sequences — consecutive walk positions land in the same
        bin, so a context window holds retrieval-related neighbors."""
        rows = [
            (i, [1.0 * (i % 3 == 0), 1.0 * (i % 3 == 1), 1.0 * (i % 3 == 2)])
            for i in range(8)
        ]
        order = icp_order(_vecs(spark, rows), k=1, iters=1, m=2)
        docs = order.select(
            F.col("vec_id").alias("doc_id"),
            F.col("cell").alias("shard"),
            F.col("pos").alias("sort_key"),
            F.lit(4).alias("n_tokens"),
        )
        packed = pack_sequences(docs, budget=8).collect()
        assert len(packed) == 8
        by_bin = {}
        for r in packed:
            by_bin.setdefault((r.shard, r.bin_id), []).append(r.sort_key)
        # budget 8 / 4 tokens → every bin holds exactly 2 CONSECUTIVE
        # walk positions
        for ps in by_bin.values():
            assert len(ps) == 2 and abs(ps[0] - ps[1]) == 1


class TestUrlMirrorPairs:
    def _urls(self, spark, rows):
        return spark.createDataFrame(rows, "doc_id bigint, url string")

    def test_exact_mirror_detected_and_nonmirror_not(self, spark):
        rows = []
        for i in range(8):
            rows.append((100 + i, f"https://a.example.com/page/{i}"))
            rows.append((200 + i, f"https://b.example.com/page/{i}"))
        rows += [(300 + i, f"https://c.example.com/other/{i}") for i in range(8)]
        out = url_mirror_pairs(self._urls(spark, rows), threshold=0.5).collect()
        pairs = {(r.domain_a, r.domain_b): r for r in out}
        assert ("a.example.com", "b.example.com") in pairs
        hit = pairs[("a.example.com", "b.example.com")]
        assert hit.jaccard_r == 1.0 and hit.n_shared == 8
        assert not any("c.example.com" in p for p in pairs)

    def test_www_and_tracker_variants_still_mirror(self, spark):
        """Canonicalization feeds the path sets: www/scheme-case/port
        and tracker-param noise must not break the mirror signal."""
        rows = []
        for i in range(6):
            rows.append((i, f"HTTPS://WWW.m1.example.com:443/p/{i}?utm_source=x"))
            rows.append((10 + i, f"https://m2.example.com/p/{i}"))
        out = url_mirror_pairs(self._urls(spark, rows), threshold=0.9).collect()
        assert len(out) == 1
        r = out[0]
        assert (r.domain_a, r.domain_b) == ("m1.example.com", "m2.example.com")
        assert r.jaccard_r == 1.0

    def test_max_hosts_drops_ubiquitous_paths_symmetrically(self, spark):
        """'/' lives on every host; with max_hosts it must vanish from
        BOTH the signature and the verify, so two hosts sharing ONLY
        ubiquitous paths stop being mirrors."""
        rows = []
        for h in "abcdefgh":
            rows.append((ord(h), f"https://{h}.example.com/"))
        # a and b also share one real path → still a candidate pair,
        # but jaccard is computed over the CAPPED sets
        rows.append((1000, "https://a.example.com/only"))
        rows.append((1001, "https://b.example.com/only"))
        capped = url_mirror_pairs(
            self._urls(spark, rows), threshold=0.5, max_hosts=4
        ).collect()
        got = {(r.domain_a, r.domain_b): r for r in capped}
        assert ("a.example.com", "b.example.com") in got
        assert got[("a.example.com", "b.example.com")].jaccard_r == 1.0
        assert got[("a.example.com", "b.example.com")].n_paths_a == 1
        # with the cap opted out, every host pair mirrors through '/'
        uncapped = url_mirror_pairs(
            self._urls(spark, rows), threshold=0.5, max_hosts=None
        ).collect()
        assert len(uncapped) > len(capped)

    def test_verify_uses_full_width_path_ids(self, spark):
        """Two DIFFERENT paths whose 60-bit hashes collide mod 2^32
        (found by offline birthday search over '/c/{i}':
        md5('/c/48839')[:15] and md5('/c/68069')[:15] are 1091851121
        mod 2^32 but differ at full width).  The 32-bit signature tier
        sees them as equal — the hosts become a banded CANDIDATE pair
        — but the exact verify joins FULL h64 ids, counts zero shared
        paths, and the pair must not survive.  Under the old 32-bit
        verify this fixture reported a spurious jaccard-1.0 mirror."""
        rows = [
            (0, "https://p.example.com/c/48839"),
            (1, "https://q.example.com/c/68069"),
        ]
        out = url_mirror_pairs(self._urls(spark, rows), threshold=0.01).collect()
        assert out == []

    def test_null_and_uncanonicalizable_urls_drop(self, spark):
        rows = [
            (0, None),
            (1, "not a url"),
            (2, "https://x.example.com/p"),
            (3, "https://y.example.com/p"),
        ]
        out = url_mirror_pairs(self._urls(spark, rows), threshold=0.5).collect()
        assert len(out) == 1
        assert out[0].n_shared == 1
