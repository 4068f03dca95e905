"""Snapshot-scoped dedup + the persisted BPE tokenizer artifact.

The two r11-staged families: (1) FineWeb-style per-snapshot exact
dedup with an optional cross-snapshot earliest-wins pass, pinned equal
to the APPEND-maintained fingerprint-index incremental pipeline; (2)
the train-once/tokenize-everywhere merge-table artifact with
loud-mismatch validation and a stateless streaming twin.
"""

import pytest
from pyspark.sql import functions as F

from rheoceros_spark.operators.dedup import dedup_snapshot_scoped
from rheoceros_spark.operators.text_analysis import (
    BPE_DEMO_MERGES,
    BPE_TABLE_ALGO,
    bpe_encode,
    bpe_table_read,
    bpe_table_write,
    bpe_train,
)


@pytest.fixture(scope="module")
def snap_df(spark):
    # content A in snapshots 0+1, content B only in 1 (twice), C only
    # in 2, one NULL text per snapshot-ish
    rows = [
        (1, 0, "alpha  beta"),
        (2, 0, "Alpha beta"),      # dup of 1 within snapshot 0 (case/ws)
        (3, 1, "alpha beta"),      # same content, later snapshot
        (4, 1, "gamma"),
        (5, 1, "gamma"),           # dup of 4 within snapshot 1
        (6, 2, "delta"),
        (7, 2, None),              # NULL text passes through
        (8, None, "gamma"),        # NULL snapshot = its own scope
    ]
    return spark.createDataFrame(rows, "doc_id long, snapshot int, text string")


class TestSnapshotScopedDedup:
    def test_within_snapshot_only(self, snap_df):
        got = {r["doc_id"] for r in dedup_snapshot_scoped(snap_df).collect()}
        # 2 loses to 1 (snapshot 0); 5 loses to 4 (snapshot 1); 3
        # SURVIVES — same content as 1 but per-snapshot scope (the
        # FineWeb discipline); 8 survives in its own NULL scope
        assert got == {1, 3, 4, 6, 7, 8}

    def test_cross_snapshot_earliest_wins(self, snap_df):
        got = {
            r["doc_id"]
            for r in dedup_snapshot_scoped(snap_df, cross_snapshot=True).collect()
        }
        # 3 now loses too (content first seen in snapshot 0); 8's
        # content ('gamma') is first seen in snapshot 1, so the
        # NULL-snapshot copy defers to it (min() skips NULL)
        assert got == {1, 4, 6, 7}

    def test_incremental_index_pipeline_equality(self, spark, sf_dir, tmp_path):
        """cross_snapshot=True ≡ the incremental pipeline: process
        snapshots in crawl order, dedup each batch internally, anti-join
        against the persisted fingerprint index, append the novel
        fingerprints — old text is never rescanned.  Run on the real
        documents table with the staged query's duplicate-injecting
        fixture, so the equality is non-vacuous."""
        from rheoceros_spark.operators.curation import fingerprint_index_write
        from rheoceros_spark.operators.dedup import dedup_exact

        docs = (
            spark.read.parquet(f"{sf_dir}/documents.parquet")
            .where(F.col("doc_id").isNotNull())
            .select(
                "doc_id",
                F.expr(
                    "CASE WHEN doc_id % 7 = 0 "
                    "THEN 'shared crawl page ' || CAST(doc_id % 20 AS STRING) "
                    "ELSE text END"
                ).alias("text"),
                (F.col("doc_id") % 3).alias("snapshot"),
            )
        )
        expected = {
            r["doc_id"]
            for r in dedup_snapshot_scoped(docs, cross_snapshot=True)
            .where(F.col("text").isNotNull())
            .collect()
        }

        idx_path = str(tmp_path / "fp_idx")
        got: set = set()
        for i, snap in enumerate(sorted(r[0] for r in docs.select("snapshot").distinct().collect())):
            batch = docs.where(F.col("snapshot") == snap)
            batch_dedup = dedup_exact(batch).where(F.col("text").isNotNull())
            if i == 0:
                novel = batch_dedup
            else:
                from rheoceros_spark.functions.portable import normalize_text

                index = spark.read.parquet(idx_path)
                fps = index.select("fp").distinct()
                keyed = batch_dedup.withColumn(
                    "fp", F.md5(normalize_text(F.col("text")))
                )
                novel = keyed.join(fps, on="fp", how="left_anti").drop("fp")
            got |= {r["doc_id"] for r in novel.collect()}
            fingerprint_index_write(
                novel, idx_path, mode="overwrite" if i == 0 else "append"
            )
        assert got == expected and expected


class TestBpeTableArtifact:
    def test_roundtrip_demo_and_trained(self, spark, tmp_path):
        path = str(tmp_path / "bpe_demo")
        bpe_table_write(spark, BPE_DEMO_MERGES, path)
        assert bpe_table_read(spark.read.parquet(path)) == list(BPE_DEMO_MERGES)

        docs = spark.createDataFrame(
            [(i, "banana band bandana " * 3) for i in range(20)],
            "doc_id long, text string",
        )
        trained = bpe_train(docs, n_merges=4)
        assert trained  # non-vacuous
        p2 = str(tmp_path / "bpe_trained")
        bpe_table_write(spark, trained, p2)
        assert bpe_table_read(spark.read.parquet(p2)) == trained

    def test_artifact_tokenization_bit_equal(self, spark, tmp_path):
        docs = spark.createDataFrame(
            [(1, "the theatre"), (2, None), (3, "a ba ab")],
            "doc_id long, text string",
        )
        path = str(tmp_path / "bpe_t")
        merges = bpe_table_read(bpe_table_write(spark, BPE_DEMO_MERGES, path))
        direct = {
            (r.doc_id, tuple(r.bpe_tokens or []))
            for r in bpe_encode(docs, list(BPE_DEMO_MERGES)).collect()
        }
        via_artifact = {
            (r.doc_id, tuple(r.bpe_tokens or []))
            for r in bpe_encode(docs, merges).collect()
        }
        assert direct == via_artifact

    def test_loud_mismatches(self, spark):
        ok = bpe_table_write(spark, [("a", "b"), ("ab", "c")])
        # foreign scheme tag
        foreign = ok.withColumn("bpe_algo", F.lit("bpe_merge_v9"))
        with pytest.raises(ValueError, match="bpe_algo"):
            bpe_table_read(foreign)
        # rank gap
        gap = ok.withColumn(
            "rank", F.when(F.col("rank") == 1, F.lit(5)).otherwise(F.col("rank"))
        )
        with pytest.raises(ValueError, match="ranks"):
            bpe_table_read(gap)
        # duplicate rank
        dup = ok.withColumn("rank", F.lit(0))
        with pytest.raises(ValueError, match="ranks"):
            bpe_table_read(dup)
        # missing column
        with pytest.raises(ValueError, match="missing"):
            bpe_table_read(ok.drop("lhs"))
        # out-of-training-order operands (rank order swapped)
        swapped = ok.withColumn("rank", F.lit(1) - F.col("rank"))
        with pytest.raises(ValueError, match="earlier rule"):
            bpe_table_read(swapped)
        # writing a malformed table fails at the producer
        with pytest.raises(ValueError, match="earlier rule"):
            bpe_table_write(spark, [("xy", "z")])
        assert bpe_table_read(ok) == [("a", "b"), ("ab", "c")]


def test_stream_bpe_tokenize_matches_batch(spark, sf_dir, tmp_path):
    """Micro-batched tokenization under the persisted artifact is
    bit-equal to the batch encoder — stateless, so batching cannot
    change a single token."""
    from rheoceros_spark.streaming.stream import stream_bpe_tokenize

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(120)
    src_dir = str(tmp_path / "docs_src")
    docs.coalesce(3).write.mode("overwrite").parquet(src_dir)
    batch_docs = spark.read.parquet(src_dir)

    table = bpe_table_write(spark, BPE_DEMO_MERGES, str(tmp_path / "tbl"))
    expected = {
        (r.doc_id, r.n_bpe_tokens, tuple(r.bpe_tokens or []))
        for r in bpe_encode(batch_docs, bpe_table_read(table)).collect()
    }

    sdf = spark.readStream.schema(batch_docs.schema).option(
        "maxFilesPerTrigger", 1
    ).parquet(src_dir)
    out_dir = str(tmp_path / "bpe_out")
    q = (
        stream_bpe_tokenize(sdf, table)
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", str(tmp_path / "bpe_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r.doc_id, r.n_bpe_tokens, tuple(r.bpe_tokens or []))
        for r in spark.read.parquet(out_dir).collect()
    }
    assert got == expected and expected
