"""Streaming incremental near-dup detection — the operator a 100 TB
ingest actually runs (round-8 VERDICT item 4).

The batch twin (`operators/dedup.incremental_lsh_candidates`, unit- and
recall-pinned; the LSH family itself oracled via
`minhash_lsh_portable_pairs`) mines ONE new batch against a stored LSH
band index at cost proportional to the batch, never the corpus. This
module wires that operator into Structured Streaming via
``foreachBatch``: each micro-batch of arriving documents

  1. reads the persisted corpus index (``(doc, band, bucket)`` parquet,
     `operators/dedup.lsh_band_index` layout),
  2. mines candidate pairs — new-vs-corpus by (band, bucket) equi-join
     plus new-vs-new from the batch's own banding
     (`incremental_lsh_candidates_from_index`, the exact batch-twin
     relation),
  3. writes the pairs partitioned by ``__batch_id`` (dynamic partition
     overwrite — a replayed batch rewrites exactly its own output, the
     same idempotence discipline as `sinks.warehouse_append_sink`),
  4. only THEN appends the batch's own band rows to the index, also
     ``__batch_id``-partitioned (the reference's commit ordering, ST2:
     a crash between 3 and 4 replays the batch against the same
     pre-batch index and overwrites the same partitions — no lost
     pairs, no duplicate index rows).

Scale posture: per-batch cost is O(|batch| × bands) signature work plus
one equi-join against the index on the batch's (band, bucket) keys.
The index grows with the corpus, but the join only touches buckets the
batch hashes into — at warehouse scale the index is a bucketed table
on (band, bucket) so the probe side co-locates without re-shuffling
the corpus per batch. Measured in SCALE.md ("Streaming incremental
near-dup", round 9): per-batch cost vs corpus-index size.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.dedup import (
    incremental_lsh_candidates_from_index,
    lsh_band_index,
    minhash_signatures,
)


def _fs_exists(spark, path: str) -> bool:
    """Existence check through the HADOOP filesystem of ``path`` — a
    driver-local ``os.path.isdir`` silently returns False for hdfs://,
    s3a://, or file:/ URIs the read/write calls in this module accept,
    which would empty the corpus side and drop every new-vs-corpus
    pair without an error (round-9 review)."""
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    return bool(fs.exists(hpath))


def bootstrap_lsh_index(
    docs: DataFrame,
    index_dir: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    num_hashes: int = 32,
    bands: int = 8,
    rows_per_band: int = 4,
) -> None:
    """Seed ``index_dir`` with the band index of an existing corpus —
    the one-time batch backfill before the stream takes over. Stamped
    ``__batch_id = -1`` so streaming batches (ids ≥ 0) can never
    collide with the bootstrap partition."""
    sigs = minhash_signatures(docs, text_col, id_col, n, num_hashes)
    (
        lsh_band_index(sigs, bands, rows_per_band)
        .withColumn("__batch_id", F.lit(-1).cast("long"))
        .write.mode("overwrite")
        .partitionBy("__batch_id")
        .parquet(index_dir)
    )


def incremental_near_dup_sink(
    index_dir: str,
    pairs_dir: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    num_hashes: int = 32,
    bands: int = 8,
    rows_per_band: int = 4,
) -> Callable[[DataFrame, int], None]:
    """Build the foreachBatch function. Attach with::

        stream.writeStream.foreachBatch(
            incremental_near_dup_sink(index_dir, pairs_dir)
        ).option("checkpointLocation", ckpt).start()

    Output: ``pairs_dir`` accumulates (doc_a, doc_b, __batch_id) rows —
    doc_a the arriving doc for new-vs-corpus pairs, a<b sorted for
    new-vs-new pairs — exactly the batch operator's candidate set per
    batch, so downstream verification (jaccard rescore, cluster/
    survivor choice) reuses the batch operators unchanged."""

    def mine_batch(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        sigs = minhash_signatures(batch_df, text_col, id_col, n, num_hashes)
        # localCheckpoint: the batch index feeds BOTH the pair mine and
        # the index append; without it the lineage recomputes the
        # batch's signatures twice per micro-batch. Eager is fine — the
        # frame is micro-batch-sized by construction.
        new_idx = lsh_band_index(sigs, bands, rows_per_band).localCheckpoint(
            eager=True
        )
        if _fs_exists(spark, index_dir):
            # the corpus side is the index AS IT STOOD BEFORE THIS
            # BATCH (__batch_id < batch_id, partition-pruned): a
            # replayed batch then mines against exactly the same
            # corpus no matter how many later batches landed before
            # the replay — pair output is a pure function of
            # (batch, batch_id), which is what makes the partition
            # overwrite idempotent in CONTENT and not just in layout
            corpus = spark.read.parquet(index_dir).filter(
                F.col("__batch_id") < batch_id
            )
        else:
            # first batch, no bootstrap: corpus side is empty — pairs
            # reduce to the batch's own new-vs-new posting lists
            corpus = new_idx.limit(0)
        pairs = incremental_lsh_candidates_from_index(corpus, new_idx)
        (
            pairs.withColumn("__batch_id", F.lit(batch_id).cast("long"))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("__batch_id")
            .parquet(pairs_dir)
        )
        # index advances ONLY after the pairs write returned (ST2
        # ordering); __batch_id partitioning makes a replay overwrite
        # its own rows instead of double-appending
        (
            new_idx.withColumn("__batch_id", F.lit(batch_id).cast("long"))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("__batch_id")
            .parquet(index_dir)
        )

    return mine_batch
