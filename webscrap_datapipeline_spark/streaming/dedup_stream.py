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

The one cost that DOES grow with stream age — one parquet partition
per micro-batch, 2,880/day at 30 s triggers, eventually dominating the
per-batch file listing — is reclaimed by :func:`compact_lsh_index`,
which folds all partitions at or below a committed batch id into one
consolidated negative-id partition with crash-safe ordering
(scratch-write → atomic rename → delete); :func:`last_committed_batch`
reads the replay-safety watermark from the stream's own checkpoint.
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


def last_committed_batch(spark, checkpoint_dir: str) -> int:
    """Highest micro-batch id the checkpoint has COMMITTED (the
    ``commits/`` log — public Structured Streaming checkpoint layout:
    one integer-named file per committed batch). Batches ≤ this id can
    never replay, which makes them safe to fold in
    :func:`compact_lsh_index`. Returns -1 for a fresh/absent
    checkpoint (nothing committed — only the bootstrap partition is
    foldable, i.e. compaction is a no-op)."""
    jvm = spark._jvm
    commits = jvm.org.apache.hadoop.fs.Path(checkpoint_dir + "/commits")
    fs = commits.getFileSystem(spark._jsc.hadoopConfiguration())
    if not fs.exists(commits):
        return -1
    best = -1
    for st in fs.listStatus(commits):
        name = st.getPath().getName()
        try:
            best = max(best, int(name))
        except ValueError:
            continue  # .tmp / metadata files
    return best


def compact_lsh_index(spark, index_dir: str, upto_batch_id: int) -> dict:
    """Fold every index partition with ``__batch_id <= upto_batch_id``
    into ONE consolidated partition — the maintenance operator that
    keeps per-batch cost flat over the stream's LIFETIME. Without it
    the index accrues one parquet partition per micro-batch forever
    (2,880/day at 30 s triggers): the (band, bucket) join stays
    batch-proportional, but the per-batch file LISTING grows with
    stream age — the classic small-files failure, hit at month-scale
    even on a 1000-executor cluster.

    Safety contract: ``upto_batch_id`` must not exceed
    :func:`last_committed_batch` of the stream's checkpoint. Committed
    batches never replay, and any future or replayed batch k >
    upto_batch_id still selects the consolidated rows through its
    ``__batch_id < k`` pre-batch filter (the consolidated partition
    takes a fresh NEGATIVE id below every real batch id and below
    previous consolidations). Folding an UNcommitted batch would let
    its replay see its own rows — self-pairs — which is exactly what
    the contract rules out.

    Crash-safe by ordering, not by locks: (1) consolidated rows are
    written to a dot-prefixed scratch dir Spark's file index ignores,
    (2) one atomic rename publishes it as the new partition, (3) only
    then are the folded partition dirs deleted. A crash before (2)
    leaves an ignored orphan (overwritten on re-run); a crash between
    (2) and (3) leaves duplicate rows, which the candidate miner's
    posting-list ``collect_set`` + ``distinct`` make content-harmless
    until a re-run folds them away (the consolidation itself
    re-distincts). Re-running compaction is always safe.

    Returns ``{"folded_partitions", "rows", "new_partition_id"}``.
    """
    jvm = spark._jvm
    root = jvm.org.apache.hadoop.fs.Path(index_dir)
    fs = root.getFileSystem(spark._jsc.hadoopConfiguration())
    if not fs.exists(root):
        return {"folded_partitions": 0, "rows": 0, "new_partition_id": None}
    part_vals: list[int] = []
    for st in fs.listStatus(root):
        name = st.getPath().getName()
        if st.isDirectory() and name.startswith("__batch_id="):
            part_vals.append(int(name.split("=", 1)[1]))
    folded = [v for v in part_vals if v <= upto_batch_id]
    if len(folded) <= 1:
        return {"folded_partitions": 0, "rows": 0, "new_partition_id": None}
    new_id = min(min(part_vals), -1) - 1
    consolidated = (
        spark.read.parquet(index_dir)
        .filter(F.col("__batch_id") <= upto_batch_id)
        .select("doc", "band", "bucket")
        .distinct()
    )
    scratch = index_dir.rstrip("/") + "/.compact_scratch"
    consolidated.write.mode("overwrite").parquet(scratch)
    n_rows = spark.read.parquet(scratch).count()
    ok = fs.rename(
        jvm.org.apache.hadoop.fs.Path(scratch),
        jvm.org.apache.hadoop.fs.Path(f"{index_dir.rstrip('/')}/__batch_id={new_id}"),
    )
    if not ok:  # pragma: no cover - FS race; orphan scratch is ignored
        raise IOError(f"compact_lsh_index: publish rename failed under {index_dir}")
    for v in folded:
        fs.delete(
            jvm.org.apache.hadoop.fs.Path(f"{index_dir.rstrip('/')}/__batch_id={v}"),
            True,
        )
    return {
        "folded_partitions": len(folded),
        "rows": n_rows,
        "new_partition_id": new_id,
    }


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
