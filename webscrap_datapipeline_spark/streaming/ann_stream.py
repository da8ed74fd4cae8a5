"""Streaming ANN index maintenance — similarity search over a LIVE
corpus (the serve-side twin of ``streaming/dedup_stream.py``).

The batch operators (`operators/similarity.lsh_bucket` / `lsh_topk`,
oracled via ``embedding_ann_lsh_topk``) answer top-k against a corpus
that exists up front. A training-data pipeline's corpus doesn't: new
embeddings arrive continuously, and "find what's already similar to
this" must be answerable at any moment without re-bucketing history.
This module persists the cell assignment (hyperplane-LSH buckets or
IVF Voronoi cells) as an append-only index and keeps it current from
a stream:

  1. :func:`bootstrap_ann_index` backfills an existing corpus as the
     ``__batch_id = -1`` partition and pins the GEOMETRY in a
     ``_geometry.json`` sidecar. Two cell geometries, chosen at
     bootstrap: ``hyperplane`` (seeded sign-bit LSH — zero training,
     uniform cells; dim/planes/seed in the sidecar) and ``ivf``
     (nearest-centroid Voronoi cells — higher recall on CLUSTERED
     real-world embeddings at the same probe budget; the train-once
     codebook itself rides in the sidecar, because cell ids are only
     comparable under the exact centroid values). Every protocol below
     is kind-agnostic — nothing downstream cares what a bucket MEANS;
  2. :func:`incremental_ann_sink` is a ``foreachBatch`` function: each
     micro-batch is bucketed map-side (pure column math — no shuffle,
     no fit step, no driver state) and appended as its own
     ``__batch_id`` partition via dynamic partition overwrite, so a
     replayed batch rewrites exactly its own rows (the same
     idempotence discipline as the dedup index and
     `sinks.warehouse_append_sink`);
  3. :func:`ann_query_index` serves top-k against the index AS IT
     STANDS: queries are bucketed with the sidecar's geometry (a
     caller cannot desynchronize plane/codebook math from the
     persisted buckets), expanded by the kind's recall knob —
     Hamming-1 neighbor buckets (`operators/similarity.probe_buckets`)
     for hyperplane, the ``nprobe`` nearest cells for IVF — broadcast
     against the corpus scan, and exact-cosine rescored with a
     total-order tiebreak.

Scale posture — and the deliberate asymmetry with the dedup index:
the dedup mine joins a whole MICRO-BATCH against the corpus, so past
the broadcast envelope it needs the bucketed catalog layout to elide
a corpus-side shuffle. The ANN serve path joins a QUERY SET, which is
small by definition (a serving request, a curation probe list): the
query side always broadcasts, the corpus side is one partition-pruned
scan with NO Exchange in any layout — so plain ``__batch_id``
partitioned parquet is the right layout at every corpus size, and
this module deliberately has no catalog-table variant. Per-query-set
cost is one corpus scan; the only terms that grow with stream age are
the file LISTING (reclaimed by :func:`compact_ann_index`, same
fold discipline as the dedup compactor) and the index ROW count
(bounded by :func:`prune_ann_index` retention when the deployment
wants a windowed corpus).

The geometry sidecar is a correctness guard, not bookkeeping: bucket
ids are only comparable under identical hyperplanes, so a writer or
reader running different (dim, n_planes, seed) against an existing
index would silently produce near-zero recall. Every writer validates
against the sidecar and every reader derives from it; drift fails
loudly at the driver.

Reference lineage: the reference pipeline has no similarity surface
at all (it is 741 lines of scrape→diff→load ETL); this module is part
of the LLM-data-pipeline extension mandated by BASELINE.json, built
on the same commit-ordering discipline as the reference's
state-then-load protocol (reference `main.py:70-90`,
`src/process_files.py:20-31`).
"""

from __future__ import annotations

import json
from collections.abc import Callable

from pyspark.sql import DataFrame, Observation, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.window import Window

from ..functions.vectors import cosine
from ..fsutil import (
    fs_delete,
    fs_dir_size,
    fs_exists,
    fs_read_text,
    fs_rename,
    fs_write_text,
    list_child_names,
)
from ..operators.similarity import (
    _probe_cids,
    ivf_assign,
    lsh_bucket,
    probe_buckets,
)
from .dedup_stream import last_committed_batch

GEOMETRY_FILE = "_geometry.json"


def read_ann_geometry(spark: SparkSession, index_dir: str) -> dict | None:
    """The index's pinned geometry (``dim``, ``n_planes``, ``seed``,
    ``id_type``, ``vec_type``) from the ``_geometry.json`` sidecar;
    None when the index has never been written."""
    txt = fs_read_text(spark, f"{index_dir.rstrip('/')}/{GEOMETRY_FILE}")
    if txt is None:
        return None
    return json.loads(txt)


def _write_geometry(spark: SparkSession, index_dir: str, geo: dict) -> None:
    fs_write_text(
        spark, f"{index_dir.rstrip('/')}/{GEOMETRY_FILE}", json.dumps(geo, sort_keys=True)
    )


def _check_geometry(spark: SparkSession, index_dir: str, geo: dict) -> dict:
    """Validate ``geo`` against the sidecar, writing it on first touch.
    Returns the effective geometry. Raises on ANY mismatch — buckets
    computed under different hyperplane geometry are incomparable, and
    the failure mode without this guard is silent near-zero recall,
    not an error.

    "First touch" requires a genuinely empty index: partition dirs
    WITHOUT a sidecar mean a writer crashed before pinning its
    geometry (or the sidecar was deleted) — adopting the caller's
    geometry over rows bucketed under an unknown one would mix
    incomparable buckets silently, the exact failure this guard
    exists for. Refuse and make the operator re-bootstrap. (Writers
    order sidecar-before-data to keep this window to a crash INSIDE
    the very first write — see :func:`bootstrap_ann_index`.)"""
    existing = read_ann_geometry(spark, index_dir)
    if existing is None:
        if any(
            n.startswith("__batch_id=")
            for n in list_child_names(spark, index_dir, dirs_only=True)
        ):
            raise ValueError(
                f"ANN index under {index_dir} has partition data but no "
                f"{GEOMETRY_FILE} sidecar (a writer crashed before pinning "
                "its geometry): the buckets on disk were computed under an "
                "unknown geometry and cannot be appended to safely — "
                "re-bootstrap the index."
            )
        _write_geometry(spark, index_dir, geo)
        return geo
    if existing != geo:
        raise ValueError(
            f"ANN index geometry mismatch under {index_dir}: index has "
            f"{existing}, caller supplied {geo}. Buckets are only "
            "comparable under identical hyperplanes — re-bootstrap to "
            "change geometry."
        )
    return existing


def _ann_schema(geo: dict) -> T.StructType:
    """Explicit on-disk schema (never inferred — a crash can leave a
    data-file-less partition dir that wedges inference, the round-9
    hardening the dedup index reads got). ``__ingest`` is present only
    in consolidated fold output; reading it over batch partitions
    yields NULL, which :func:`read_ann_index` coalesces with the
    partition id to recover every row's true ingest batch."""
    return T.StructType(
        [
            T.StructField("vec_id", T._parse_datatype_string(geo["id_type"])),
            T.StructField("embedding", T._parse_datatype_string(geo["vec_type"])),
            T.StructField("bucket", T.LongType()),
            T.StructField("__ingest", T.LongType()),
            T.StructField("__batch_id", T.LongType()),
        ]
    )


def _geo_centroids(geo: dict) -> list[tuple[int, list[float]]]:
    return [(i, c) for i, c in enumerate(geo["centroids"])]


def _bucketed_batch(
    df: DataFrame, geo: dict, id_col: str, vec_col: str
) -> DataFrame:
    """Map-side bucketing of one batch into the index row layout —
    sign-bit hyperplane bucket or nearest-centroid IVF cell by the
    geometry's ``kind``; either way pure column math over plan
    literals, no shuffle, no fit step at ingest."""
    base = df.select(
        F.col(id_col).alias("vec_id"), F.col(vec_col).alias("embedding")
    )
    if geo["kind"] == "ivf":
        return ivf_assign(base, "embedding", _geo_centroids(geo)).select(
            "vec_id", "embedding", F.col("cid").cast("long").alias("bucket")
        )
    return lsh_bucket(
        base,
        "embedding",
        dim=geo["dim"],
        n_planes=geo["n_planes"],
        seed=geo["seed"],
    )


def _build_geometry(
    schema,
    id_col: str,
    vec_col: str,
    dim: int,
    n_planes: int,
    seed: int,
    centroids: list[list[float]] | None,
) -> dict:
    """The geometry dict a writer pins / validates. ``kind`` selects
    the cell function: ``hyperplane`` (seeded sign-bit LSH — no
    training, uniform cells) when ``centroids`` is None, else ``ivf``
    (nearest-centroid Voronoi cells — higher recall on CLUSTERED
    real-world embeddings at the same probe budget, at the cost of a
    train-once codebook; train with `operators/clustering.kmeans_fit`
    and pass its centroid list). The codebook lives IN the sidecar:
    cell ids are only comparable under the exact centroid values, so
    they are index geometry in precisely the sidecar's sense — a
    retrained codebook is a re-bootstrap, never an in-place swap."""
    geo = {
        "dim": dim,
        "id_type": schema[id_col].dataType.simpleString(),
        "vec_type": schema[vec_col].dataType.simpleString(),
    }
    if centroids is not None:
        geo["kind"] = "ivf"
        geo["centroids"] = [[float(x) for x in c] for c in centroids]
    else:
        geo["kind"] = "hyperplane"
        geo["n_planes"] = n_planes
        geo["seed"] = seed
    return geo


def bootstrap_ann_index(
    corpus: DataFrame,
    index_dir: str,
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 12,
    seed: int = 7,
    centroids: list[list[float]] | None = None,
) -> int:
    """Seed ``index_dir`` with an existing corpus (one-time batch
    backfill before the stream takes over), stamped ``__batch_id = -1``
    so streaming batches (ids ≥ 0) never collide. Replaces any prior
    index and pins the geometry sidecar. Returns the row count.
    Passing ``centroids`` makes the index IVF-celled instead of
    hyperplane-bucketed (see :func:`_build_geometry`); every other
    protocol — partitions, replay, compaction, retention, serve cuts —
    is identical, because none of them care what the bucket MEANS.

    The sidecar is written BEFORE the data: a crash mid-backfill then
    leaves (sidecar, partial data) — a later writer with matching
    geometry appends safely, a mismatched one fails loudly, and a
    re-bootstrap replaces the lot. Data-before-sidecar would leave
    rows bucketed under an unrecorded geometry, which
    :func:`_check_geometry` must refuse outright (it cannot know what
    planes produced them)."""
    spark = corpus.sparkSession
    geo = _build_geometry(
        corpus.schema, id_col, vec_col, dim, n_planes, seed, centroids
    )
    fs_delete(spark, index_dir)
    _write_geometry(spark, index_dir, geo)
    obs = Observation("ann_bootstrap_rows")
    (
        _bucketed_batch(corpus, geo, id_col, vec_col)
        .observe(obs, F.count(F.lit(1)).alias("n"))
        .withColumn("__batch_id", F.lit(-1).cast("long"))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("__batch_id")
        .parquet(index_dir)
    )
    return int(obs.get["n"])


def incremental_ann_sink(
    index_dir: str,
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 12,
    seed: int = 7,
    centroids: list[list[float]] | None = None,
    compact_every: int | None = None,
    compact_max_partitions: int | None = None,
    retain_batches: int | None = None,
) -> Callable[[DataFrame, int], None]:
    """Build the ``foreachBatch`` function that keeps the ANN index
    current. Attach with::

        stream.writeStream.foreachBatch(
            incremental_ann_sink(index_dir, dim=64)
        ).option("checkpointLocation", ckpt).start()

    Each micro-batch is bucketed map-side and written as its own
    ``__batch_id`` partition with dynamic partition overwrite — a
    replayed batch rewrites exactly its own rows, so the index is a
    pure function of the committed stream. Within one batch, ids are
    expected unique (an at-least-once source re-delivering an id in a
    LATER batch creates a newer physical row; serving resolves every
    id to its newest candidate row — see :func:`ann_query_index`).

    ``compact_every=N`` folds committed partitions every N batches
    inside the sink thread (strictly serial — the only safe place
    under a live stream; same contract as the dedup sink), tiered by
    ``compact_max_partitions``. ``retain_batches=N`` keeps only
    content ingested in the last N batches (:func:`prune_ann_index`)
    — the bounded-corpus posture for deployments where similarity is
    only meaningful within a freshness window. ``centroids`` selects
    the IVF cell geometry exactly as in :func:`bootstrap_ann_index`
    (must match a bootstrapped index's sidecar bit-for-bit — the
    geometry guard enforces it)."""
    if retain_batches and compact_every and compact_max_partitions is None:
        # same inert-retention combination as the dedup sink (see
        # incremental_near_dup_sink): a maximal in-sink fold re-marks
        # all content fresh every cadence, so partition-granular
        # retention never prunes anything
        raise ValueError(
            "retain_batches with an in-sink MAXIMAL fold (compact_every "
            "set, compact_max_partitions=None) makes retention inert: "
            "every fold re-marks all content fresh. Pass "
            "compact_max_partitions=K (tiered fold) so chunks age-band "
            "and expire, or run maximal folds in maintenance windows."
        )

    def index_batch(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        geo = _build_geometry(
            batch_df.schema, id_col, vec_col, dim, n_planes, seed, centroids
        )
        geo = _check_geometry(spark, index_dir, geo)
        (
            _bucketed_batch(batch_df, geo, id_col, vec_col)
            .withColumn("__batch_id", F.lit(batch_id).cast("long"))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("__batch_id")
            .parquet(index_dir)
        )
        if compact_every and batch_id > 0 and batch_id % compact_every == 0:
            # batches <= batch_id - 1 are committed by construction
            # once this batch is running (ST2 ordering)
            compact_ann_index(
                spark,
                index_dir,
                upto_batch_id=batch_id - 1,
                max_fold_partitions=compact_max_partitions,
            )
        if retain_batches:
            prune_ann_index(
                spark, index_dir, min_batch_id=batch_id - retain_batches + 1
            )

    return index_batch


def committed_serve_cut(spark: SparkSession, checkpoint_dir: str) -> int:
    """The ``upto_batch_id`` for READ-CONSISTENT serving while the
    ingest stream is LIVE: one past the checkpoint's committed
    watermark, so a concurrent :func:`ann_query_index` sees exactly
    the committed prefix of the stream and nothing in flight.

    Why this is safe against the writer without locks: committed batch
    partitions are immutable (only an UNcommitted batch's replay
    rewrites its partition, and that partition sits ABOVE the
    watermark, so the cut's partition pruning excludes it before any
    file is opened); the in-flight batch's files land via staged
    writes (dot/underscore-prefixed staging Spark's file index
    ignores) and are likewise pruned by partition value the moment
    they publish. Serving WITHOUT a cut against a live stream is also
    row-correct for the same reasons, but is not repeatable-read: two
    scans inside one query could straddle a batch publish.

    MAINTENANCE is the one writer the cut does not serialize against:
    in-sink compaction/retention DELETES partitions at or below the
    watermark, i.e. inside the cut. The fold-publish window (chunk
    visible while its sources still exist) yields duplicate physical
    rows, which the serve path's per-(query, id) resolve absorbs — no
    wrong answers — but a partition deleted between a reader's file
    listing and its scan fails that query loudly
    (FileNotFoundException). So a concurrent server must either
    tolerate query retry around compaction/retention cadences, or
    serving and maintenance get scheduled apart; answers are never
    silently wrong either way (do NOT paper over it with
    ``spark.sql.files.ignoreMissingFiles`` — that converts the loud
    failure into silent row loss). Returns 0 for a fresh checkpoint
    (serve the bootstrap only)."""
    return last_committed_batch(spark, checkpoint_dir) + 1


def read_ann_index(
    spark: SparkSession,
    index_dir: str,
    upto_batch_id: int | None = None,
    geo: dict | None = None,
) -> DataFrame:
    """The index as a DataFrame ``(vec_id, embedding, bucket,
    __ingest)`` — ``__ingest`` is every row's true ingest batch id
    (consolidated chunks persist it per-row because the fold drops the
    partition id; batch partitions recover it from the partition id).
    ``upto_batch_id`` serves a consistent historical cut: only rows
    ingested strictly BEFORE that batch (partition-pruned for batch
    partitions; chunk rows filtered on ``__ingest``). Pass ``geo``
    when the caller already holds the sidecar (the serve path does —
    one FS round-trip instead of two per query on an object store)."""
    if geo is None:
        geo = read_ann_geometry(spark, index_dir)
    if geo is None:
        raise ValueError(f"no ANN index (no {GEOMETRY_FILE}) under {index_dir}")
    df = (
        spark.read.schema(_ann_schema(geo))
        .parquet(index_dir)
        .withColumn("__ingest", F.coalesce(F.col("__ingest"), F.col("__batch_id")))
    )
    if upto_batch_id is not None:
        # partition-level prune first (skips whole batch partitions),
        # then the row-level __ingest cut inside consolidated chunks
        df = df.filter(F.col("__batch_id") < upto_batch_id).filter(
            F.col("__ingest") < upto_batch_id
        )
    return df.select("vec_id", "embedding", "bucket", "__ingest")


def ann_query_index(
    spark: SparkSession,
    index_dir: str,
    queries: DataFrame,
    k: int,
    query_id: str = "query_id",
    query_vec: str = "query_vec",
    multiprobe: int = 0,
    nprobe: int = 2,
    upto_batch_id: int | None = None,
) -> DataFrame:
    """Exact-score ANN top-k per query against the persisted index:
    ``(query_id, vec_id, score, rnk)``, one row per distinct corpus
    id, deterministic tiebreak on vec_id. Queries are bucketed with
    the SIDECAR geometry — plane/codebook math cannot drift from the
    persisted buckets. The recall knob follows the index kind, always
    query-side (the corpus index is untouched — that is the point of
    probing over re-bucketing): hyperplane indexes take
    ``multiprobe=1`` (every Hamming-1 neighbor bucket per query); IVF
    indexes take ``nprobe`` (the n nearest cells per query,
    `operators/similarity.ivf_search`'s probe rule over the sidecar
    codebook).

    Candidates are resolved to ONE row per (query, id) before ranking
    — the newest by ``__ingest`` — which makes the top-k correct
    under every source of physical row multiplicity at once: an id
    re-ingested with a new embedding (upsert — newest wins), exact
    duplicate rows from a crashed non-atomic compaction publish on an
    object store, and the fold-publish window where a concurrent
    reader lists both a consolidated chunk and its not-yet-deleted
    sources. Without the resolution, a duplicated candidate would
    occupy two ranks and silently evict the true k-th neighbor. The
    resolution is a map-side-combinable aggregation over CANDIDATES
    (never corpus-wide); upsert resolution is candidate-scoped — an
    id whose newest embedding hashed entirely outside the probe set
    can still be ranked by a stale row, the same class of miss as any
    LSH recall miss (``multiprobe=1`` shrinks it; exact resolution at
    any probe set is a compaction-time rewrite, not a per-query cost).

    Plan shape (pinned in pytest): corpus scan → broadcast-hash join
    on bucket (query side built) → cosine projection → per-(query,id)
    partial-aggregated resolve → per-query window top-k. The corpus
    never shuffles; both Exchanges move CANDIDATES
    (≈ |queries| × bucket occupancy × probes)."""
    geo = read_ann_geometry(spark, index_dir)
    if geo is None:
        raise ValueError(f"no ANN index (no {GEOMETRY_FILE}) under {index_dir}")
    corpus = read_ann_index(spark, index_dir, upto_batch_id=upto_batch_id, geo=geo)
    q = queries.select(
        F.col(query_id).alias("query_id"), F.col(query_vec).alias("query_vec")
    )
    if geo["kind"] == "ivf":
        probes = _probe_cids("query_vec", _geo_centroids(geo), nprobe)
        qx = q.select(
            "query_id", "query_vec", F.explode(probes).alias("cid")
        ).select(
            "query_id", "query_vec", F.col("cid").cast("long").alias("bucket")
        )
    else:
        qb = lsh_bucket(
            q,
            "query_vec",
            dim=geo["dim"],
            n_planes=geo["n_planes"],
            seed=geo["seed"],
        ).withColumnRenamed("bucket", "qbucket")
        qx = qb.select(
            "query_id",
            "query_vec",
            F.explode(
                probe_buckets(F.col("qbucket"), geo["n_planes"], multiprobe)
            ).alias("bucket"),
        )
    cand = corpus.join(F.broadcast(qx), "bucket")
    scored = cand.select(
        "query_id",
        "vec_id",
        cosine(F.col("embedding"), F.col("query_vec")).alias("score"),
        "__ingest",
    )
    # newest row per (query, id): max_by is a partial-aggregated (map-
    # side combined) reduction, so exact duplicates collapse before the
    # shuffle; ties on __ingest are exact-duplicate rows by the sink's
    # unique-ids-within-a-batch contract, so either row is the same row
    resolved = scored.groupBy("query_id", "vec_id").agg(
        F.max_by("score", "__ingest").alias("score")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("vec_id").asc()
    )
    return resolved.withColumn("rnk", F.row_number().over(w)).filter(F.col("rnk") <= k)


def _max_ingest(spark: SparkSession, base: str, part_id: int) -> int | None:
    """Newest ingest batch in a partition: the id itself for
    batch/bootstrap partitions, the ``.maxbatch`` sidecar for
    consolidated chunks; None = unknown (never pruned — fails safe
    toward retaining, same rule as the dedup index)."""
    if part_id >= -1:
        return part_id
    txt = fs_read_text(spark, f"{base}/__batch_id={part_id}/.maxbatch")
    if txt is None:
        return None
    try:
        return int(txt.strip())
    except ValueError:
        return None


def prune_ann_index(
    spark: SparkSession, index_dir: str, min_batch_id: int
) -> dict:
    """RETENTION: delete partitions whose NEWEST content predates
    ingest batch ``min_batch_id`` — bounds the index ROW count (and
    therefore the per-query corpus scan) over the stream's lifetime.
    Partition-granular and conservative: a consolidated chunk mixing
    old and fresh rows is retained whole (the tiered compactor folds
    oldest-first, so chunks age-band and expire in arrival order).
    Same concurrency contract as compaction: stream stopped, or inside
    the sink's own foreachBatch thread (``retain_batches`` does the
    latter)."""
    base = index_dir.rstrip("/")
    removed = []
    for name in list_child_names(spark, index_dir, dirs_only=True):
        if not name.startswith("__batch_id="):
            continue
        v = int(name.split("=", 1)[1])
        eff = _max_ingest(spark, base, v)
        if eff is None or eff >= min_batch_id:
            continue
        fs_delete(spark, f"{base}/__batch_id={v}")
        removed.append(v)
    return {"pruned_partitions": len(removed), "pruned_ids": sorted(removed)}


def compact_ann_index(
    spark: SparkSession,
    index_dir: str,
    upto_batch_id: int,
    checkpoint_dir: str | None = None,
    max_fold_partitions: int | None = None,
    chunk_merge_at: int = 8,
) -> dict:
    """Fold index partitions with ``__batch_id <= upto_batch_id`` into
    consolidated negative-id partitions — reclaims the per-query file
    listing that otherwise grows one partition per micro-batch forever
    (the same small-files term the dedup compactor reclaims; same
    two shapes: maximal fold for maintenance windows,
    ``max_fold_partitions=K`` tiered fold for in-sink cadences with a
    size-tiered chunk merge at ``chunk_merge_at``).

    The fold persists each row's ingest batch as the ``__ingest``
    column (batch partitions carry it in the partition id; the
    consolidated partition can't) — so the per-(query, id) newest-row
    resolve and
    ``upto_batch_id`` historical cuts stay exact across folds — and
    writes the chunk's ``.maxbatch`` age sidecar for retention.

    Safety contract is the dedup compactor's, verbatim: never fold an
    uncommitted batch (pass ``checkpoint_dir`` to clamp to the
    checkpoint's committed watermark); call with the stream stopped or
    from inside its own foreachBatch thread; crash-safe by ordering
    (scratch-write → publish-rename → delete), degrading on
    non-atomic-rename object stores to duplicate rows — EXACT
    duplicates (same (vec_id, embedding, bucket, __ingest) row),
    which the serve path's per-(query, id) resolve collapses before
    ranking (without it they would occupy two ranks and evict the
    true k-th neighbor) and the next fold re-distincts away.

    This deliberately MIRRORS `dedup_stream.compact_lsh_index` rather
    than sharing a fold helper: the two differ in every load-bearing
    detail (schema + per-row ``__ingest`` preservation here vs distinct
    band rows there; no bucketed-catalog arm here BY DESIGN — the serve
    join broadcasts the query side, so there is no corpus Exchange for
    a bucket spec to elide), and the dedup compactor's behavior is
    pinned by its own test suite; extracting a shared core would
    couple a serve-path index to the most safety-critical code in the
    dedup wire for ~40 saved lines. Fixes to the shared IDEAS (fold
    ordering, tier policy) must be applied to both — each names the
    other."""
    noop = {"folded_partitions": 0, "rows": 0, "new_partition_id": None}
    if not fs_exists(spark, index_dir):
        return noop
    if checkpoint_dir is not None:
        upto_batch_id = min(upto_batch_id, last_committed_batch(spark, checkpoint_dir))
    base = index_dir.rstrip("/")
    geo = read_ann_geometry(spark, index_dir)
    if geo is None:
        return noop
    part_vals = [
        int(name.split("=", 1)[1])
        for name in list_child_names(spark, index_dir, dirs_only=True)
        if name.startswith("__batch_id=")
    ]
    if not part_vals:
        return noop
    next_id = min(min(part_vals), -1) - 1
    schema = _ann_schema(geo)

    def fold(ids: list[int], new_id: int) -> int:
        obs = Observation(f"ann_compact_rows_{new_id}")
        consolidated = (
            spark.read.schema(schema)
            .parquet(index_dir)
            .filter(F.col("__batch_id").isin(ids))
            .select(
                "vec_id",
                "embedding",
                "bucket",
                F.coalesce(F.col("__ingest"), F.col("__batch_id")).alias("__ingest"),
            )
            .distinct()
            .observe(obs, F.count(F.lit(1)).alias("n"))
        )
        scratch = base + "/.compact_scratch"
        consolidated.write.mode("overwrite").parquet(scratch)
        if not fs_rename(spark, scratch, f"{base}/__batch_id={new_id}"):  # pragma: no cover - FS race
            raise IOError(f"compact_ann_index: publish rename failed under {index_dir}")
        ingests = [_max_ingest(spark, base, v) for v in ids]
        if all(i is not None for i in ingests):
            fs_write_text(
                spark, f"{base}/__batch_id={new_id}/.maxbatch", str(max(ingests))
            )
        for v in ids:
            fs_delete(spark, f"{base}/__batch_id={v}")
        return obs.get["n"]

    eligible = sorted(v for v in part_vals if v <= upto_batch_id)
    if max_fold_partitions is None:
        if len(eligible) <= 1:
            return noop
        rows = fold(eligible, next_id)
        return {
            "folded_partitions": len(eligible),
            "rows": rows,
            "new_partition_id": next_id,
        }
    batch_tier = [v for v in eligible if v >= -1][:max_fold_partitions]
    out = dict(noop)
    if len(batch_tier) >= 2:
        out = {
            "folded_partitions": len(batch_tier),
            "rows": fold(batch_tier, next_id),
            "new_partition_id": next_id,
        }
        next_id -= 1
    chunks = [v for v in part_vals if v < -1]
    if out["new_partition_id"] is not None:
        chunks.append(out["new_partition_id"])
    if len(chunks) >= chunk_merge_at:
        by_size = sorted(
            chunks, key=lambda v: (fs_dir_size(spark, f"{base}/__batch_id={v}"), v)
        )[:chunk_merge_at]
        out["merged_chunks"] = len(by_size)
        out["chunk_rows"] = fold(by_size, next_id)
        out["chunk_partition_id"] = next_id
    return out
