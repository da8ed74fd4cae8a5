"""Similarity search over embedding columns — exact brute-force top-k
(the correctness baseline; plans/vector_queries.py oracles it) and a
random-hyperplane LSH bucketed ANN for the 100 TB path.

Scale design:
  * brute force is O(n·|queries|) with the query side broadcast — right
    whenever |queries| is small, at any corpus size (it streams);
  * LSH maps each vector to a b-bit bucket map-side (deterministic
    hyperplanes derived from md5 — no fit step, no driver state), then
    only intersects within buckets (+ optional multi-probe neighbors):
    the candidate join is equi on bucket, shuffle-partitioned, never n².
  * hybrid rerank: LSH candidates are re-scored with exact cosine, so
    the ANN path returns exact scores with approximate recall.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.vectors import cosine


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int,
    corpus_id: str = "vec_id",
    corpus_vec: str = "embedding",
    query_id: str = "query_id",
    query_vec: str = "query_vec",
) -> DataFrame:
    """Exact top-k per query vector. Deterministic tiebreak on corpus id."""
    joined = corpus.crossJoin(F.broadcast(queries)).select(
        F.col(query_id),
        F.col(corpus_id),
        cosine(F.col(corpus_vec), F.col(query_vec)).alias("score"),
    )
    w = Window.partitionBy(query_id).orderBy(F.col("score").desc(), F.col(corpus_id).asc())
    return joined.withColumn("rnk", F.row_number().over(w)).filter(F.col("rnk") <= k)


def _hyperplane(seed: int, plane: int, dim: int) -> list[float]:
    """Deterministic pseudo-random unit-free hyperplane: md5(seed,plane,i)
    → ±1 per dimension. Engine-independent, no RNG state."""
    out = []
    for i in range(dim):
        h = hashlib.md5(f"{seed}|{plane}|{i}".encode()).digest()
        out.append(1.0 if h[0] % 2 == 0 else -1.0)
    return out


# Clamp bounds for auto_planes. Referenced by the lsh_auto_planes_volume
# oracle (plans/vector_queries.py) so the SQL replay can never
# desynchronize from a future default change here (round-8 ADVICE).
AUTO_PLANES_MIN = 8
AUTO_PLANES_MAX = 30


def auto_planes(
    n_rows: int,
    target_occupancy: int = 128,
    min_planes: int = AUTO_PLANES_MIN,
    max_planes: int = AUTO_PLANES_MAX,
) -> int:
    """Signature bits for ``lsh_bucket`` scaled to corpus size: the
    smallest b with n / 2**b <= target_occupancy.

    Why this must scale with log2(n): with FIXED b the 2**b buckets fill
    linearly as the corpus grows, so within-bucket candidate pairs grow
    QUADRATICALLY — measured on the replicated embeddings corpus at 12
    planes: 41.9M candidate pairs at ×256 (512k vectors) → 670.6M at
    ×1024 (2.05M vectors), ×16.0 for ×4 data (SCALE.md round 6, ×1024).
    Two more bits at ×1024 (this function picks 14) restore near-linear
    candidate volume (192.5M ≈ 1.15× the linear-scaled count) at the
    usual recall trade (near-dup pairs split across finer buckets; keep
    ``target_occupancy`` constant rather than re-tuning per corpus).

    The oracled registry queries keep their FIXED plane counts — the
    bucket expression is part of the driver-checked semantics; this
    helper is the production path for corpus-sized invocations.

    The selection is pure integer arithmetic (ceil-div + bit_length:
    smallest b with 2**b ≥ ⌈n/occupancy⌉ — equivalent to
    ⌈log₂(n/occupancy)⌉ since 2**b is an integer) rather than
    ``math.ceil(math.log2(...))``: a count landing within one ulp of an
    exact power of two could round to a different b across libm
    implementations, and the driver oracle recomputes b in an
    independent engine (round-8 ADVICE)."""
    if n_rows <= 0:
        return min_planes
    m = -(-n_rows // target_occupancy)  # ceil(n / occupancy), exact
    b = (m - 1).bit_length()  # smallest b with 2**b >= m
    return max(min_planes, min(max_planes, b))


def lsh_bucket(
    df: DataFrame, vec: str, dim: int, n_planes: int = 12, seed: int = 7
) -> DataFrame:
    """Adds a ``bucket`` column: the n_planes sign bits of dot(vec, Hₚ)
    packed into a BIGINT. Pure column math over a literal plane matrix —
    broadcast as constants inside codegen, no shuffle. ``n_planes`` must
    grow with log2(corpus) to keep bucket occupancy — and therefore the
    candidate-join volume — linear in the corpus; use ``auto_planes``
    for corpus-sized invocations (fixed counts go quadratic: see its
    docstring for the measured ×1024 term)."""
    planes = [_hyperplane(seed, p, dim) for p in range(n_planes)]

    # One SQL fragment for the whole packed-bits sum instead of
    # n_planes × dim ``F.lit`` columns + per-lambda py4j round trips:
    # same Catalyst tree (zip_with product fold from 0.0, CASE on the
    # sign, exact bigint adds), built in one driver call — plan
    # construction of a 12-plane × 64-dim bucketing measured ~0.8 s →
    # ~0.01 s (r13 probe; LSH queries and the streaming ANN sink build
    # this expression per invocation).
    def dot_sql(plane: list[float]) -> str:
        arr = "array(" + ",".join(repr(float(x)) + "D" for x in plane) + ")"
        return (
            f"aggregate(zip_with(`{vec}`, {arr}, (a, b) -> CAST(a AS DOUBLE) * b), "
            f"0.0D, (acc, v) -> acc + v)"
        )

    terms = " + ".join(
        f"CASE WHEN {dot_sql(plane)} >= 0.0D THEN CAST({1 << p} AS BIGINT) "
        f"ELSE CAST(0 AS BIGINT) END"
        for p, plane in enumerate(planes)
    )
    return df.withColumn("bucket", F.expr(f"CAST(0 AS BIGINT) + {terms}"))


def probe_buckets(bucket: Column, n_planes: int, multiprobe: int) -> Column:
    """Array of bucket ids to probe for a query whose own bucket is
    ``bucket``: the bucket itself plus, at ``multiprobe=1``, every
    Hamming-distance-1 neighbor (one sign bit flipped — the classic
    multi-probe LSH recall knob: a near neighbor that landed just the
    other side of ONE hyperplane is found without re-hashing or adding
    tables). Probe count is ``1 + n_planes`` — query-side only, so the
    corpus is never re-bucketed and the candidate join stays equi on
    bucket. Buckets in the array are pairwise distinct (each flips a
    different bit), so no (query, corpus) candidate is produced twice.
    Only distances 0 and 1 are supported: distance-2 probe sets grow
    C(n_planes, 2)-fold for steeply diminishing recall."""
    if multiprobe not in (0, 1):
        raise ValueError(f"multiprobe must be 0 or 1, got {multiprobe}")
    if multiprobe == 0:
        return F.array(bucket)
    return F.array(
        bucket,
        *[bucket.bitwiseXOR(F.lit(1 << p).cast("bigint")) for p in range(n_planes)],
    )


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int,
    dim: int,
    n_planes: int = 12,
    corpus_id: str = "vec_id",
    corpus_vec: str = "embedding",
    query_id: str = "query_id",
    query_vec: str = "query_vec",
    multiprobe: int = 0,
) -> DataFrame:
    """ANN top-k: bucket both sides with the same hyperplanes, equi-join
    on bucket, exact-rescore the candidates. Recall rises with fewer
    planes (bigger buckets) — callers tune n_planes to corpus density;
    tests assert recall against brute_force_topk. ``multiprobe=1``
    additionally probes every Hamming-1 neighbor bucket per query
    (:func:`probe_buckets`) — (n_planes+1)× the candidate volume for a
    recall gain that lets n_planes stay corpus-scaled, all query-side
    (the corpus bucketing, and therefore a persisted corpus index, is
    untouched)."""
    cb = lsh_bucket(corpus, corpus_vec, dim, n_planes)
    qb = lsh_bucket(queries, query_vec, dim, n_planes).withColumnRenamed("bucket", "qbucket")
    if multiprobe:
        qb = qb.select(
            *[c for c in qb.columns if c != "qbucket"],
            F.explode(
                probe_buckets(F.col("qbucket"), n_planes, multiprobe)
            ).alias("qbucket"),
        )
    cand = cb.join(
        F.broadcast(qb), F.col("bucket") == F.col("qbucket"), "inner"
    ).select(
        F.col(query_id),
        F.col(corpus_id),
        cosine(F.col(corpus_vec), F.col(query_vec)).alias("score"),
    )
    w = Window.partitionBy(query_id).orderBy(F.col("score").desc(), F.col(corpus_id).asc())
    return cand.withColumn("rnk", F.row_number().over(w)).filter(F.col("rnk") <= k)


def _l2sq_sql(vec: str, centroid: list[float]) -> str:
    """Squared L2 distance of column ``vec`` to a literal centroid, as
    ONE SQL fragment. Catalyst tree identical to the previous
    ``F.aggregate(F.zip_with(...))`` builder (same zip_with lambda, same
    sequential fold from 0.0 — bit-identical doubles; literals are
    Python ``repr`` round-trip text with the ``D`` double suffix, parsed
    correctly-rounded), but built in ONE py4j call instead of
    dim-many ``F.lit`` plus per-lambda JVM round trips: plan
    CONSTRUCTION of an 8-centroid × 64-dim distance array measured
    0.55 s → 0.004 s (r13 probe) — the training loop rebuilds these
    expressions with fresh literals every Lloyd iteration, so build
    time is per-iteration cost, not a one-off."""
    arr = "array(" + ",".join(repr(float(x)) + "D" for x in centroid) + ")"
    return (
        f"aggregate(zip_with(`{vec}`, {arr}, "
        f"(v, c) -> (CAST(v AS DOUBLE) - c) * (CAST(v AS DOUBLE) - c)), "
        f"0.0D, (acc, d) -> acc + d)"
    )


def _dists_sql(vec: str, centroids: list[tuple[int, list[float]]]) -> str:
    """array<struct<d, cid>> of distances to every centroid."""
    return (
        "array("
        + ",".join(
            f"struct({_l2sq_sql(vec, c)} AS d, {int(cid)} AS cid)"
            for cid, c in centroids
        )
        + ")"
    )


def ivf_assign(df: DataFrame, vec: str, centroids: list[tuple[int, list[float]]]) -> DataFrame:
    """Adds ``cid``: the id of the nearest centroid (argmin L2, ties to
    the lower cid via lexicographic struct ordering). Centroids are plan
    literals — evaluated inside codegen, no join, no shuffle."""
    return df.withColumn("cid", F.expr(f"array_min({_dists_sql(vec, centroids)}).cid"))


def _probe_cids(vec: str, centroids: list[tuple[int, list[float]]], nprobe: int) -> Column:
    """Array of the ``nprobe`` nearest centroid ids for a vector column."""
    return F.expr(
        f"slice(array_sort({_dists_sql(vec, centroids)}), 1, {int(nprobe)}).cid"
    )


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int,
    n_centroids: int = 8,
    nprobe: int = 2,
    train_iters: int = 2,
    corpus_id: str = "vec_id",
    corpus_vec: str = "embedding",
    query_id: str = "query_id",
    query_vec: str = "query_vec",
) -> DataFrame:
    """IVF (inverted-file) ANN: partition the corpus into Voronoi cells
    around ``n_centroids`` centroids, search only the ``nprobe`` cells
    nearest each query, rescore candidates with exact cosine.

    Centroid selection is deterministic but NOT "the n lowest ids": on a
    sorted/label-clustered corpus that would draw every centroid from one
    region (all cells collapse onto one Voronoi region → recall craters
    and one hot cell absorbs the corpus — skew at scale). Seeds come from
    a hash-scattered sample (order by xxhash64(id), take n — decorrelated
    from storage order), optionally refined by ``train_iters`` Lloyd's
    iterations (operators/clustering.kmeans_fit — each iteration is one
    corpus scan; set 0 to skip training). Cell assignment is a narrow map
    stage; the candidate join is equi on cid (probe list exploded to
    rows), so the shuffle key is an int — never vectors×n².
    Recall/cost knob: nprobe (cells searched per query).
    """
    from .clustering import hash_sample_vectors, kmeans_fit

    vecs = hash_sample_vectors(corpus, corpus_vec, corpus_id, n_centroids)
    if train_iters > 0:
        vecs, _ = kmeans_fit(
            corpus.select(corpus_id, corpus_vec),
            corpus_vec,
            corpus_id,
            k=n_centroids,
            iters=train_iters,
            init_centroids=vecs,
        )
    centroids = [(cid, c) for cid, c in enumerate(vecs)]
    return ivf_search(
        corpus, queries, centroids, k, nprobe,
        corpus_id=corpus_id, corpus_vec=corpus_vec,
        query_id=query_id, query_vec=query_vec,
    )


def ivf_search(
    corpus: DataFrame,
    queries: DataFrame,
    centroids: list[tuple[int, list[float]]],
    k: int,
    nprobe: int,
    corpus_id: str = "vec_id",
    corpus_vec: str = "embedding",
    query_id: str = "query_id",
    query_vec: str = "query_vec",
) -> DataFrame:
    """IVF search against a FIXED centroid codebook (the serving half of
    ``ivf_topk``, split out so a pre-trained / externally chosen codebook
    can be reused — the production IVF shape, where training and serving
    are separate jobs). Assignment and probing are argmin-L2 over plan
    literals (codegen, no shuffle); the candidate join is equi on the int
    cell id; rescoring is exact cosine with a total-order rank tiebreak.
    Because every stage is deterministic arithmetic + an equi-join, a
    fixed-codebook invocation is fully SQL-replayable (see
    plans/curation_queries.embedding_ivf_seeded_topk's DuckDB oracle)."""
    assigned = ivf_assign(corpus, corpus_vec, centroids)
    probes = queries.withColumn("__probe", _probe_cids(query_vec, centroids, nprobe)).select(
        query_id, query_vec, F.explode("__probe").alias("cid")
    )
    cand = assigned.join(probes, "cid").select(
        F.col(query_id),
        F.col(corpus_id),
        cosine(F.col(corpus_vec), F.col(query_vec)).alias("score"),
    )
    w = Window.partitionBy(query_id).orderBy(F.col("score").desc(), F.col(corpus_id).asc())
    return cand.withColumn("rnk", F.row_number().over(w)).filter(F.col("rnk") <= k)
