"""Deduplication operators for the LLM-data-pipeline surface:
exact (fingerprint groupBy), n-gram Jaccard pair mining, SimHash, and
MinHash-LSH near-dup detection.

Design for 100 TB:
  * exact dedup is a hash-aggregate on a fingerprint — one shuffle of
    (fingerprint, doc_id), never of document bodies;
  * Jaccard candidates come from an inverted shingle index (explode →
    self-join on shingle) with frequency capping to kill the quadratic
    blowup of ultra-common shingles;
  * SimHash reduces each doc to 63 bits map-side (explode+agg, no UDF);
  * MinHash-LSH (band-bucket join) finds near-dup candidates in
    O(n·bands) instead of O(n²).

All deterministic: hashes derive from md5 (engine-portable), never from
Spark-internal hash seeds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import fingerprint, word_shingles


def exact_dedup(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Keep the smallest id per normalized-text fingerprint.
    Returns (canonical id, n_members, fingerprint). Deterministic via
    min() — never 'first row wins'."""
    return (
        df.select(F.col(id_col), fingerprint(text_col).alias("fp"))
        .groupBy("fp")
        .agg(F.min(id_col).alias("canonical_id"), F.count(F.lit(1)).alias("n_members"))
    )


def shingle_index(df: DataFrame, text_col: str, id_col: str, n: int = 3) -> DataFrame:
    """Inverted index: one row per (doc, distinct word-n-gram shingle)."""
    return df.select(
        F.col(id_col).alias("doc"), F.explode(word_shingles(text_col, n)).alias("shingle")
    )


def jaccard_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    n: int = 3,
    max_shingle_freq: int | None = 1000,
) -> DataFrame:
    """All doc pairs (a < b) sharing ≥1 word-n-gram shingle, with their
    exact Jaccard similarity over distinct-shingle sets.

    ``max_shingle_freq`` drops shingles appearing in more than that many
    docs before the self-join — the standard guard against quadratic
    fan-out on boilerplate shingles ("click here to" appearing in 10M
    docs would alone generate 10M² pairs).
    """
    idx = shingle_index(df, text_col, id_col, n)
    if max_shingle_freq is not None:
        freq_w = idx.groupBy("shingle").agg(F.count(F.lit(1)).alias("__freq"))
        idx = idx.join(
            freq_w.filter(F.col("__freq") <= max_shingle_freq).select("shingle"), "shingle"
        )
    sizes = idx.groupBy("doc").agg(F.count(F.lit(1)).alias("sz"))
    a = idx.alias("a")
    b = idx.alias("b")
    inter = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle")) & (F.col("a.doc") < F.col("b.doc")))
        .groupBy(F.col("a.doc").alias("doc_a"), F.col("b.doc").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    return (
        inter.join(sizes.withColumnRenamed("doc", "doc_a").withColumnRenamed("sz", "sz_a"), "doc_a")
        .join(sizes.withColumnRenamed("doc", "doc_b").withColumnRenamed("sz", "sz_b"), "doc_b")
        .select(
            "doc_a",
            "doc_b",
            (
                F.col("inter").cast("double")
                / (F.col("sz_a") + F.col("sz_b") - F.col("inter")).cast("double")
            ).alias("jaccard"),
        )
    )


def simhash(df: DataFrame, text_col: str, id_col: str, bits: int = 63) -> DataFrame:
    """63-bit SimHash per document (bit b set iff the frequency-weighted
    sum of word-hash bit b signs is positive). Pure explode + aggregate:

        tokens → md5-word-hash → ×63 bit rows → groupBy(doc) Σ sign → pack

    Map-side partial aggregation keeps the shuffle at |docs|×63 rows.
    ``bits`` ≤ 63 so the packed value fits a signed BIGINT on every
    engine (DuckDB has no UINT64 arithmetic in its BIGINT lane).
    """
    from ..functions.text import tokens, word_hash64

    words = df.select(F.col(id_col).alias("doc"), F.explode(tokens(text_col)).alias("w"))
    hashed = words.select("doc", word_hash64(F.col("w")).alias("h"))
    bitrows = hashed.select(
        "doc", "h", F.explode(F.sequence(F.lit(0), F.lit(bits - 1))).alias("bit")
    ).select(
        "doc",
        "bit",
        F.when(F.expr("(shiftright(h, bit) % 2) = 1"), F.lit(1)).otherwise(F.lit(-1)).alias("sgn"),
    )
    return (
        bitrows.groupBy("doc", "bit")
        .agg(F.sum("sgn").alias("s"))
        .groupBy("doc")
        .agg(
            F.sum(
                F.when(F.col("s") > 0, F.expr("shiftleft(1L, bit)")).otherwise(F.lit(0))
            )
            .cast("bigint")
            .alias("simhash")
        )
    )


def minhash_signatures(
    df: DataFrame, text_col: str, id_col: str, n: int = 3, num_hashes: int = 32
) -> DataFrame:
    """MinHash signature per doc: for permutation i, min over shingles of
    md5(i ∥ shingle). Engine-portable (md5), no ml-lib dependency.
    Output: (doc, array<bigint> of length num_hashes)."""
    idx = shingle_index(df, text_col, id_col, n)
    perms = idx.select(
        "doc",
        "shingle",
        F.explode(F.sequence(F.lit(0), F.lit(num_hashes - 1))).alias("perm"),
    ).select(
        "doc",
        "perm",
        F.conv(
            F.substring(F.md5(F.concat_ws("|", F.col("perm"), F.col("shingle"))), 1, 15), 16, 10
        )
        .cast("bigint")
        .alias("h"),
    )
    return (
        perms.groupBy("doc", "perm")
        .agg(F.min("h").alias("mh"))
        .groupBy("doc")
        .agg(F.array_sort(F.collect_list(F.struct("perm", "mh"))).alias("s"))
        .select("doc", F.col("s.mh").alias("signature"))
    )


def minhash_lsh_candidates(
    signatures: DataFrame, bands: int = 8, rows_per_band: int = 4
) -> DataFrame:
    """LSH banding: docs agreeing on all rows of ≥1 band become candidate
    pairs. Join is equi on (band, band-hash) — shuffle-friendly, no n²."""
    assert bands * rows_per_band <= 64
    banded = signatures.select(
        "doc",
        "signature",
        F.explode(F.sequence(F.lit(0), F.lit(bands - 1))).alias("band"),
    ).select(
        "doc",
        "band",
        F.md5(
            F.concat_ws(
                "|",
                F.col("band"),
                F.concat_ws(
                    ",",
                    F.slice(F.col("signature"), F.col("band") * rows_per_band + 1, rows_per_band),
                ),
            )
        ).alias("bucket"),
    )
    a = banded.alias("a")
    b = banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.doc") < F.col("b.doc")),
        )
        .select(F.col("a.doc").alias("doc_a"), F.col("b.doc").alias("doc_b"))
        .distinct()
    )
