"""Semantic tests for the round-3 curation operators — pins the
*behavioral* claims the DuckDB oracle can't express (recall against the
exact baseline, threshold binding on adversarial inputs, ordering
semantics of the funnel)."""

from __future__ import annotations

import warnings

import pytest
from pyspark.sql import Row, functions as F

from webscrap_datapipeline_spark.plans import REGISTRY

from .conftest import SF_SMALL


# --- fixed-codebook IVF ------------------------------------------------------


def test_ivf_seeded_recall_against_brute_force(spark):
    """The fixed-codebook IVF (nprobe=3 of 8 cells) must recover a
    healthy fraction of the exact cosine top-5 — the approximation knob
    is probing breadth, not correctness of the search machinery."""
    from webscrap_datapipeline_spark.catalog import load_table
    from webscrap_datapipeline_spark.operators.similarity import brute_force_topk

    ivf = {
        (r["query_id"], r["vec_id"])
        for r in REGISTRY["embedding_ivf_seeded_topk"].fn(spark, SF_SMALL).collect()
    }
    emb = load_table(spark, "embeddings", SF_SMALL)
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    corpus = emb.filter(F.col("vec_id") >= 5)
    exact = {
        (r["query_id"], r["vec_id"])
        for r in brute_force_topk(corpus, queries, k=5).collect()
    }
    assert len(ivf) == 25 and len(exact) == 25
    recall = len(ivf & exact) / len(exact)
    # 3/8 cells probed on a structureless corpus ⇒ expect ≳ nprobe/cells
    # of the exact neighbors; pin well above chance but below perfection.
    assert recall >= 0.3, f"IVF recall {recall} collapsed — probe/assign broken"


def test_ivf_search_exact_when_all_cells_probed(spark):
    """nprobe = n_cells makes IVF exhaustive: it must EQUAL brute force
    exactly (same pairs, same ranks) — partitioning must never lose or
    reorder candidates when every cell is searched."""
    from webscrap_datapipeline_spark.catalog import load_table
    from webscrap_datapipeline_spark.operators.similarity import (
        brute_force_topk,
        ivf_search,
    )

    emb = load_table(spark, "embeddings", SF_SMALL)
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    corpus = emb.filter(F.col("vec_id") >= 5).select("vec_id", "embedding")
    seeds = corpus.filter(F.col("vec_id") % 61 == 8).orderBy("vec_id").limit(8).collect()
    centroids = [(i + 1, [float(x) for x in r["embedding"]]) for i, r in enumerate(seeds)]
    ivf = {
        (r["query_id"], r["vec_id"], r["rnk"])
        for r in ivf_search(corpus, queries, centroids, k=5, nprobe=len(centroids)).collect()
    }
    exact = {
        (r["query_id"], r["vec_id"], r["rnk"])
        for r in brute_force_topk(corpus, queries, k=5).collect()
    }
    assert ivf == exact


# --- repetition filter -------------------------------------------------------


def test_repetition_flag_binds_on_degenerate_doc(spark, tmp_path):
    """A doc that is one bigram repeated must be flagged; a doc of all-
    distinct bigrams must not — proves the cross-product threshold is
    live, not vacuously true on the natural corpus."""
    repeated = " ".join(["spam", "ham"] * 30)  # top bigram ≫ 1/20 of mass
    diverse = " ".join(f"w{i}" for i in range(60))  # every bigram unique
    docs = spark.createDataFrame(
        [
            Row(doc_id=1, lang="xx", text=repeated, source="t", n_chars=len(repeated)),
            Row(doc_id=2, lang="yy", text=diverse, source="t", n_chars=len(diverse)),
        ]
    )
    out_dir = str(tmp_path / "docs")
    docs.write.mode("overwrite").parquet(out_dir + "/documents.parquet")
    res = {
        r["lang"]: r
        for r in REGISTRY["repetition_top_bigram_stats"].fn(spark, out_dir).collect()
    }
    assert res["xx"]["n_flagged"] == 1
    assert res["yy"]["n_flagged"] == 0
    # all-repeat doc: the top bigram owns (almost) the whole bigram mass
    assert res["xx"]["total_top_bigram"] * 2 > res["xx"]["total_bigrams"]


# --- funnel ordering ---------------------------------------------------------


def _events_df(spark, rows):
    return spark.createDataFrame(
        [
            Row(
                event_id=i,
                ts=ts,
                user_id=uid,
                event_type=et,
                value=1.0,
                props="{}",
            )
            for i, (uid, ts, et) in enumerate(rows)
        ]
    )


def test_funnel_requires_stage_order_and_window(spark, tmp_path):
    """Users must traverse signup → view → purchase in that order, each
    hop within 4 h. A purchase BEFORE the view, or a view 5 h after
    signup, must not convert."""
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)
    h = dt.timedelta(hours=1)
    rows = [
        # user 1: full ordered funnel within windows → counts everywhere
        (1, t0, "signup"), (1, t0 + h, "view"), (1, t0 + 2 * h, "purchase"),
        # user 2: purchase precedes view → stops at view stage
        (2, t0, "signup"), (2, t0 + 2 * h, "purchase"), (2, t0 + 3 * h, "view"),
        # user 3: view outside the 4 h window → stops at signup stage
        (3, t0, "signup"), (3, t0 + 5 * h, "view"), (3, t0 + 6 * h, "purchase"),
        # user 4: never signs up → counts nowhere
        (4, t0, "view"), (4, t0 + h, "purchase"),
    ]
    out_dir = str(tmp_path / "ev")
    _events_df(spark, rows).write.mode("overwrite").parquet(out_dir + "/events.parquet")
    res = {
        r["stage"]: r["n_users"]
        for r in REGISTRY["funnel_stage_counts"].fn(spark, out_dir).collect()
    }
    assert res == {"signup": 3, "view_within_4h": 2, "purchase_within_4h": 1}


def test_transition_matrix_orders_by_ts_then_event_id(spark, tmp_path):
    """Simultaneous timestamps break ties on event_id — the transition
    counts must be deterministic under ts collisions."""
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1)
    rows = [(1, t0, "view"), (1, t0, "click"), (1, t0, "purchase")]
    out_dir = str(tmp_path / "ev2")
    _events_df(spark, rows).write.mode("overwrite").parquet(out_dir + "/events.parquet")
    res = {
        (r["from_type"], r["to_type"]): r["n_transitions"]
        for r in REGISTRY["event_transition_matrix"].fn(spark, out_dir).collect()
    }
    assert res == {("view", "click"): 1, ("click", "purchase"): 1}


# --- semantic outliers -------------------------------------------------------


def test_semantic_outlier_surfaces_planted_mislabel(spark, tmp_path):
    """A vector planted far from its own label's centroid (it belongs to
    the other cluster) must appear in the outlier top-k."""
    import numpy as np

    rng = np.random.default_rng(11)
    rows = []
    a = np.array([1.0] * 4 + [0.0] * 4)
    b = np.array([0.0] * 4 + [1.0] * 4)
    for i in range(40):
        base = a if i % 2 == 0 else b
        v = base + rng.normal(0, 0.05, 8)
        rows.append(Row(vec_id=i, embedding=[float(x) for x in v], label=i % 2))
    # vec 100: label 0 but lives at cluster b → worst cosine to centroid 0
    rows.append(Row(vec_id=100, embedding=[float(x) for x in b], label=0))
    out_dir = str(tmp_path / "emb")
    spark.createDataFrame(rows).write.mode("overwrite").parquet(
        out_dir + "/embeddings.parquet"
    )
    out = REGISTRY["semantic_outlier_docs"].fn(spark, out_dir).collect()
    assert out[0]["vec_id"] == 100 and out[0]["label"] == 0


# --- observability query invariants -----------------------------------------


def test_novelty_curve_accounting(spark):
    """Novel shingles summed over all deciles must equal the corpus's
    distinct-shingle count (every shingle is novel exactly once, at its
    MIN doc_id), and no decile can be more than 100% novel."""
    from webscrap_datapipeline_spark.catalog import load_table
    from webscrap_datapipeline_spark.functions.text import word_shingles

    rows = REGISTRY["corpus_novelty_curve"].fn(spark, SF_SMALL).collect()
    total_novel = sum(r["novel_shingles"] for r in rows)
    docs = load_table(spark, "documents", SF_SMALL)
    n_distinct = (
        docs.select(F.explode(word_shingles("text", 3)).alias("s"))
        .select("s")
        .distinct()
        .count()
    )
    assert total_novel == n_distinct
    assert all(0 <= r["novel_shingles"] <= r["total_shingles"] for r in rows)
    # saturation: the first decile must be strictly more novel (per
    # shingle) than the last — integer cross-product comparison
    first = next(r for r in rows if r["id_decile"] == 0)
    last = next(r for r in rows if r["id_decile"] == max(x["id_decile"] for x in rows))
    assert (
        first["novel_shingles"] * last["total_shingles"]
        > last["novel_shingles"] * first["total_shingles"]
    )


def test_dedup_token_savings_accounting(spark):
    """kept + saved == total per language, and summed savings equal the
    token mass of non-canonical prefix-family members."""
    rows = REGISTRY["dedup_token_savings"].fn(spark, SF_SMALL).collect()
    for r in rows:
        assert r["tokens_kept"] + r["tokens_saved"] == r["tokens_total"], r
    assert sum(r["tokens_saved"] for r in rows) > 0  # corpus has real families


def test_minhash_calibration_bounds_and_coherence(spark):
    """Estimates and exact Jaccards live in [0,1]; candidate pairs from
    4x4 banding must have a high min-hash agreement (>= one full band =
    4/16) — a pair with est < 0.25 would contradict its own candidacy."""
    rows = REGISTRY["minhash_estimate_calibration"].fn(spark, SF_SMALL).collect()
    assert rows
    for r in rows:
        assert 0.0 <= r["est_jaccard"] <= 1.0
        assert 0.0 <= r["exact_jaccard"] <= 1.0
        assert r["est_jaccard"] >= 0.25, r  # at least one identical band


def test_split_leakage_audits_detect_planted_leaks(spark, tmp_path):
    """Oracle parity proves Spark==DuckDB; this pins that the leakage
    audits detect what they claim. Planted corpus (ids pre-chosen so
    the md5 split puts them where needed: 1,2,4 -> train; 44,49,65,76 ->
    test): test doc 44 is an exact copy of train doc 1 (must show as
    BOTH dup leakage and shingle leakage), test doc 49 shares a 3-word
    shingle with train doc 2 but differs in its first 120 chars
    (shingle leakage only), test doc 65 is disjoint (neither), and test
    doc 76 has <3 tokens — no shingles — but must still be COUNTED in
    n_test_docs by BOTH audits (equal denominators; round-4 ADVICE)."""
    import os

    from webscrap_datapipeline_spark.plans import REGISTRY

    leak_text = "alpha beta gamma delta epsilon zeta eta theta"
    rows = [
        (1, leak_text, "en", "web"),
        (2, "one two three four five six seven", "en", "web"),
        (4, "totally separate train material here now", "en", "web"),
        (44, leak_text, "en", "web"),  # exact copy of doc 1
        (49, "xx " * 50 + "two three four nine ten", "en", "web"),
        (65, "unrelated held out evaluation sentence words", "en", "web"),
        (76, "tiny doc", "en", "web"),  # <3 tokens: zero shingles
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text", "lang", "source"])
    df = df.withColumn("n_chars", F.length("text"))
    sf_dir = str(tmp_path)
    df.write.mode("overwrite").parquet(os.path.join(sf_dir, "documents.parquet"))

    dup = {
        r["lang"]: r
        for r in REGISTRY["dup_leakage_across_split"].fn(spark, sf_dir).collect()
    }
    assert dup["en"]["n_test_docs"] == 4
    assert dup["en"]["dup_leaked_docs"] == 1  # only the exact copy

    sh = {
        r["lang"]: r
        for r in REGISTRY["split_leakage_audit"].fn(spark, sf_dir).collect()
    }
    assert sh["en"]["n_test_docs"] == 4  # shingle-less doc 76 still counted
    assert sh["en"]["leaky_test_docs"] == 2  # exact copy + shingle-sharer


# --- SimHash multi-band mitigation (round-7) --------------------------------


def test_simhash_auto_band_scheme_arithmetic():
    """k grows with the corpus until expected occupancy <= target;
    pigeonhole constraint bands = tol + k holds at every pick."""
    from webscrap_datapipeline_spark.operators.dedup import simhash_auto_band_scheme

    # small corpus: single-band is fine (n/2^7 <= 128 for n <= 16384)
    assert simhash_auto_band_scheme(500) == (1, 9, 7)
    assert simhash_auto_band_scheme(16_384) == (1, 9, 7)
    # ~x64 replicated corpus (320k docs): k=2 (10 bands x 6 bits)
    assert simhash_auto_band_scheme(320_000) == (2, 10, 6)
    # ~2M docs: k=3 (11 bands x 5 bits; occupancy 2M/2^15 = 64)
    assert simhash_auto_band_scheme(2_100_000) == (3, 11, 5)
    # ~x1024 documents (5.12M): k=3 occupancy is 156 > 128, so k=4
    assert simhash_auto_band_scheme(5_120_000) == (4, 12, 5)
    # max_k caps the combinatorial key cost — and the capped case (the
    # target occupancy NOT met) signals with a RuntimeWarning (round-8
    # ADVICE: callers like simhash_band_probe can tell the scheme is
    # best-effort, not occupancy-guaranteed)
    with pytest.warns(RuntimeWarning, match=r"bound at k=4 by max_k=4 cap"):
        assert simhash_auto_band_scheme(10**12)[0] == 4
    # a huge hamming_tol exhausts band WIDTH before max_k — the warning
    # must name the width floor, not misattribute the cap (round-8
    # ADVICE): at tol=60 the climb stops at k=3 (< max_k=4) because
    # k=4 would need 63 // (60+3+1) = 63 // 64 = 0-bit bands (the
    # guard divides by tol + k + 1), with occupancy still far
    # above target
    with pytest.warns(RuntimeWarning, match=r"bound at k=3 by width floor"):
        assert simhash_auto_band_scheme(10**12, hamming_tol=60)[0] == 3
    # every uncapped pick above stays warning-free
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        assert simhash_auto_band_scheme(5_120_000) == (4, 12, 5)
    k, bands, width = simhash_auto_band_scheme(5_120_000, hamming_tol=4)
    assert bands == 4 + k and width == 63 // bands
    with pytest.raises(ValueError):
        simhash_auto_band_scheme(100, hamming_tol=63)


def test_simhash_multi_band_pairs_equal_single_band(spark):
    """Composite k-of-bands keys must find EXACTLY the single-band
    candidate set after the hamming <= tol rescore (generalized
    pigeonhole: <= tol flips leave >= k of tol+k bands untouched, so
    some k-combination key matches) — recall is a theorem, not a knob;
    only the candidate-join volume changes (2**(width*(k-1)) more
    buckets; measured in SCALE.md's round-7 band-volume table)."""
    from webscrap_datapipeline_spark.catalog import load_table
    from webscrap_datapipeline_spark.operators.dedup import (
        simhash,
        simhash_bit_band_keys,
        simhash_near_dup_pairs_multi,
    )

    docs = load_table(spark, "documents", SF_SMALL).filter(F.col("doc_id") < 300)
    sh = simhash(docs, "text", "doc_id").localCheckpoint()
    single = simhash_bit_band_keys(sh)
    a, b = single.alias("a"), single.alias("b")
    base = {
        (r["doc_a"], r["doc_b"], r["hamming"])
        for r in (
            a.join(
                b,
                (F.col("a.band_idx") == F.col("b.band_idx"))
                & (F.col("a.band_val") == F.col("b.band_val"))
                & (F.col("a.doc") < F.col("b.doc")),
            )
            .select(
                F.col("a.doc").alias("doc_a"),
                F.col("b.doc").alias("doc_b"),
                F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))).alias(
                    "hamming"
                ),
            )
            .filter(F.col("hamming") <= 8)
            .distinct()
        ).collect()
    }
    assert base, "corpus slice must contain near-dup pairs for the test to bind"
    # k=4 is the scheme simhash_auto_band_scheme picks at the ×1024
    # corpus (4, 12, 5) — C(12,4)=495 combos, the regime where the key
    # assembly MUST run through the broadcast combo table (a 495-struct
    # literal array trips janino's method limits); pinning it here means
    # the production mitigation path, not just the small-k shapes, is
    # recall-exact.
    for k in (2, 3, 4):
        multi = {
            (r["doc_a"], r["doc_b"], r["hamming"])
            for r in simhash_near_dup_pairs_multi(sh, hamming_tol=8, k=k).collect()
        }
        assert multi == base


def test_simhash_wide_and_exploded_forms_identical(spark):
    """The two plan shapes of dedup.simhash (wide conditional-sum
    aggregate for corpora; bit-row explode for tiny slices, where the
    wide form's codegen-compile constant dominates) must be
    bit-identical — the oracled queries check the explode form against
    DuckDB, so this equality is what extends that proof to the wide
    corpus path."""
    from webscrap_datapipeline_spark.catalog import load_table
    from webscrap_datapipeline_spark.operators.dedup import simhash

    docs = load_table(spark, "documents", SF_SMALL)
    wide = {(r["doc"], r["simhash"]) for r in simhash(docs, "text", "doc_id", wide=True).collect()}
    narrow = {(r["doc"], r["simhash"]) for r in simhash(docs, "text", "doc_id", wide=False).collect()}
    assert wide == narrow and len(wide) == docs.count()
