"""End-to-end incremental-pipeline test on synthetic fixtures shaped per
FIXTURES.md A1–A4: raw pipe-delimited per-location CSVs with the
filename convention, a JSON state store, and a source listing. Verifies
the reference semantics chain (SURVEY.md §3.1): change detection →
enrichment → SCD current-flag warehouse → audit log → state commit, plus
the idempotence invariant (second run with committed state = no-op)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from webscrap_datapipeline_spark.pipeline import run_incremental

from .conftest import SF_SMALL
from webscrap_datapipeline_spark.sources.state_store import read_state

HEADER = (
    "Rate Code|Room Type|Arrival Date|Los|Rate (USD)|Base-Rate|Differential|"
    "Channel|Status|Min Stay|Max Stay|Closed To Arrival|Closed To Departure|"
    "Notes|Ref Code|Last Modified"
)


def _write_raw(dirpath: str, code: str, ts: str, n_rows: int) -> None:
    path = os.path.join(dirpath, f"{code}_{ts}.csv")
    with open(path, "w") as fh:
        fh.write(HEADER + "\n")
        for i in range(n_rows):
            fh.write(
                f"R{i}|KING|2026-08-{10 + (i % 15):02d}|{1 + i % 3}|{100.0 + i}|{90.0 + i}|"
                f"{10.0}|WEB|OPEN|1|7|N|N||0{i:04d}|2026-08-01 00:00:00\n"
            )


@pytest.fixture()
def workspace(tmp_path):
    raw = tmp_path / "raw"
    raw.mkdir()
    return {
        "raw": str(raw),
        "state": str(tmp_path / "state.json"),
        "warehouse": str(tmp_path / "warehouse.parquet"),
        "log": str(tmp_path / "log.parquet"),
    }


def _available(spark, rows):
    return spark.createDataFrame(rows, ["key", "last_seen_ts"])


def test_full_cycle_then_idempotent(spark, workspace):
    _write_raw(workspace["raw"], "ALPHA", "08132026_10-00-00", 5)
    _write_raw(workspace["raw"], "BRAVO", "08132026_10-30-00", 3)
    available = _available(spark, [("ALPHA", "2026-08-13T10"), ("BRAVO", "2026-08-13T10")])

    res = run_incremental(
        spark, available, workspace["raw"] + "/*.csv",
        workspace["state"], workspace["warehouse"], workspace["log"],
    )
    assert res.changed_keys == 2
    assert res.loaded_rows == 8
    assert res.log_rows == 2

    wh = spark.read.parquet(workspace["warehouse"])
    # every loaded row is current; LOC_ID derived from the filename
    assert wh.filter(F.col("CURRENT_IND") == "Y").count() == 8
    assert set(r["LOC_ID"] for r in wh.select("LOC_ID").distinct().collect()) == {"ALPHA", "BRAVO"}
    # filename timestamp parsed to a real timestamp
    ts = wh.filter(F.col("LOC_ID") == "ALPHA").select("LST_UPDT_TS").first()[0]
    assert str(ts).startswith("2026-08-13 10:00:00")
    # Ref Code column kept as string with leading zeros (reference dtype={14:str})
    ref = wh.filter(F.col("LOC_ID") == "ALPHA").select("REF_CODE").first()[0]
    assert ref.startswith("0")

    # state committed for both keys
    st = read_state(spark, workspace["state"])
    assert st.count() == 2

    # second run with identical source listing → change detection finds nothing
    res2 = run_incremental(
        spark, available, workspace["raw"] + "/*.csv",
        workspace["state"], workspace["warehouse"], workspace["log"],
    )
    assert res2.changed_keys == 0


def test_changed_key_flips_current_flag(spark, workspace):
    _write_raw(workspace["raw"], "ALPHA", "08132026_10-00-00", 4)
    available = _available(spark, [("ALPHA", "v1")])
    run_incremental(
        spark, available, workspace["raw"] + "/*.csv",
        workspace["state"], workspace["warehouse"], workspace["log"],
    )

    # new file arrives for the same key with a later filename timestamp
    _write_raw(workspace["raw"], "ALPHA", "08142026_09-00-00", 6)
    available2 = _available(spark, [("ALPHA", "v2")])
    run_incremental(
        spark, available2, workspace["raw"] + "/*.csv",
        workspace["state"], workspace["warehouse"], workspace["log"],
    )

    wh = spark.read.parquet(workspace["warehouse"])
    cur = wh.filter(F.col("CURRENT_IND") == "Y")
    # only the newest file's rows carry the flag (reference K5+K3 protocol)
    assert cur.count() == 6
    assert cur.select(F.min("LST_UPDT_TS")).first()[0].day == 14
    # the older rows are retained but de-flagged
    assert wh.filter(F.col("CURRENT_IND").isNull()).count() == 4


def test_missing_file_gets_null_log_row(spark, workspace):
    _write_raw(workspace["raw"], "ALPHA", "08132026_10-00-00", 2)
    # CHARLIE is listed as changed but its file never arrives (ST4)
    available = _available(spark, [("ALPHA", "x"), ("CHARLIE", "x")])
    res = run_incremental(
        spark, available, workspace["raw"] + "/*.csv",
        workspace["state"], workspace["warehouse"], workspace["log"],
    )
    assert res.log_rows == 2
    log = spark.read.parquet(workspace["log"])
    charlie = log.filter(F.col("LOC_ID") == "CHARLIE").first()
    assert charlie["DATA_AMT"] == 0 and charlie["SRC_FILENAME"] is None

    # ST2: CHARLIE must NOT advance the watermark — it retries next cycle
    st = read_state(spark, workspace["state"])
    assert [r["key"] for r in st.collect()] == ["ALPHA"]

    res2 = run_incremental(
        spark, available, workspace["raw"] + "/*.csv",
        workspace["state"], workspace["warehouse"], workspace["log"],
    )
    assert res2.changed_keys == 1  # CHARLIE still pending


def test_pipeline_quarantine_stage_diverts_bad_rows(spark, workspace, tmp_path):
    """Optional quarantine stage: rows violating load rules leave the
    warehouse path as data (with reasons) — never silently swallowed
    (the reference's per-row try/except, ST4) and never loaded."""
    _write_raw(workspace["raw"], "ALPHA", "08132026_10-00-00", 5)
    available = _available(spark, [("ALPHA", "2026-08-13T10")])
    qpath = str(tmp_path / "quarantine.parquet")

    res = run_incremental(
        spark, available, workspace["raw"] + "/*.csv",
        workspace["state"], workspace["warehouse"], workspace["log"],
        quarantine_rules={
            # fixture writes rates 100..104 — quarantine the two above 102
            "rate_in_band": F.col("RATE_USD") <= 102.0,
        },
        quarantine_path=qpath,
    )
    assert res.quarantined_rows == 2
    assert res.loaded_rows == 3
    bad = spark.read.parquet(qpath)
    assert bad.count() == 2
    assert set(bad.select(F.explode("_violations")).toDF("v").distinct().toPandas()["v"]) == {
        "rate_in_band"
    }
    wh = spark.read.parquet(workspace["warehouse"])
    assert wh.filter(F.col("RATE_USD") > 102.0).count() == 0


def test_scd_upsert_partitioned_rewrites_only_touched_buckets(spark, tmp_path):
    """Partition-scoped SCD (round-1 verdict item 6): an incoming batch
    must rewrite ONLY the hash buckets containing its keys — every
    parquet byte in untouched partition dirs stays identical — while the
    flag protocol still matches apply_current_flag semantics globally."""
    import hashlib

    from webscrap_datapipeline_spark.operators.scd import scd_upsert_partitioned

    target = str(tmp_path / "scd_target")
    n_buckets = 8
    keys = ["A", "B", "C", "D", "E", "F"]
    initial = spark.createDataFrame(
        [(k, 1, f"v1-{k}") for k in keys], ["k", "ts", "payload"]
    )
    scd_upsert_partitioned(
        spark, initial, target, key="k", ts="ts", n_buckets=n_buckets
    )

    def bucket_files():
        out = {}
        for root, _dirs, files in os.walk(target):
            for f in files:
                if f.endswith(".parquet"):
                    p = os.path.join(root, f)
                    with open(p, "rb") as fh:
                        out[os.path.relpath(p, target)] = hashlib.md5(fh.read()).hexdigest()
        return out

    before = bucket_files()
    batch = spark.createDataFrame([("A", 2, "v2-A")], ["k", "ts", "payload"])
    touched = scd_upsert_partitioned(
        spark, batch, target, key="k", ts="ts", n_buckets=n_buckets
    )
    assert len(touched) == 1
    touched_dir = f"__bucket={touched[0]}"
    after = bucket_files()

    untouched_before = {p: h for p, h in before.items() if not p.startswith(touched_dir)}
    untouched_after = {p: h for p, h in after.items() if not p.startswith(touched_dir)}
    assert untouched_before == untouched_after  # byte-identical, not rewritten

    wh = spark.read.parquet(target)
    cur = {r["k"]: r["payload"] for r in wh.filter(F.col("CURRENT_IND") == "Y").collect()}
    assert cur["A"] == "v2-A"  # new version flagged current
    assert {cur[k] for k in "BCDEF"} == {f"v1-{k}" for k in "BCDEF"}
    old_a = wh.filter((F.col("k") == "A") & (F.col("CURRENT_IND").isNull())).collect()
    assert len(old_a) == 1 and old_a[0]["payload"] == "v1-A"  # history kept, de-flagged


# ----------------------------------------------------------------------------
# Round-3 hardening guards (VERDICT r2 items 4-5, ADVICE r2).


def test_load_table_rejects_non_utc_session(spark):
    """The engine's timestamp semantics are defined in UTC; a caller
    session with another timezone must fail loudly at load time, not
    produce oracle-shifted instants (VERDICT r2 'What's wrong' #4)."""
    from webscrap_datapipeline_spark.catalog import load_table

    saved = spark.conf.get("spark.sql.session.timeZone")
    try:
        spark.conf.set("spark.sql.session.timeZone", "America/New_York")
        with pytest.raises(RuntimeError, match="timeZone=UTC"):
            load_table(spark, "events", SF_SMALL)
    finally:
        spark.conf.set("spark.sql.session.timeZone", saved)
    # and the restored session loads fine
    assert load_table(spark, "events", SF_SMALL).count() > 0


@pytest.mark.parametrize("sf_name", ["sf0.001", "sf0.01", "sf0.1"])
def test_documents_ascii_pure_at_every_shipped_sf(sf_name):
    """multimodal_feature_batches' oracle replays a byte-sum checksum as
    a codepoint sum — valid only while the corpus is pure ASCII. This
    pins that equivalence for every shipped SF so a regenerated corpus
    with one non-ASCII char fails HERE with the real diagnosis, not as
    a misread Arrow/decode bug in the driver (ADVICE r2)."""
    import duckdb

    path = os.path.join(os.path.dirname(SF_SMALL), sf_name, "documents.parquet")
    if not os.path.exists(path):
        pytest.skip(f"{sf_name} not shipped")
    n = duckdb.connect().execute(
        "SELECT COUNT(*) FROM read_parquet(?) "
        "WHERE octet_length(encode(text)) <> length(text)",
        [path],
    ).fetchone()[0]
    assert n == 0, f"{n} non-ASCII docs in {sf_name}: codepoint-sum oracle invalid"


def test_scd_upsert_target_exists_via_hadoop_fs(spark, tmp_path):
    """_target_exists consults the Hadoop FileSystem for the path's own
    scheme (ADVICE r2: os.path.exists misreads any non-driver-local URI
    as absent, turning the init overwrite into silent data loss)."""
    from webscrap_datapipeline_spark.operators.scd import _target_exists

    missing = str(tmp_path / "nope")
    assert not _target_exists(spark, missing)
    present = str(tmp_path / "yes")
    spark.range(3).write.parquet(present)
    assert _target_exists(spark, present)
    # file:// URI form resolves through the same FileSystem API
    assert _target_exists(spark, "file://" + present)


def test_label_centroids_array_matches_exploded(spark):
    """The registered exploded (label, dim, m) relation and the in-repo
    array variant are the same numbers in two shapes."""
    from webscrap_datapipeline_spark.plans.vector_queries import (
        label_centroids,
        label_centroids_array,
    )

    exploded = {
        (r["label"], r["dim"]): r["m"]
        for r in label_centroids(spark, SF_SMALL).collect()
    }
    for row in label_centroids_array(spark, SF_SMALL).collect():
        assert row["dim_count"] == len(row["centroid"])
        for i, m in enumerate(row["centroid"], start=1):
            assert exploded[(row["label"], i)] == m


def test_driver_window_is_least_recently_verified_rotation():
    """The driver verifies a 50-entry prefix of the registry export
    order, so the ordering IS the evidence-allocation policy (round-3
    VERDICT item 1): plan-changed pins first, then oracled queries with
    no green driver row, then hash-verified queries OLDEST green row
    first. Uses the committed CORRECTNESS_r*.json history."""
    from webscrap_datapipeline_spark.plans.registry import (
        _DEFER_TO_ROUND,
        _PINNED_FIRST,
        _driver_history,
        _ordered_names,
        REGISTRY,
    )

    last_green, last_seen, latest_round = _driver_history()
    names = _ordered_names()
    assert sorted(names) == sorted(REGISTRY)  # a permutation, nothing lost

    # mid-round additions defer: they sort dead-last until the previous
    # round's CORRECTNESS file exists, never displacing the allocated
    # re-verification budget
    deferred = {
        n for n, rnd in _DEFER_TO_ROUND.items() if latest_round < rnd - 1
    }
    assert set(names[len(names) - len(deferred):]) == deferred

    active_pins = [
        n for n, rnd in _PINNED_FIRST.items() if last_green.get(n, 0) < rnd
    ]
    # active pins occupy the very front
    assert set(names[: len(active_pins)]) == set(active_pins)

    # within the hash-verified tail, green rounds are non-decreasing —
    # the stalest evidence always re-verifies first
    verified_rounds = [
        last_green[n]
        for n in names
        if n in last_green and n not in active_pins and REGISTRY[n].oracle is not None
    ]
    assert verified_rounds == sorted(verified_rounds)

    # oracled-but-never-green queries (deferred aside) outrank every
    # verified query
    first_verified = next(
        i for i, n in enumerate(names) if n in last_green and n not in active_pins
    )
    for i, n in enumerate(names):
        if (
            REGISTRY[n].oracle is not None
            and n not in last_green
            and n not in active_pins
            and n not in deferred
        ):
            assert i < first_verified, f"{n} (never green) sorted after verified rows"


def test_rows_only_reentry_rule_is_capped_and_module_change_gated():
    """round-9 VERDICT item 3 + round-10 VERDICT item 2: a rows-only
    query re-enters the window (bucket 2) when its implementing module
    changed since its last driver-seen round OR its record is at least
    _MAX_ROWS_ONLY_AGE rounds old. Module-changed re-entries are capped
    at the slots left after pins, never-green oracled rows, never-seen
    rows, and the FULL oldest-green cohort, so they can never stall the
    freshness floor (item 8); age-triggered re-entries additionally
    hold up to _AGE_REENTRY_SLOTS guaranteed slots borrowed from the
    cohort's tail, so an ancient record refreshes even when the cohort
    fills the window. Pure-function test over synthetic histories, like
    the _driver_history contract itself; plus a live check that the git
    gate really fires for the committed history."""
    from webscrap_datapipeline_spark.plans.registry import (
        _AGE_REENTRY_SLOTS,
        _DEFER_TO_ROUND,
        _MAX_ROWS_ONLY_AGE,
        _ROWS_ONLY_PINNED,
        _driver_history,
        _module_changed_since_round,
        _rows_only_reentries,
        REGISTRY,
    )

    # mid-round deferred queries yield the window entirely — they are
    # not re-entry candidates either (all scenarios below use
    # latest_round=9)
    deferred = {n for n, rnd in _DEFER_TO_ROUND.items() if 9 < rnd - 1}
    rows_only = [
        n for n, q in REGISTRY.items() if q.oracle is None and n not in deferred
    ]
    assert len(rows_only) >= 3
    oracled = [n for n, q in REGISTRY.items() if q.oracle is not None]
    fresh = 9 - _MAX_ROWS_ONLY_AGE + 1  # seen-round just inside freshness

    # synthetic history: every oracled query green in round 7 (cohort
    # consumes the whole window) -> zero free slots, no FRESH re-entries
    # even though every rows-only module "changed"
    lg_full = {n: 7 for n in oracled}
    ls = {n: fresh for n in rows_only} | lg_full
    got = _rows_only_reentries(lg_full, ls, 9, lambda n, r: True)
    assert got == frozenset()

    # ...but AGED records override the full cohort: seen exactly
    # _MAX_ROWS_ONLY_AGE rounds ago, module UNchanged -> the guaranteed
    # floor admits up to _AGE_REENTRY_SLOTS of the oldest candidates
    ls_aged = {n: 9 - _MAX_ROWS_ONLY_AGE for n in rows_only} | lg_full
    got = _rows_only_reentries(lg_full, ls_aged, 9, lambda n, r: False)
    assert len(got) == min(len(rows_only), _AGE_REENTRY_SLOTS)
    # oldest-seen wins the guaranteed slots: make one candidate one
    # round staler than its peers and it must be in the chosen set
    stalest = sorted(rows_only)[-1]
    ls_one = dict(ls_aged) | {stalest: 9 - _MAX_ROWS_ONLY_AGE - 1}
    got = _rows_only_reentries(lg_full, ls_one, 9, lambda n, r: False)
    assert stalest in got

    # one round younger than the age bar, module unchanged -> nothing
    ls_young = {n: 9 - _MAX_ROWS_ONLY_AGE + 1 for n in rows_only} | lg_full
    got = _rows_only_reentries(lg_full, ls_young, 9, lambda n, r: False)
    assert got == frozenset()

    # cohort of 40 + nothing else pending -> 10 free slots, all
    # changed rows-only queries re-enter (there are fewer than 10)
    lg_small = {n: (7 if i < 40 else 8) for i, n in enumerate(oracled)}
    got = _rows_only_reentries(lg_small, ls, 9, lambda n, r: True)
    assert got == frozenset(rows_only)

    # module-change gate: nothing changed (and nothing aged) ->
    # nothing re-enters
    got = _rows_only_reentries(lg_small, ls, 9, lambda n, r: False)
    assert got == frozenset()

    # cap ordering: with fewer free slots than candidates, the
    # _ROWS_ONLY_PINNED query wins one regardless of seen-age (here it
    # is the YOUNGEST-seen candidate, which would otherwise lose).
    # Green rounds sit ABOVE every _PINNED_FIRST round so no synthetic
    # pin reactivates and eats a slot; seen-rounds stay inside the age
    # bar so the guaranteed floor stays out of this scenario.
    lg_tight = {n: (98 if i < 48 else 99) for i, n in enumerate(oracled)}
    free = 50 - sum(1 for r in lg_tight.values() if r == 98)
    assert free == 2 < len(rows_only)
    pinned = [n for n in _ROWS_ONLY_PINNED if n in rows_only]
    if pinned:
        ls_pin = {n: (fresh + 1 if n in pinned else fresh) for n in rows_only} | lg_tight
        got = _rows_only_reentries(lg_tight, ls_pin, 9, lambda n, r: True)
        assert set(pinned) <= got  # pin beats older-seen peers
        assert len(got) == free

    # the guaranteed floor is reserved for AGED candidates BY NAME:
    # with zero free slots, a FRESH pinned candidate whose module
    # changed sorts first but must NOT consume a guaranteed slot
    # (round-11 review — the front-slice implementation handed the
    # floor to non-aged entries, so the extreme-staleness records the
    # floor exists for stayed stale forever)
    if pinned:
        ls_mixed = {
            n: (fresh if n in pinned else 9 - _MAX_ROWS_ONLY_AGE)
            for n in rows_only
        } | lg_full
        got = _rows_only_reentries(
            lg_full, ls_mixed, 9, lambda n, r: n in pinned
        )
        assert got and not (set(pinned) & got)  # floor went to the aged
        assert all(9 - ls_mixed[n] >= _MAX_ROWS_ONLY_AGE for n in got)
        assert len(got) == min(
            len(rows_only) - len(pinned), _AGE_REENTRY_SLOTS
        )

    # the live git gate: the committed record says the round-10 window
    # grants re-entry to at least the pinned motivating case, and the
    # gate returns False for a round with no CORRECTNESS file
    assert _module_changed_since_round("embedding_ivf_topk", 3) is True
    assert _module_changed_since_round("embedding_ivf_topk", 9999) is False

    # the live age rule: against the committed r1-r10 history, the
    # three ancient rows-only records (r2/r3 era — round-10 VERDICT
    # item 2 names them) re-enter the r11 window
    lg_live, ls_live, latest_live = _driver_history()
    if latest_live == 10:
        got = _rows_only_reentries(
            lg_live, ls_live, latest_live, _module_changed_since_round
        )
        assert {
            "minhash_lsh_near_dups",
            "stratified_event_sample",
            "approx_value_percentiles",
        } <= got


def test_scaled_parity_corpus_preserves_fk_integrity(spark, tmp_path):
    """scripts/scaled_parity.py replicates facts with shifted order
    keys and intact dimension FKs — every scaled lineitem row must
    still resolve its order, part, and supplier, counts must grow
    exactly k-fold, and order keys must stay unique (the properties
    that make registry queries meaningful on the scaled corpus)."""
    import os

    from pyspark.sql import functions as F

    from scripts.scale_spot import SRC_SF
    from scripts.scaled_parity import build_tpch
    from webscrap_datapipeline_spark.catalog import load_table

    out = str(tmp_path / "x2")
    os.makedirs(out, exist_ok=True)
    build_tpch(spark, 2, out)
    orders = spark.read.parquet(os.path.join(out, "orders.parquet"))
    li = spark.read.parquet(os.path.join(out, "lineitem.parquet"))
    part = spark.read.parquet(os.path.join(out, "part.parquet"))
    base_orders = load_table(spark, "orders", SRC_SF).count()
    base_li = load_table(spark, "lineitem", SRC_SF).count()
    assert orders.count() == 2 * base_orders
    assert li.count() == 2 * base_li
    # order keys unique across copies
    assert orders.select("o_orderkey").distinct().count() == 2 * base_orders
    # every lineitem resolves its order and its part dimension
    assert (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"], "left_anti").count()
        == 0
    )
    assert (
        li.join(part, li["l_partkey"] == part["p_partkey"], "left_anti").count() == 0
    )


# ----------------------------------------------------------------------------
# Round-6: first-class MERGE INTO for the SCD current-flag protocol
# (VERDICT r5 item 2 — reference src/gcp_processes.py:29-47).


def test_scd_merge_into_catalog_table_matches_overwrite_protocol(spark):
    """``scd_merge_into`` (engine-primitive path: MERGE INTO de-flag +
    INSERT append on a catalog table) must land the SAME table state as
    ``apply_current_flag`` (the overwrite protocol) on the E2E fixture.
    This container ships no row-level-op v2 catalog, so the function
    takes its documented v1 fallback — the test pins (a) end-state
    equality, (b) that the fallback actually engaged, and (c) that the
    generated MERGE is ANALYZE-clean in Spark: executing it fails only
    on the storage capability (UNSUPPORTED_FEATURE.TABLE_OPERATION),
    never on parse/resolution — i.e. on Delta/Iceberg the same
    statement runs as-is."""
    from webscrap_datapipeline_spark.operators.scd import (
        apply_current_flag,
        scd_merge_into,
        scd_merge_statements,
    )

    tbl = "scd_merge_e2e"
    spark.sql(f"DROP TABLE IF EXISTS {tbl}")
    # The NULL-key rows pin the null-safe match (<=> / eqNullSafe): a
    # plain equi-join de-flag would leave BOTH null-key rows current.
    initial = spark.createDataFrame(
        [("A", 1, "v1-A"), ("B", 1, "v1-B"), ("C", 1, "v1-C"), (None, 1, "v1-N")],
        ["k", "ts", "payload"],
    )
    batch = spark.createDataFrame(
        [("A", 2, "v2-A"), ("G", 2, "v1-G"), (None, 2, "v2-N")], ["k", "ts", "payload"]
    )
    try:
        assert scd_merge_into(spark, tbl, initial, key="k") == "init"

        # (c) analyze-cleanliness of the MERGE primitive itself
        batch.createOrReplaceTempView("scd_merge_probe_src")
        deflag, _ = scd_merge_statements(
            tbl, "scd_merge_probe_src", "k", ["k", "ts", "payload"]
        )
        with pytest.raises(Exception, match="UNSUPPORTED_FEATURE.TABLE_OPERATION"):
            spark.sql(deflag)
        spark.catalog.dropTempView("scd_merge_probe_src")

        assert scd_merge_into(spark, tbl, batch, key="k") == "overwrite-fallback"

        got = sorted(
            (
                (r["k"], r["ts"], r["payload"], r["CURRENT_IND"])
                for r in spark.table(tbl).collect()
            ),
            key=repr,  # None-safe: tuples mix None and str keys
        )
        want_df = apply_current_flag(
            apply_current_flag(initial.limit(0), initial, "k", "ts"),
            batch,
            "k",
            "ts",
            dedupe_exact=False,
        )
        want = sorted(
            ((r["k"], r["ts"], r["payload"], r["CURRENT_IND"]) for r in want_df.collect()),
            key=repr,
        )
        assert got == want
        cur = {r[0]: r[2] for r in got if r[3] == "Y"}
        assert cur == {"A": "v2-A", "B": "v1-B", "C": "v1-C", "G": "v1-G", None: "v2-N"}
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {tbl}")


def test_scd_merge_transcript_duckdb_replay_matches_apply_current_flag(spark):
    """The ansi-dialect transcript (the reference's literal UPDATE+INSERT
    shape, src/gcp_processes.py:29-47) executed by a REAL second engine
    (DuckDB) must land the same state as ``apply_current_flag`` in
    Spark — the engine-level verification the missing v2 catalog would
    otherwise provide for the MERGE form (same mutation, same ON/WHERE
    predicate, same flag assignment)."""
    import duckdb
    import pandas as pd

    from webscrap_datapipeline_spark.operators.scd import (
        apply_current_flag,
        scd_merge_statements,
    )

    state = pd.DataFrame(
        {
            "k": ["A", "B", "C", None],
            "ts": [1, 1, 1, 1],
            "payload": ["v1-A", "v1-B", "v1-C", "v1-N"],
            "CURRENT_IND": ["Y", "Y", "Y", "Y"],
        }
    )
    batch = pd.DataFrame(
        {"k": ["A", "G", None], "ts": [2, 2, 2], "payload": ["v2-A", "v1-G", "v2-N"]}
    )

    con = duckdb.connect()
    con.execute("CREATE TABLE target AS SELECT * FROM state")
    con.register("incoming", batch)
    for stmt in scd_merge_statements(
        "target", "incoming", "k", ["k", "ts", "payload"], dialect="ansi"
    ):
        con.execute(stmt)
    duck = sorted(map(tuple, con.execute("SELECT * FROM target").fetchall()), key=repr)

    got_df = apply_current_flag(
        spark.createDataFrame(state),
        spark.createDataFrame(batch),
        "k",
        "ts",
        dedupe_exact=False,
    )
    got = sorted(
        ((r["k"], r["ts"], r["payload"], r["CURRENT_IND"]) for r in got_df.collect()),
        key=repr,
    )
    assert got == duck
