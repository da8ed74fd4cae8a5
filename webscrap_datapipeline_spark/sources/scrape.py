"""Effectful extraction scaffold — the reference's Selenium scraping fan-out
(X1–X4: ProcessPoolExecutor src/utils.py:30-47, manual 3-way batching
src/web_scrape.py:78-93, per-worker driver+login init :96-111, per-row
download with @retry :128-178) re-expressed as the canonical Spark
pattern: ``mapPartitions`` with per-partition session init, bounded
retry, and a status struct per row.

Design rules (SURVEY.md §4.3):
  * the fetcher is PLUGGABLE — tests inject a deterministic fake; a real
    deployment injects an HTTP/Selenium adapter. The Spark plumbing
    (partitioning, init-once-per-partition, retry, status columns) is the
    real, tested artifact; network code is not imported here at all.
  * the result is CACHED/CHECKPOINTED by the caller before any downstream
    use — Spark recomputes partitions on failure, and an effectful source
    must not re-fire side effects on recompute (§7.4 idempotence).
  * partition width replaces the reference's hand-built 3-way batch
    split: ``repartition(n)`` balances round-robin automatically (X2).
"""

from __future__ import annotations

import time
from collections.abc import Callable, Iterator
from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

FETCH_RESULT_SCHEMA = T.StructType(
    [
        T.StructField("key", T.StringType()),
        T.StructField("status", T.StringType()),  # 'ok' | 'failed'
        T.StructField("attempts", T.IntegerType()),
        T.StructField("payload", T.StringType()),  # fetched content / path
        T.StructField("error", T.StringType()),
    ]
)


@dataclass
class RetryPolicy:
    """Reference policy: tries=2, delay=2 s, backoff ×2
    (src/web_scrape.py:149)."""

    tries: int = 2
    delay: float = 2.0
    backoff: float = 2.0


def fetch_partitioned(
    keys: DataFrame,
    key_col: str,
    session_factory: Callable[[], object],
    fetch: Callable[[object, str], str],
    policy: RetryPolicy | None = None,
    num_partitions: int | None = None,
    close_session: Callable[[object], None] | None = None,
) -> DataFrame:
    """Run ``fetch(session, key)`` for every key, one session per
    partition, bounded retry per key; failures become status rows, never
    task failures (the reference swallows-and-logs too,
    src/web_scrape.py:107-110 — the NULL/failed row is the observability
    contract, ST4)."""
    policy = policy or RetryPolicy()
    sdf = keys.select(F.col(key_col).cast("string").alias("key"))
    if num_partitions:
        sdf = sdf.repartition(num_partitions)

    # plain values cross the closure boundary, not the DataFrame machinery
    tries, delay, backoff = policy.tries, policy.delay, policy.backoff

    def run_partition(rows: Iterator) -> Iterator[tuple]:
        session = session_factory()  # X3: heavyweight init once per partition
        try:
            for row in rows:
                key = row["key"]
                attempt, sleep, last_err = 0, delay, None
                while attempt < tries:
                    attempt += 1
                    try:
                        payload = fetch(session, key)
                        yield (key, "ok", attempt, payload, None)
                        break
                    except Exception as exc:  # noqa: BLE001 — status row, not crash
                        last_err = f"{type(exc).__name__}: {exc}"
                        if attempt < tries:
                            time.sleep(sleep)
                            sleep *= backoff
                else:
                    yield (key, "failed", tries, None, last_err)
        finally:
            if close_session is not None:
                close_session(session)

    return sdf.rdd.mapPartitions(run_partition).toDF(FETCH_RESULT_SCHEMA)
