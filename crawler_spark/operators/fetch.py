"""Fetch stage (SURVEY.md §2.3 J2, §2.9).

Fixture mode (tests / recorded corpora): fetching IS a join — the popped
batch equi-joins the ``pages`` table on url. Catalyst picks broadcast vs
sort-merge; at 100 TB the pages side is the big one, so the (much smaller)
round batch broadcasts and the scan prunes to the joined keys.

Live mode would replace the join with a host-grouped ``mapInPandas`` HTTP
worker (keepAlive session per host, 60 s timeout, 10 retries with exponential
backoff, 50 MB cap — base.js:38-56); the sandbox has no network, so that
worker is a clearly-marked stub with the same signature. Retry/backoff is
modelled batch-iteratively: failed URLs re-enqueue with ``attempts+1`` and are
dropped after ``max_attempts`` (the watermark analog, §2.9).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MAX_ATTEMPTS = 10  # base.js:46-56 (axios-retry retries: 10)


def fixture_fetch(batch: DataFrame, pages: DataFrame) -> DataFrame:
    """J2: popped batch ⋈ pages on url → body column; miss ⇒ status 404.

    Join shape chosen for the 100 TB case: a naive ``batch LEFT JOIN pages``
    forces building the *pages* side (BroadcastHashJoin LeftOuter can only
    build right), shuffling or broadcasting the huge table. Instead:

    1. broadcast-SEMI-filter the pages scan by the bounded round batch
       (≤ sum of host budgets) — one streaming pass over pages, the
       broadcast hash set acts as the runtime row filter;
    2. LEFT-join the batch against the now-bounded survivors (builds the
       small right side). Misses fall out of the left join as 404s — no
       second pages scan.
    """
    page_cols = [
        F.col("url").alias("__page_url"),
        F.col("html").alias("body"),
        F.col("warc_ts"),
    ]
    if "lang" in pages.columns:
        page_cols.append(F.col("lang"))
    relevant = (
        pages.select(*page_cols)
        .join(
            F.broadcast(batch.select(F.col("url").alias("__b_url"))),
            F.col("__page_url") == F.col("__b_url"),
            "left_semi",
        )
    )
    joined = batch.join(
        relevant, batch["url"] == F.col("__page_url"), "left"
    ).drop("__page_url")
    return (
        joined.withColumn(
            "status", F.when(F.col("body").isNotNull(), 200).otherwise(404)
        )
        .withColumn("bytes", F.coalesce(F.length("body"), F.lit(0)).cast("long"))
    )


def split_retries(fetched: DataFrame, max_attempts: int = MAX_ATTEMPTS):
    """(ok, retry, dead) — failed rows re-enqueue with attempts+1 until the
    retry budget (watermark) expires; the reference logs-and-continues
    (per-record try/catch, les-arts-decoratifs.js:34-40)."""
    ok = fetched.where(F.col("status") == 200)
    failed = fetched.where(F.col("status") != 200)
    retry = (
        failed.where(F.col("attempts") + 1 < max_attempts)
        .withColumn("attempts", F.col("attempts") + 1)
    )
    dead = failed.where(F.col("attempts") + 1 >= max_attempts)
    return ok, retry, dead


def live_fetch_batch(
    it: Iterator[pd.DataFrame],
    timeout_s: float = 60.0,
    max_bytes: int = 50 * 1024 * 1024,
    crawl_delay_ms: int = 0,
) -> Iterator[pd.DataFrame]:
    """Live-HTTP mapInPandas worker — STUB (sandbox has no network).

    Contract (for a real deployment): input partitions are salted-by-host and
    sorted (host, order) so this worker owns each host's run contiguously and
    can hold one keepAlive session + cookie jar per host (the S6 ASP.NET /
    Floracci sessions, imatex.js:38-115, mtmad.js:19-78) and sleep
    ``crawl_delay_ms`` between same-host requests. Output schema matches
    ``fixture_fetch``.
    """
    raise NotImplementedError(
        "live HTTP fetch is environment-gated; use fixture_fetch in tests"
    )


def sessionful_fixture_fetch(
    batch: DataFrame,
    pages_map: dict[str, bytes],
) -> DataFrame:
    """S6 sessionful fetch over a (small, broadcastable) fixture corpus.

    Models the ASP.NET / Floracci handshakes (imatex.js:38-115,
    mtmad.js:19-78, versailles.js:27-49): the FIRST request a worker makes
    to a host performs a session handshake (cookie/VIEWSTATE); subsequent
    requests to the same host must present that session. Because the batch
    is salted-by-host and ``sortWithinPartitions(host, …)`` (politeness
    stage), each worker sees its hosts' rows contiguously, so one session
    object per host lives exactly as long as the host's run — the property
    this operator asserts (a non-contiguous host would re-handshake,
    observable in ``session_seq``).

    Output adds: ``session_id`` (host#k within the worker), ``session_seq``
    (request index inside that session).
    """
    import pandas as pd  # noqa: F811 (worker-side import)

    spark = batch.sparkSession
    bc = spark.sparkContext.broadcast(pages_map)

    def _fetch(it):
        for pdf in it:
            sessions: dict[str, int] = {}
            counters: dict[str, int] = {}
            n_opened = 0
            out = {
                "url": [], "host": [], "status": [], "body": [],
                "session_id": [], "session_seq": [],
            }
            last_host = None
            for url, host in zip(pdf["url"], pdf["host"]):
                if host != last_host:
                    # host run boundary: open a session on first sight;
                    # re-handshake if the host reappears (broken affinity)
                    n_opened += 1 if host not in sessions else 0
                    if host not in sessions:
                        sessions[host] = n_opened  # handshake
                        counters[host] = 0
                    elif last_host is not None:
                        # non-contiguous host ⇒ new session (observable)
                        n_opened += 1
                        sessions[host] = n_opened
                    last_host = host
                counters[host] = counters.get(host, 0) + 1
                body = bc.value.get(url)
                out["url"].append(url)
                out["host"].append(host)
                out["status"].append(200 if body is not None else 404)
                out["body"].append(body)
                out["session_id"].append(f"{host}#{sessions[host]}")
                out["session_seq"].append(counters[host])
            yield pd.DataFrame(out)

    schema = (
        "url string, host string, status int, body binary, "
        "session_id string, session_seq int"
    )
    return batch.select("url", "host").mapInPandas(_fetch, schema)
