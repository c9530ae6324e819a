"""Fetch stage (SURVEY.md §2.3 J2, §2.9).

Fixture mode (tests / recorded corpora): fetching IS a join — the popped
batch equi-joins the ``pages`` table on url. Catalyst picks broadcast vs
sort-merge; at 100 TB the pages side is the big one, so the (much smaller)
round batch broadcasts and the scan prunes to the joined keys.

Live mode replaces the join with a host-grouped ``mapInPandas`` HTTP worker
(stdlib urllib: keepAlive opener + cookie jar per host, 60 s timeout, 50 MB
cap — base.js:38-56; tested against a localhost server in
tests/test_live_fetch.py). POST connectors — _msearch NDJSON, GraphQL,
form-encoded, JSON pagination — get their request body from per-connector
templates via ``build_request``. Retry/backoff is modelled
batch-iteratively: failed URLs re-enqueue with ``attempts+1`` and are
dropped after ``max_attempts`` (the watermark analog, §2.9).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MAX_ATTEMPTS = 10  # base.js:46-56 (axios-retry retries: 10)

#: semi-filter broadcast gate (mirrors BloomTable.BROADCAST_MAX_BYTES):
#: the round batch is budget-bounded per host but unbounded in hosts, so
#: the URL-set broadcast is hinted only under a driver-known row bound
BROADCAST_MAX_BYTES = 64 * 1024 * 1024
URL_BYTES = 256  # ~100 B url string + hashed-relation overhead


def fixture_fetch(
    batch: DataFrame, pages: DataFrame, batch_bound: int | None = None
) -> DataFrame:
    """J2: popped batch ⋈ pages on url → body column; miss ⇒ status 404.

    Join shape chosen for the 100 TB case: a naive ``batch LEFT JOIN pages``
    forces building the *pages* side (BroadcastHashJoin LeftOuter can only
    build right), shuffling or broadcasting the huge table. Instead:

    1. SEMI-filter the pages scan by the bounded round batch — broadcast
       when the driver-known ``batch_bound`` (the round loop passes its
       exact ``n_popped``) estimates under BROADCAST_MAX_BYTES, so one
       streaming pass over pages with the hash set as the runtime row
       filter; a host-unbounded batch falls back to a shuffle semi-join
       instead of blowing the driver;
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
    batch_urls = batch.select(F.col("url").alias("__b_url"))
    if batch_bound is not None and batch_bound * URL_BYTES <= BROADCAST_MAX_BYTES:
        batch_urls = F.broadcast(batch_urls)
    relevant = (
        pages.select(*page_cols)
        .join(
            batch_urls,
            F.col("__page_url") == F.col("__b_url"),
            "left_semi",
        )
    )
    # multi-snapshot corpora (the input-hint shape allows several warc_ts
    # rows per url) must not fan the popped row out into duplicate
    # records: keep the LATEST snapshot per url, tie-broken by content
    # hash so the pick is deterministic under identical timestamps.
    # max_by instead of a row_number window: same winner, but a hash
    # aggregation with MAP-SIDE partial combine and no sort — measured
    # ~half the per-round overhead of the window on the crawl loop. Runs
    # on the semi-filtered survivors only (bounded by the round batch,
    # never the full pages table), and its url grouping is the same key
    # the left join below shuffles on.
    payload_cols = [c for c in relevant.columns if c != "__page_url"]
    relevant = (
        relevant.groupBy("__page_url")
        .agg(
            F.max_by(
                F.struct(*payload_cols),
                F.struct(F.col("warc_ts"), F.xxhash64("body")),
            ).alias("__snap")
        )
        .select("__page_url", "__snap.*")
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


def live_retryable():
    """Which failures re-enqueue in live mode — mirrors axios-retry's
    network-or-idempotent policy (base.js:46-56): network errors (-1),
    5xx, timeout-ish 408/429. Other 4xx are permanent (a 404 record is
    skipped, not retried)."""
    s = F.col("status")
    return (s < 0) | (s >= 500) | s.isin(408, 429)


def split_retries(
    fetched: DataFrame,
    max_attempts: int = MAX_ATTEMPTS,
    retryable=None,
):
    """(ok, retry, dead) — retryable failures re-enqueue with attempts+1
    until the retry budget (watermark) expires; non-retryable failures die
    immediately; the reference logs-and-continues either way (per-record
    try/catch, les-arts-decoratifs.js:34-40). Fixture mode treats every
    failure as transient (default predicate); live mode passes
    ``live_retryable()``."""
    if retryable is None:
        retryable = F.lit(True)
    ok = fetched.where(F.col("status") == 200)
    failed = fetched.where(F.col("status") != 200)
    retry = (
        failed.where(retryable & (F.col("attempts") + 1 < max_attempts))
        .withColumn("attempts", F.col("attempts") + 1)
    )
    dead = failed.where(~retryable | (F.col("attempts") + 1 >= max_attempts))
    return ok, retry, dead


class _SafeDict(dict):
    """format_map namespace where unknown placeholders render as ''."""

    def __missing__(self, key):  # pragma: no cover - trivial
        return ""


def build_request(
    url: str, kind: str, cfg, session: dict | None = None
) -> tuple[str, bytes | None, dict]:
    """(send_url, data, extra_headers) for one frontier row.

    GET connectors (or no config) pass through untouched. POST connectors
    (joconde.js:44-51 _msearch NDJSON, paris-musees.js:65-80 GraphQL,
    ceres-mcu.js:111-118 form fields, mtmad.js:80-93 JSON) fill the
    kind-appropriate body template from the frontier URL's query params
    (plus ``body_defaults``, ``session`` fields harvested from earlier
    same-host responses — imatex.js:41-107 __VIEWSTATE splicing — and
    ``{id}`` = last path segment), then strip the identity-only params
    from the sent URL. Precedence: defaults < session < URL params."""
    if cfg is None or cfg.method == "GET":
        return url, None, {}
    if kind == "secondary":
        # typed secondary fetches are always plain GETs (gallica.js:89,123
        # axios.get), even on connectors whose records POST
        return url, None, {}
    tpl = (
        cfg.body_template
        if kind == "search"
        else cfg.detail_body_template
    )
    if tpl is None:
        return url, None, {}
    from urllib.parse import parse_qsl, urlencode, urlsplit, urlunsplit

    sp = urlsplit(url)
    params = dict(parse_qsl(sp.query))
    ns = _SafeDict(cfg.body_defaults)
    if session:
        ns.update(session)
    ns.update(params)
    ns["id"] = sp.path.rsplit("/", 1)[-1]
    data = tpl.format_map(ns).encode("utf-8")
    if cfg.strip_params:
        kept = [
            (k, v)
            for k, v in parse_qsl(sp.query)
            if k not in cfg.strip_params
        ]
        sp = sp._replace(query=urlencode(kept))
    headers = (
        {"Content-Type": cfg.content_type} if cfg.content_type else {}
    )
    return urlunsplit(sp), data, headers


def live_fetch(
    batch: DataFrame,
    timeout_s: float = 60.0,
    max_bytes: int = 50 * 1024 * 1024,
    user_agent: str = "crawler-spark/0.1",
    connectors: dict | None = None,
) -> DataFrame:
    """Live HTTP fetch stage (J2 live mode) — real, stdlib-only.

    Reference config mirrored from base.js:38-56: 60 s timeout, 50 MB body
    cap, connection-reuse per host. Input partitions are salted-by-host and
    sorted (host, …) by the politeness stage, so this worker owns each
    host's run contiguously: it enforces the per-row ``crawl_delay_ms``
    between same-host requests (Mercator-style politeness) and keeps one
    opener per host (cookie jar ↔ the S6 sessions, imatex.js:38-115).

    Per-request retries stay OUT of this stage — failures re-enqueue through
    ``split_retries`` round-by-round (the batch-iterative analog of
    axios-retry's in-process backoff, SURVEY.md §2.9). Statuses: HTTP code,
    ``-1`` network/timeout error, ``413`` body-over-cap.

    ``connectors`` (connector_id → ConnectorConfig) enables POST
    connectors: each row's request is shaped by ``build_request`` — method,
    body template, Content-Type, identity-param stripping. The dict is a
    handful of configs; it ships inside the task closure.

    Conditional revisits (RFC 9110 §13): rows carrying non-null
    ``req_etag`` / ``req_last_modified`` input columns send
    ``If-None-Match`` / ``If-Modified-Since``; an unchanged resource
    answers 304 with no body (status 304, body NULL). The output always
    appends ``etag`` / ``last_modified`` columns with the response's
    validators (on 304, the request's own — still the freshest known), so
    the engine can persist them for the next revisit (reserved output
    names — don't feed input columns called ``etag``/``last_modified``).
    """
    delay_col = (
        F.col("crawl_delay_ms")
        if "crawl_delay_ms" in batch.columns
        else F.lit(0).alias("crawl_delay_ms")
    )
    inp = batch.withColumn("__delay_ms", delay_col)
    in_cols = [c for c in inp.columns]
    out_schema = ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}"
        for f in inp.schema.fields
        if f.name != "__delay_ms"
    ) + (
        ", body binary, warc_ts timestamp, lang string, status int,"
        " bytes long, etag string, last_modified string, final_url string"
    )

    def _fetch(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import http.cookiejar
        import re as _re
        import time as _time
        import urllib.error
        import urllib.request
        from urllib.parse import urljoin

        openers: dict[str, urllib.request.OpenerDirector] = {}
        last_hit: dict[str, float] = {}
        # S6 stateful sessions (imatex.js:41-107): harvested response
        # fields (__VIEWSTATE & co) live next to the host's cookie jar for
        # exactly as long as the worker owns the host's contiguous run.
        # handshaked: hosts whose form page was already fetched — ONE
        # attempt per host per worker, even if the page cannot yield every
        # configured field (retrying per row would double request volume)
        session_state: dict[str, dict] = {}
        handshaked: set[str] = set()

        def opener_for(host: str):
            if host not in openers:
                jar = http.cookiejar.CookieJar()
                openers[host] = urllib.request.build_opener(
                    urllib.request.HTTPCookieProcessor(jar)
                )
            return openers[host]

        def harvest(host: str, cfg, body: bytes | None) -> None:
            """Re-capture each session field from a same-host response."""
            if cfg is None or not cfg.session_field_regex or body is None:
                return
            text = body.decode(cfg.encoding or "utf-8", "replace")
            st = session_state.setdefault(host, {})
            for name, rx in cfg.session_field_regex.items():
                m = _re.search(rx, text)
                if m:
                    st[name] = m.group(1)

        def wait_politeness(host: str, delay) -> None:
            if delay and host in last_hit:
                wait = last_hit[host] + delay / 1000.0 - _time.monotonic()
                if wait > 0:
                    _time.sleep(wait)

        for pdf in it:
            out = {c: [] for c in in_cols if c != "__delay_ms"}
            out.update({"body": [], "warc_ts": [], "lang": [],
                        "status": [], "bytes": [],
                        "etag": [], "last_modified": [],
                        "final_url": []})
            # plain tuples + a name→position map: named itertuples RENAMES
            # underscore-prefixed columns to positional _N, which silently
            # turned getattr(row, "__delay_ms", 0) into a constant 0 — the
            # crawl-delay was never enforced
            ci = {c: i for i, c in enumerate(pdf.columns)}
            host_i = ci.get("host")
            delay_i = ci.get("__delay_ms")
            kind_i = ci.get("kind")
            cid_i = ci.get("connector_id")
            url_i = ci["url"]
            # conditional revisit: rows carrying stored validators send
            # them (RFC 9110 §13.1); a 304 answer costs headers, not body
            retag_i = ci.get("req_etag")
            rlm_i = ci.get("req_last_modified")
            for row in pdf.itertuples(index=False, name=None):
                host = row[host_i] if host_i is not None else ""
                delay = (row[delay_i] or 0) if delay_i is not None else 0
                wait_politeness(host, delay)
                body, status = None, -1
                req_etag = row[retag_i] if retag_i is not None else None
                req_lm = row[rlm_i] if rlm_i is not None else None
                resp_etag, resp_lm = None, None
                final_url = None
                try:
                    cfg = (
                        connectors.get(
                            row[cid_i] if cid_i is not None else None
                        )
                        if connectors
                        else None
                    )
                    # stateful-POST handshake (imatex.js:38-44): a worker
                    # holding no session state for a host that needs it
                    # GETs the form page first and harvests the fields —
                    # the batch analog of "load the form, then post it
                    # back". Honors crawl-delay like any other request.
                    # Gated on the ROW actually POSTing (a detail row with
                    # no detail template goes out as a plain GET and needs
                    # no session) and attempted at most once per host.
                    kind = row[kind_i] if kind_i is not None else "record"
                    will_post = (
                        cfg is not None
                        and cfg.method == "POST"
                        and kind != "secondary"
                        and (
                            cfg.body_template
                            if kind == "search"
                            else cfg.detail_body_template
                        )
                        is not None
                    )
                    if (
                        will_post
                        and cfg.session_field_regex
                        and cfg.session_handshake_url
                        and host not in handshaked
                        and any(
                            k not in session_state.get(host, {})
                            for k in cfg.session_field_regex
                        )
                    ):
                        handshaked.add(host)
                        hs_url = urljoin(row[url_i], cfg.session_handshake_url)
                        try:
                            hs_req = urllib.request.Request(
                                hs_url, headers={"User-Agent": user_agent}
                            )
                            with opener_for(host).open(
                                hs_req, timeout=timeout_s
                            ) as hr:
                                harvest(host, cfg, hr.read(max_bytes))
                        except Exception:
                            pass  # handshake failure surfaces on the POST
                        last_hit[host] = _time.monotonic()
                        wait_politeness(host, delay)
                    send_url, data, extra = build_request(
                        row[url_i],
                        kind,
                        cfg,
                        session=session_state.get(host),
                    )
                    hdrs = {"User-Agent": user_agent, **extra}
                    if req_etag:
                        hdrs["If-None-Match"] = req_etag
                    if req_lm:
                        hdrs["If-Modified-Since"] = req_lm
                    req = urllib.request.Request(
                        send_url, data=data, headers=hdrs
                    )
                    with opener_for(host).open(req, timeout=timeout_s) as r:
                        body = r.read(max_bytes + 1)
                        status = r.status
                        resp_etag = r.headers.get("ETag")
                        resp_lm = r.headers.get("Last-Modified")
                        # 3xx chains followed by the opener: surface the
                        # landing URL so the engine can learn the alias
                        landed = r.geturl()
                        if landed and landed != send_url:
                            final_url = landed
                        if len(body) > max_bytes:
                            body, status = None, 413  # 50 MB cap (base.js:43)
                    harvest(host, cfg, body)
                except urllib.error.HTTPError as e:
                    status = e.code
                    if status == 304:
                        # our stored copy is current; the validators we
                        # sent remain the freshest known
                        resp_etag, resp_lm = req_etag, req_lm
                except Exception:
                    status = -1  # network/timeout — retryable
                last_hit[host] = _time.monotonic()
                for c in out:
                    if c == "body":
                        out[c].append(body)
                    elif c == "warc_ts":
                        out[c].append(pd.Timestamp.utcnow().tz_localize(None))
                    elif c == "lang":
                        out[c].append(None)
                    elif c == "status":
                        out[c].append(status)
                    elif c == "bytes":
                        out[c].append(len(body) if body is not None else 0)
                    elif c == "etag":
                        out[c].append(resp_etag)
                    elif c == "last_modified":
                        out[c].append(resp_lm)
                    elif c == "final_url":
                        out[c].append(final_url)
                    else:
                        out[c].append(row[ci[c]])
            yield pd.DataFrame(out)

    return inp.mapInPandas(_fetch, out_schema)


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
