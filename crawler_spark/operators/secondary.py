"""Gallica-style typed secondary fetches, distributed (gallica.js:83-148).

The reference enriches each record with a typed chain of EXTRA page fetches
— the *notice* page (URL from a parent field value, gallica.js:83-89) and
the *book* page (URL from a link on the notice page, gallica.js:116-121) —
whose fields merge into the PARENT record under a ``<kind>.`` prefix.

Spark shape: one bounded fetch-join per hop (chain length is a static
config property, 2 for gallica), then ONE aggregation packs each parent's
hops into an ordered chain and a final Arrow-batched merge applies the
shared :func:`~crawler_spark.operators.extract.merge_secondaries` — the
same function the pure-Python replay oracle uses, so engine and oracle
cannot drift. Per round the extra work is O(records-with-secondaries):
the hop waves are subsets of the round's record batch, each fetch-join
reuses the broadcast-semi-filtered ``fixture_fetch`` (or ``live_fetch``
in live mode), and nothing is collected to the driver.

Secondary fetches are inline enrichment, not frontier candidates: they are
never committed to the URL-seen set and don't consume politeness budget —
exactly the reference's behavior (per-record ``await axios.get`` with no
queue, refetched each time the record is crawled).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from crawler_spark.operators.extract import (
    RECORD_OUT_COLS,
    RECORD_OUT_SCHEMA,
    ConnectorConfig,
    extract_secondary,
    merge_secondaries,
)
from crawler_spark.operators.fetch import fixture_fetch, live_fetch

_SEED_SCHEMA = "parent_url string, connector_id string, url string"
_PARSED_SCHEMA = (
    "parent_url string, connector_id string, hop int, kind string, "
    "url string, sec_fields array<struct<label:string,value:string>>, "
    "sec_images array<struct<id:string,url:string,title:string,"
    "description:string,author:string,license:string>>, next_url string"
)


def chain_len(connectors: dict[str, ConnectorConfig] | None) -> int:
    """Longest secondary chain across connectors (0 ⇒ feature disabled,
    the round loop skips this stage entirely)."""
    if not connectors:
        return 0
    return max(
        (len(c.secondary_fetches) for c in connectors.values()), default=0
    )


def _values_of(field_entry) -> list:
    # array<struct<label,values>> rows arrive as dicts (values possibly a
    # numpy array — no `or []` truthiness) via Arrow
    v = (
        field_entry.get("values")
        if isinstance(field_entry, dict)
        else field_entry[1]
    )
    return [] if v is None else list(v)


def _label_of(field_entry) -> str:
    if isinstance(field_entry, dict):
        return field_entry.get("label")
    return field_entry[0]


def seed_wave(rec_rows_cid: DataFrame, connectors: dict) -> DataFrame:
    """Hop-0 URLs: the parent field value named by the chain's
    ``from_field`` (gallica.js:83-89 getFieldByLabel)."""

    def _seed(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = {"parent_url": [], "connector_id": [], "url": []}
            for url, cid, fields in zip(
                pdf["url"], pdf["connector_id"], pdf["fields"]
            ):
                cfg = connectors.get(cid)
                sfs = cfg.secondary_fetches if cfg else ()
                if not sfs or sfs[0].from_field is None:
                    continue
                vals = next(
                    (
                        _values_of(f)
                        for f in (fields if fields is not None else [])
                        if _label_of(f) == sfs[0].from_field
                    ),
                    None,
                )
                if not vals or not vals[0]:
                    continue
                out["parent_url"].append(url)
                out["connector_id"].append(cid)
                out["url"].append(vals[0])
            yield pd.DataFrame(out)

    return rec_rows_cid.select("url", "connector_id", "fields").mapInPandas(
        _seed, _SEED_SCHEMA
    )


def parse_hop(fetched: DataFrame, connectors: dict, hop: int) -> DataFrame:
    """Fetched hop pages → prefixed fields + image + next hop URL.
    404/missing bodies still emit the hop row (``<kind>.url`` is recorded
    before the fetch, gallica.js:85-89) with no fields and no next hop."""

    def _parse(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = {
                "parent_url": [], "connector_id": [], "hop": [],
                "kind": [], "url": [], "sec_fields": [],
                "sec_images": [], "next_url": [],
            }
            for purl, cid, url, body in zip(
                pdf["parent_url"], pdf["connector_id"], pdf["url"],
                pdf["body"],
            ):
                cfg = connectors.get(cid)
                sfs = cfg.secondary_fetches if cfg else ()
                if hop >= len(sfs):
                    continue
                sf = sfs[hop]
                next_sf = sfs[hop + 1] if hop + 1 < len(sfs) else None
                fields: list[dict] = []
                images: list[dict] = []
                next_url = None
                if body is not None:
                    parsed = extract_secondary(
                        bytes(body), url, sf, cfg, purl, next_sf
                    )
                    fields = [
                        {"label": l, "value": v} for l, v in parsed["fields"]
                    ]
                    images = parsed["images"]
                    next_url = parsed["next_url"]
                out["parent_url"].append(purl)
                out["connector_id"].append(cid)
                out["hop"].append(hop)
                out["kind"].append(sf.kind)
                out["url"].append(url)
                out["sec_fields"].append(fields)
                out["sec_images"].append(images)
                out["next_url"].append(next_url)
            yield pd.DataFrame(out)

    return fetched.select(
        "parent_url", "connector_id", "url", "body"
    ).mapInPandas(_parse, _PARSED_SCHEMA)


def merge_into_records(rec_rows_cid: DataFrame, sec_all: DataFrame) -> DataFrame:
    """Pack each parent's hops into an ordered chain (one aggregation) and
    apply the shared python-side merge. Output = RECORD_OUT_SCHEMA (the
    connector_id helper column is dropped)."""
    chains = sec_all.groupBy("parent_url").agg(
        F.sort_array(
            F.collect_list(
                F.struct("hop", "kind", "url", "sec_fields", "sec_images")
            )
        ).alias("__chain")
    )
    joined = rec_rows_cid.join(
        chains, rec_rows_cid["url"] == chains["parent_url"], "left"
    ).drop("parent_url", "connector_id")

    out_cols = [
        "url", "record_id", "text", "keep", "fields", "images",
        "related_urls", "raw",
    ]

    def _merge(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = {c: [] for c in out_cols}
            for (url, record_id, text, keep, r_fields, r_images,
                 related_urls, raw, chain_raw) in zip(
                pdf["url"], pdf["record_id"], pdf["text"], pdf["keep"],
                pdf["fields"], pdf["images"], pdf["related_urls"],
                pdf["raw"], pdf["__chain"],
            ):
                fields = [
                    (_label_of(f), _values_of(f))
                    for f in (r_fields if r_fields is not None else [])
                ]
                images = [
                    dict(im)
                    for im in (r_images if r_images is not None else [])
                ]
                rec = {"fields": fields, "images": images, "text": text}
                if chain_raw is not None and len(chain_raw) > 0:
                    chain = [
                        {
                            "kind": h["kind"],
                            "url": h["url"],
                            "fields": [
                                (f["label"], f["value"])
                                for f in (
                                    h["sec_fields"]
                                    if h["sec_fields"] is not None
                                    else []
                                )
                            ],
                            "images": [
                                dict(im)
                                for im in (
                                    h["sec_images"]
                                    if h["sec_images"] is not None
                                    else []
                                )
                            ],
                        }
                        for h in chain_raw
                    ]
                    merge_secondaries(rec, chain)
                out["url"].append(url)
                out["record_id"].append(record_id)
                out["text"].append(rec["text"])
                out["keep"].append(keep)
                out["fields"].append(
                    [{"label": l, "values": v} for l, v in rec["fields"]]
                )
                out["images"].append(rec["images"])
                out["related_urls"].append(
                    list(related_urls) if related_urls is not None else []
                )
                out["raw"].append(raw)
            yield pd.DataFrame(out)

    return joined.mapInPandas(_merge, RECORD_OUT_SCHEMA)


def live_secondary_batch(
    wave: DataFrame,
    politeness: DataFrame | None,
    politeness_bytes: int | None = None,
) -> DataFrame:
    """Prepare a secondary-hop wave for LIVE fetching: per-host delay join
    + hash-repartition by host so exactly ONE worker owns each host's
    secondary requests — the same invariant as the main fetch stage
    (rounds.py live pop path). Without it, a wave's rows for one host land
    on k workers that each honor crawl-delay independently = k× the
    allowed rate. Robots are deliberately NOT applied: secondary URLs are
    connector-configured enrichment endpoints fetched unconditionally by
    the reference (gallica.js:83-148), like image assets — they are never
    frontier candidates."""
    from crawler_spark.functions.canonicalize import url_host

    # canonical host key (parse_url HOST, lowercased, port/userinfo
    # stripped) — a raw authority regexp disagreed with the politeness
    # table's host for ported/uppercased URLs, missing the delay join and
    # hammering the host with no delay
    batch = wave.withColumn("host", url_host(F.col("url"))).withColumn(
        "kind", F.lit("secondary")
    )
    if politeness is not None:
        delays = politeness.select(
            F.col("host").alias("__d_host"), F.col("crawl_delay_ms")
        )
        # same gate as the main stage (apply_robots/pop_batch): user
        # politeness broadcasts, a live-robots table past the caller's
        # driver-known byte bound does not
        from crawler_spark.operators.politeness import BROADCAST_MAX_BYTES

        if politeness_bytes is None or politeness_bytes <= BROADCAST_MAX_BYTES:
            delays = F.broadcast(delays)
        batch = (
            batch.join(
                delays,
                batch["host"] == F.col("__d_host"),
                "left",
            )
            .drop("__d_host")
            .withColumn(
                "crawl_delay_ms",
                F.coalesce(F.col("crawl_delay_ms"), F.lit(0)),
            )
        )
    # hash-partition by host (not salted): a host's wave is one partition,
    # so the in-worker delay bounds its aggregate request rate; ordering
    # within the host is irrelevant for enrichment fetches
    return batch.repartition(F.col("host")).sortWithinPartitions(
        "host", "url"
    )


def enrich_secondaries(
    rec_rows: DataFrame,
    details_cid: DataFrame,
    pages: DataFrame | None,
    connectors: dict[str, ConnectorConfig],
    fetch_mode: str = "fixture",
    timeout_s: float = 60.0,
    politeness: DataFrame | None = None,
    user_agent: str = "crawler-spark/0.1",
    batch_bound: int | None = None,
    politeness_bytes: int | None = None,
) -> DataFrame:
    """Full per-round enrichment: seed hop-0 from parent fields, fetch-join
    + parse each hop, merge chains back into the records. Returns
    ``(rec_rows, hop_caches)``: rec_rows (RECORD_OUT_SCHEMA) with
    fields/text/images enriched, and the per-hop persisted frames for the
    caller to unpersist once the round's outputs materialize."""
    hops = chain_len(connectors)
    if hops == 0:
        return rec_rows, []
    # only connectors that CONFIGURE a chain go through the Arrow merge;
    # every other connector's records pass through untouched — without the
    # split, one chained connector out of N would drag ALL records through
    # a per-round Python round-trip whose chain is always null
    chain_cids = [
        cid
        for cid, c in (connectors or {}).items()
        if getattr(c, "secondary_fetches", ())
    ]
    rec_cid = rec_rows.join(details_cid, "url")
    passthrough = rec_cid.where(
        ~F.col("connector_id").isin(chain_cids)
    ).select(*RECORD_OUT_COLS)
    # the chained records feed THREE lineage branches (hop-0 wave, each
    # later hop's wave transitively, and the final merge input) — persist
    # once or the extraction mapInPandas re-executes per branch
    rec_rows_cid = rec_cid.where(
        F.col("connector_id").isin(chain_cids)
    ).persist()
    caches: list[DataFrame] = [rec_rows_cid]
    wave = seed_wave(rec_rows_cid, connectors)
    parsed_hops: list[DataFrame] = []
    for hop in range(hops):
        if fetch_mode == "live":
            fetched = live_fetch(
                live_secondary_batch(
                    wave, politeness, politeness_bytes=politeness_bytes
                ),
                timeout_s=timeout_s,
                user_agent=user_agent,
                connectors=connectors,
            )
        else:
            # batch_bound (driver-known: the round's detail count bounds
            # every hop's wave) keeps the pages-side semi-filter broadcast
            # — without it the hint is dropped and the huge pages scan can
            # plan as a sort-merge join per hop
            fetched = fixture_fetch(wave, pages, batch_bound=batch_bound)
        parsed = parse_hop(fetched, connectors, hop).persist()
        parsed_hops.append(parsed)
        caches.append(parsed)
        wave = parsed.where(F.col("next_url").isNotNull()).select(
            "parent_url", "connector_id", F.col("next_url").alias("url")
        )
    sec_all = parsed_hops[0]
    for p in parsed_hops[1:]:
        # hops share parse_hop's static output schema — positional union
        # avoids unionByName's eager re-analysis of both children
        sec_all = sec_all.union(p)
    # both sides are RECORD_OUT_SCHEMA-ordered (merge's mapInPandas schema
    # == rec_rows' extractor schema; drop() preserved the left order)
    out = merge_into_records(rec_rows_cid, sec_all).union(passthrough)
    return out, caches
