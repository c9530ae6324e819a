"""Pure-Python sequential replay of the reference crawl semantics.

Implements the exact control flow of silknow/crawler ``base.js:67-113``
(pagination arithmetic), ``base.js:164-167`` (skip-if-seen), and the
per-connector related-record ordering:

* ``after_parent_write`` — parent record written, then its related records
  depth-first, one level deep (met-museum.js:241-253, risd-museum.js:258-267);
* ``before_parent_write`` — related records written *before* the parent
  (joconde.js:180-200);
* ``none`` — related links ignored.

No Spark — this is the independent ordering/seen/extraction oracle the
engine's output is compared against (SURVEY.md §5.2). It shares only the
deterministic HTML extraction functions with the engine (the golden *text*
bytes come from the generator, not from any parser, so text parity stays a
real check).

The write-order tuple assigned here, ``(connector_id, seed_idx, page_no,
in_page_idx, dfs_rank)``, is the engine's parity sort key: sorting engine
output by it must reproduce this replay's sequential write order exactly.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field

from crawler_spark.operators.extract import (
    SYNTH,
    ConnectorConfig,
    extract_detail,
    extract_search,
    merge_secondaries,
    run_secondary_chain,
)


@dataclass
class OracleResult:
    # write order: list of dicts with url + ordering tuple
    written: list[dict] = field(default_factory=list)
    url_seen: set[str] = field(default_factory=set)
    webtext: dict[str, str] = field(default_factory=dict)
    records: dict[str, dict] = field(default_factory=dict)
    fetches: list[str] = field(default_factory=list)


def _next_page_url(url: str, page: int, seed: dict) -> str:
    """URL for page ordinal ``page``: page-style rewrites ``page=N``;
    offset-style rewrites ``offset=(N - start_page)*limit``
    (met-museum offset+perPage paging, base.js:79-87); path-style rewrites
    the ``page:N`` PATH segment (venetian.js:27-29)."""
    import re

    if seed.get("paging_style") == "offset":
        off = (page - seed["start_page"]) * seed["limit"]
        return re.sub(r"offset=\d+", f"offset={off}", url)
    if seed.get("paging_style") == "path":
        return re.sub(r"page:\d+", f"page:{page}", url)
    return re.sub(r"page=\d+", f"page={page}", url)


def replay(
    pages: dict[str, bytes],
    seeds: list[dict],
    cfg: ConnectorConfig | dict[str, ConnectorConfig] = SYNTH,
) -> OracleResult:
    """Replay the sequential crawl over fixture ``pages`` (url → html bytes).

    ``seeds`` rows: connector_id, seed_idx, url, paging_style, limit,
    start_page, max_offset, related_policy — sorted (connector, seed_idx)
    exactly like the reference's one-museum-at-a-time, seed-rotation order.
    ``cfg`` may be a per-connector map (json/latin1 connectors differ).
    """
    cfg_map = cfg if isinstance(cfg, dict) else None
    default_cfg = cfg if not isinstance(cfg, dict) else SYNTH

    def cfg_for(connector_id: str) -> ConnectorConfig:
        if cfg_map is not None:
            return cfg_map.get(connector_id, default_cfg)
        return default_cfg

    res = OracleResult()

    def visit_record(
        url: str,
        connector_id: str,
        seed_idx: int,
        page_no: int,
        in_page_idx: int,
        dfs_rank: int,
        policy: str,
        is_related: bool,
    ) -> None:
        # recordExists skip (base.js:164-167)
        if url in res.url_seen:
            return
        body = pages.get(url)
        res.fetches.append(url)
        if body is None:
            return  # fetch error: log-and-continue (per-record try/catch)
        rec = extract_detail(body, url, cfg_for(connector_id))
        res.url_seen.add(url)
        ccfg = cfg_for(connector_id)
        if ccfg.secondary_fetches:
            # typed secondary fetches enrich the record before any write
            # (gallica.js:83-148: notice → book chain, fields merged under
            # a `<kind>.` prefix)
            def _fetch(u: str) -> bytes | None:
                res.fetches.append(u)
                return pages.get(u)

            merge_secondaries(
                rec, run_secondary_chain(rec, url, _fetch, ccfg)
            )
        related = rec["related"] if (not is_related and policy != "none") else []

        def write_parent(rank: int) -> None:
            if not rec.get("keep", True):
                # content filter (risd-museum.js:77-87 silk filter): the
                # page was visited (url_seen above) but the record is NOT
                # written — mirrors the engine's records_out/webtext_out
                # `.where(keep)` filters
                return
            res.written.append(
                {
                    "url": url,
                    "connector_id": connector_id,
                    "seed_idx": seed_idx,
                    "page_no": page_no,
                    "in_page_idx": in_page_idx,
                    "dfs_rank": rank,
                }
            )
            res.webtext[url] = rec["text"]
            res.records[url] = rec

        if policy == "before_parent_write" and not is_related:
            for j, ru in enumerate(related):
                visit_record(
                    ru, connector_id, seed_idx, page_no, in_page_idx, j,
                    policy, True,
                )
            write_parent(len(related))
        else:
            write_parent(dfs_rank)
            for j, ru in enumerate(related):
                visit_record(
                    ru, connector_id, seed_idx, page_no, in_page_idx,
                    dfs_rank + 1 + j, policy, True,
                )

    for seed in sorted(seeds, key=lambda s: (s["connector_id"], s["seed_idx"])):
        page = seed["start_page"]
        total_pages: int | None = None
        while True:
            surl = _next_page_url(seed["url"], page, seed)
            body = pages.get(surl)
            res.fetches.append(surl)
            if body is None:
                break
            total, urls = extract_search(body, surl, cfg_for(seed["connector_id"]))
            if (
                seed["paging_style"] in ("page", "offset", "path")
                and total is not None
            ):
                total_pages = math.ceil(total / seed["limit"])
            for idx, u in enumerate(urls):
                visit_record(
                    u,
                    seed["connector_id"],
                    seed["seed_idx"],
                    page,
                    idx,
                    0,
                    seed["related_policy"],
                    False,
                )
            page += 1
            if seed["paging_style"] in ("page", "offset", "path"):
                if total_pages is None or page >= seed["start_page"] + total_pages:
                    break
            elif seed["paging_style"] == "short_page":
                # mfa-boston.js:53-60: a short (or empty) page ends this
                # seed's chain; the next seed follows in rotation order
                if len(urls) < seed["limit"]:
                    break
            else:  # unknown_total: loop until empty page (artic.js:59-78)
                if not urls:
                    break
                if (
                    seed.get("max_offset") is not None
                    and (page - seed["start_page"]) * seed["limit"]
                    >= seed["max_offset"]
                ):
                    break  # europeana.js:70-73 result cap
    return res
