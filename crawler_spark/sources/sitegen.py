"""Deterministic synthetic crawl corpus (FIXTURES.md §1-3, §5).

Generates the ``pages`` / ``seeds`` / ``politeness`` tables for a synthetic
multi-host site graph standing in for the museum endpoints / Common-Crawl
pages. Pure function of ``seed`` (random.Random — no wall clock, no network),
so reruns are byte-stable.

Per host: search pages (``/search?page=p``, 1-based) listing detail links in
document order with a result-count element; detail pages with label/value
field rows (one value containing ``<br>``, leading/trailing whitespace to
exercise trim — mtmad.js:153-163), 0-3 ``<img>`` tags with an occasional
duplicate URL (record.js:47-50), and 0-2 related-record links (met/risd/
joconde DFS, met-museum.js:215-253). The ``text`` column carries the golden
extracted text composed directly from the raw values (never via the HTML
parser) — the byte-identity target for the extraction UDF.
"""

from __future__ import annotations

import html as _html
import math
import random
from dataclasses import dataclass, field

import pandas as pd

WORDS = (
    "silk velvet damask brocade satin taffeta lampas weave warp weft thread "
    "gold silver dye crimson indigo pattern floral motif border fragment "
    "panel chasuble textile loom jacquard embroidery ribbon lace cord"
).split()

POLICIES = ("after_parent_write", "before_parent_write", "none")


@dataclass
class SiteSpec:
    n_hosts: int = 2
    details_per_host: int = 30
    limit: int = 10  # page size (reference range 5-100)
    related_per_host: int = 6
    hot_host: int | None = None  # host idx owning ~50% of URLs
    hot_factor: int = 8
    unknown_total_hosts: tuple[int, ...] = ()  # artic/europeana-style hosts
    seed: int = 42
    start_page: int = 1
    budget_per_round: int = 10
    crawl_delay_ms: int = 0
    disallow: dict[int, list[str]] = field(default_factory=dict)


def _host(h: int) -> str:
    return f"h{h}.example.test"


def _base(h: int) -> str:
    return f"http://{_host(h)}"


def _detail_fields(rng: random.Random, host_i: int, rec_id: str):
    """Deterministic (label, raw_value, rendered_html_value) triples.

    rendered value may contain <br> and padding whitespace; the *expected*
    extracted value (post br→\\n, post trim) is returned alongside.
    """
    title = f"Record {host_i}-{rec_id}"
    rows = []  # (label, html_value, expected_value)
    mat = " ".join(rng.sample(WORDS, rng.randint(1, 3)))
    rows.append(("Material", _html.escape(mat), mat))
    if rng.random() < 0.4:  # repeated label → addField merge (record.js:22-37)
        mat2 = " ".join(rng.sample(WORDS, 2))
        rows.append(("Material", _html.escape(mat2), mat2))
    d1 = " ".join(rng.sample(WORDS, 4))
    d2 = " ".join(rng.sample(WORDS, 3))
    # <br> inside value + padding whitespace (les-arts-decoratifs.js:122)
    rows.append(
        ("Description", f"  {_html.escape(d1)}<br>{_html.escape(d2)} ", f"{d1}\n{d2}")
    )
    dim = f"{rng.randint(5, 300)} x {rng.randint(5, 300)} cm"
    rows.append(("Dimensions", _html.escape(dim), dim))
    if rng.random() < 0.15:  # empty value → dropped by P1 filter
        rows.append(("Empty", "   ", None))
    return title, rows


def _render_detail(
    rng: random.Random,
    host_i: int,
    base: str,
    rec_id: str,
    related_ids: list[str],
) -> tuple[str, str, list[str]]:
    """→ (html, golden_text, image_urls)."""
    title, rows = _detail_fields(rng, host_i, rec_id)
    field_html = []
    lines = [title]
    for label, html_val, expected in rows:
        field_html.append(
            f'<tr class="field"><td class="label"> {label} </td>'
            f'<td class="value">{html_val}</td></tr>'
        )
        if expected:
            lines.append(f"{label}\t{expected}")
    n_img = rng.randint(0, 3)
    img_urls = [f"{base}/img/{rec_id}_{k}.jpg" for k in range(n_img)]
    img_tags = [f'<img src="/img/{rec_id}_{k}.jpg">' for k in range(n_img)]
    if n_img and rng.random() < 0.3:  # duplicate url → per-record dedup (U2)
        img_tags.append(f'<img src="/img/{rec_id}_0.jpg">')
    rel_tags = [f'<a href="/record/{r}">related {r}</a>' for r in related_ids]
    html_doc = (
        "<html><body>"
        f'<h1 class="title">  {_html.escape(title)} </h1>'
        f'<table class="fields">{"".join(field_html)}</table>'
        f'<div class="images">{"".join(img_tags)}</div>'
        f'<div class="related">{"".join(rel_tags)}</div>'
        "</body></html>"
    )
    return html_doc, "\n".join(lines), img_urls


def _render_search(count_known: int | None, links: list[str]) -> str:
    count_el = (
        f'<div id="count">{count_known} results</div>' if count_known is not None else ""
    )
    lis = "".join(
        f'<li class="result"><a href="{u}">item</a></li>' for u in links
    )
    return f'<html><body>{count_el}<ul class="results">{lis}</ul></body></html>'


def generate_site(spec: SiteSpec):
    """→ dict of pandas DataFrames: pages, seeds, politeness.

    pages: url, warc_ts, html (bytes), text, lang — input_hint shape.
    """
    rng = random.Random(spec.seed)
    pages_rows = []
    seeds_rows = []
    pol_rows = []
    langs = ["en", "fr", "es", "it", "ca"]
    ts0 = pd.Timestamp("2026-01-01 00:00:00")
    row_i = 0

    def emit(url: str, html_doc: str, text: str):
        nonlocal row_i
        pages_rows.append(
            {
                "url": url,
                "warc_ts": ts0 + pd.Timedelta(seconds=row_i),
                "html": html_doc.encode("utf-8"),
                "text": text,
                "lang": langs[row_i % len(langs)],
            }
        )
        row_i += 1

    for h in range(spec.n_hosts):
        base = _base(h)
        n_details = spec.details_per_host
        if spec.hot_host is not None and h == spec.hot_host:
            n_details *= spec.hot_factor
        detail_ids = [str(i) for i in range(1, n_details + 1)]
        related_ids = [f"r{j}" for j in range(1, spec.related_per_host + 1)]
        unknown = h in spec.unknown_total_hosts

        # related/detail pages
        for rid in detail_ids:
            rel = (
                rng.sample(related_ids, rng.randint(1, 2))
                if related_ids and rng.random() < 0.3
                else []
            )
            html_doc, text, _ = _render_detail(rng, h, base, rid, rel)
            emit(f"{base}/record/{rid}", html_doc, text)
        for rid in related_ids:
            # related pages carry related links too — must NOT be expanded
            # (one-level DFS, met-museum.js:245)
            rel = [f"r{(int(rid[1:]) % spec.related_per_host) + 1}"]
            html_doc, text, _ = _render_detail(rng, h, base, rid, rel)
            emit(f"{base}/record/{rid}", html_doc, text)

        # search pages
        total_pages = math.ceil(n_details / spec.limit)
        for p in range(1, total_pages + 1):
            chunk = detail_ids[(p - 1) * spec.limit : p * spec.limit]
            links = [f"/record/{rid}" for rid in chunk]
            emit(
                f"{base}/search?page={p}",
                _render_search(None if unknown else n_details, links),
                "",
            )
        if unknown:  # terminal empty page for loop-until-empty (artic.js:59-78)
            emit(
                f"{base}/search?page={total_pages + 1}",
                _render_search(None, []),
                "",
            )

        seeds_rows.append(
            {
                "connector_id": f"c{h}",
                "seed_idx": 0,
                "url": f"{base}/search?page={spec.start_page}",
                "paging_style": "unknown_total" if unknown else "page",
                "limit": spec.limit,
                "start_page": spec.start_page,
                "max_offset": None,
                "related_policy": POLICIES[h % len(POLICIES)],
            }
        )
        pol_rows.append(
            {
                "host": _host(h),
                "crawl_delay_ms": spec.crawl_delay_ms,
                "budget_per_round": spec.budget_per_round,
                "disallow": spec.disallow.get(h, []),
            }
        )

    return {
        "pages": pd.DataFrame(pages_rows),
        "seeds": pd.DataFrame(seeds_rows),
        "politeness": pd.DataFrame(pol_rows),
    }


def site_to_spark(spark, site: dict):
    """pandas site dict → dict of Spark DataFrames with engine schemas."""
    from crawler_spark import schemas

    return {
        "pages": spark.createDataFrame(site["pages"], schema=schemas.PAGES),
        "seeds": spark.createDataFrame(site["seeds"], schema=schemas.SEEDS),
        "politeness": spark.createDataFrame(
            site["politeness"], schema=schemas.POLITENESS
        ),
    }
