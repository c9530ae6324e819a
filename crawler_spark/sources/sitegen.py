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
import json
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
    offset_hosts: tuple[int, ...] = ()  # offset+perPage paging (met-museum.js:30)
    # page ordinal in the URL PATH (`/page:N`), count from labeled text
    # "Schede trovate: N" via count_regex (venetian.js:27-39)
    path_hosts: tuple[int, ...] = ()
    # no count element; page=N chains only while pages come back FULL
    # (mfa-boston.js:53-60 next-seed-on-short-page)
    short_page_hosts: tuple[int, ...] = ()
    # count rendered "(1,234)" parsed via count_regex (smithsonian.js:19-26)
    paren_count_hosts: tuple[int, ...] = ()
    # values split on newlines into one value per line (louvre.js:143-148)
    multiline_hosts: tuple[int, ...] = ()
    # record id = extracted "Inventory" field value, not the URL segment
    # (versailles.js:128 "Nº d'inventaire:")
    id_label_hosts: tuple[int, ...] = ()
    json_hosts: tuple[int, ...] = ()  # S3 JSON-API connectors (vam.js shape)
    msearch_hosts: tuple[int, ...] = ()  # S4 ES _msearch (joconde.js shape)
    graphql_hosts: tuple[int, ...] = ()  # S5 GraphQL (paris-musees.js shape)
    secondary_hosts: tuple[int, ...] = ()  # gallica notice→book chains
    # only page-1-listed details carry related links: related expansion
    # still crosses a round boundary (page-1 details fetched round r →
    # relateds fetched r+1) but page-2 details add no third wave — keeps
    # fixed-cost correctness crawls at their 3-round minimum
    related_first_page_only: bool = False
    latin1_hosts: tuple[int, ...] = ()  # latin1 bodies (ceres-mcu.js:121)
    seeds_per_host: int = 1  # U1 seed-list rotation (vam.js:10-14,38-46)
    seed: int = 42
    start_page: int = 1
    budget_per_round: int = 10
    crawl_delay_ms: int = 0
    disallow: dict[int, list[str]] = field(default_factory=dict)


def _host(h: int) -> str:
    return f"h{h}.example.test"


def _base(h: int) -> str:
    return f"http://{_host(h)}"


# latin-1-representable accents for the latin1-host fixture
_ACCENT_WORDS = ("sedería", "müster", "façonné", "doré")


def _detail_fields(rng: random.Random, host_i: int, rec_id: str, accents: bool = False):
    """Deterministic (label, raw_value, rendered_html_value) triples.

    rendered value may contain <br> and padding whitespace; the *expected*
    extracted value (post br→\\n, post trim) is returned alongside.
    """
    title = f"Record {host_i}-{rec_id}"
    rows = []  # (label, html_value, expected_value)
    mat = " ".join(rng.sample(WORDS, rng.randint(1, 3)))
    if accents:  # non-ASCII value on the latin1 host (ceres-mcu.js:121)
        mat = f"{mat} {rng.choice(_ACCENT_WORDS)}"
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
    accents: bool = False,
    extra_rows: list | None = None,
    split_multiline: bool = False,
) -> tuple[str, str, list[str]]:
    """→ (html, golden_text, image_urls). ``extra_rows`` appends additional
    (label, html_value, expected_value) field rows (e.g. the gallica-style
    ``Notice`` URL field that seeds the secondary chain).
    ``split_multiline`` composes the golden text the way a
    split_multiline_values connector extracts it (louvre.js:143-148):
    one (label, value) line per non-empty line of the value."""
    title, rows = _detail_fields(rng, host_i, rec_id, accents)
    if extra_rows:
        rows = rows + list(extra_rows)
    field_html = []
    lines = [title]
    for label, html_val, expected in rows:
        field_html.append(
            f'<tr class="field"><td class="label"> {label} </td>'
            f'<td class="value">{html_val}</td></tr>'
        )
        if expected:
            parts = expected.split("\n") if split_multiline else [expected]
            for part in parts:
                lines.append(f"{label}\t{part}")
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


def _render_detail_json(
    rng: random.Random,
    host_i: int,
    base: str,
    rec_id: str,
    related_ids: list[str],
) -> tuple[str, str, list[str]]:
    """S3 JSON detail body (vam.js:72-133 shape) → (json, golden_text,
    image_urls). Exercises P1 (null/''/[] dropped), P3 (non-scalar dropped),
    number-verbatim copy, array values, and repeated-label merge."""
    title, rows = _detail_fields(rng, host_i, rec_id)
    fields: list[dict] = []
    lines = [title]
    for label, _html_val, expected in rows:
        if expected is None:
            fields.append({"label": label, "value": ""})  # P1: dropped
            continue
        vals = expected.split("\n")  # the <br> value becomes a JSON array
        if len(vals) > 1:
            fields.append({"label": label, "values": vals})
        else:
            fields.append({"label": label, "value": vals[0]})
        for v in vals:
            lines.append(f"{label}\t{v}")
    year = 1700 + rng.randint(0, 300)
    fields.append({"label": "Year", "value": year})  # number verbatim
    lines.append(f"Year\t{year}")
    fields.append({"label": "Raw", "value": {"nested": True}})  # P3: dropped
    fields.append({"label": "Nil", "values": []})  # P1: dropped
    n_img = rng.randint(0, 3)
    img_urls = [f"{base}/img/{rec_id}_{k}.jpg" for k in range(n_img)]
    imgs = [f"/img/{rec_id}_{k}.jpg" for k in range(n_img)]
    if n_img and rng.random() < 0.3:
        imgs.append(f"/img/{rec_id}_0.jpg")  # duplicate url → U2 dedup
    body = json.dumps(
        {
            "title": f"  {title} ",
            "fields": fields,
            "images": imgs,
            "related": [f"/record/{r}" for r in related_ids],
        }
    )
    return body, "\n".join(lines), img_urls


def _render_detail_msearch(
    rng: random.Random, base: str, ref: str, related_refs: list[str]
) -> tuple[str, str, list[str]]:
    """S4 single-hit ``_msearch`` response (joconde.js downloadRelatedRecord
    shape, :91-126) → (json, golden_text, image_urls).

    Golden text mirrors the reference's addField walk over ``_source``
    (joconde.js:145-156): every scalar key is a field (REF included), arrays
    of scalars element-wise, objects dropped; title line = REF.
    """
    tech = " ".join(rng.sample(WORDS, rng.randint(1, 3)))
    mesr = f"{rng.randint(5, 300)} x {rng.randint(5, 300)} cm"
    n_img = rng.randint(0, 2)
    imgs = [f"/img/{ref}_{k}.jpg" for k in range(n_img)]
    src: dict = {"REF": ref, "DOMN": "textile", "TECH": tech, "MESR": mesr}
    if related_refs:
        src["HIST"] = "acquis " + " ; voir ".join(related_refs)
    src["POP_COORDONNEES"] = {"lat": 48.85, "lon": 2.35}  # object → P3 drop
    src["IMG"] = imgs
    body = json.dumps(
        {"responses": [{"hits": {"total": 1, "hits": [{"_source": src}]}}]}
    )
    lines = [ref, f"REF\t{ref}", "DOMN\ttextile", f"TECH\t{tech}",
             f"MESR\t{mesr}"]
    if related_refs:
        lines.append(f"HIST\t{src['HIST']}")
    lines.extend(f"IMG\t{u}" for u in imgs)
    img_urls = [f"{base}{u}" for u in imgs]
    return body, "\n".join(lines), img_urls


def _render_search_msearch(count_known: int, refs: list[str]) -> str:
    """S4 search response: ``responses[0].hits`` with total + one
    ``_source`` per hit (joconde.js:57-60,78-79)."""
    return json.dumps(
        {
            "responses": [
                {
                    "hits": {
                        "total": count_known,
                        "hits": [{"_source": {"REF": r}} for r in refs],
                    }
                }
            ]
        }
    )


def _graphql_entity(
    rng: random.Random, base: str, rec_id: str, related: list[str]
) -> tuple[dict, str, list[str]]:
    """S5 entity (paris-musees.js:204-520 selection-set shape) →
    (entity_dict, golden_text, image_urls). Golden text mirrors
    flattenObject + addField over the entity minus fieldVisuels."""
    title = f"Oeuvre {rec_id}"
    mat = " ".join(rng.sample(WORDS, 2))
    deno = rng.choice(WORDS)
    n_img = rng.randint(0, 2)
    ent: dict = {
        "entityId": int(rec_id),
        "title": title,
        "absolutePath": f"{base}/oeuvre/{rec_id}",
        "fieldMateriauxTechnique": {"entity": {"name": mat}},
        "fieldDenominations": {"entity": {"name": deno}},
        "fieldVisuels": [
            {
                "entity": {
                    "entityId": f"v{rec_id}{k}",
                    "vignette": f"/img/{rec_id}_{k}.jpg",
                    "name": f"View {k}",
                    "fieldLegende": f"legende {rec_id}",
                    "fieldCopyright": "Musee Test",
                    "fieldImageDroits": "CC0",
                }
            }
            for k in range(n_img)
        ],
        "related": [f"/oeuvre/{r}" for r in related],
    }
    lines = [
        title,
        f"entityId\t{int(rec_id)!r}",
        f"title\t{title}",
        f"absolutePath\t{base}/oeuvre/{rec_id}",
        f"fieldMateriauxTechnique.entity.name\t{mat}",
        f"fieldDenominations.entity.name\t{deno}",
    ]
    lines.extend(f"related\t/oeuvre/{r}" for r in related)
    img_urls = [f"{base}/img/{rec_id}_{k}.jpg" for k in range(n_img)]
    return ent, "\n".join(lines), img_urls


def _render_search_graphql(
    count_known: int, entities: list[dict | None]
) -> str:
    """S5 search response: ``data.nodeQuery`` with count + entities
    (nulls included — the P5 filter target, paris-musees.js:102-107)."""
    return json.dumps(
        {"data": {"nodeQuery": {"count": count_known, "entities": entities}}}
    )


def _render_notice_page(
    rows: list[tuple[str, list[str] | str]],
    img_src: str | None,
    book_href: str | None,
) -> str:
    """Gallica-shaped secondary page: ``div.notice`` rows of
    ``span.notice-label`` + sibling value span (plain text or links, with a
    ``.pictos`` decoration the extractor must skip — gallica.js:92-103), an
    optional ``img.grand``, and an optional next-hop link."""
    parts = []
    for label, val in rows:
        if isinstance(val, list):
            links = "".join(f'<a href="/x{j}">{_html.escape(v)}</a>' for j, v in enumerate(val))
            span = f'<span>{links}<a class="pictos" href="#">+</a></span>'
        else:
            span = f"<span> {_html.escape(val)} </span>"
        parts.append(
            f'<div class="notice"><span class="notice-label">{_html.escape(label)}'
            f"</span>{span}</div>"
        )
    img = f'<img class="grand" src="{img_src}">' if img_src else ""
    book = (
        f'<div class="appartient"><a href="{book_href}">appartient</a></div>'
        if book_href
        else ""
    )
    return f"<html><body>{''.join(parts)}{img}{book}</body></html>"


def _gen_secondary(
    rng: random.Random, base: str, rec_id: str, n_books: int
) -> tuple[list, list[str], list[tuple[str, str]]]:
    """Per-record gallica-style chain fixtures → (extra detail field rows,
    golden merged lines, [(url, html)] secondary pages to emit). Golden
    lines are composed from the raw values (never via the parser), in the
    exact merge order: ``Notice`` parent field, ``notice.url``, notice
    fields, then ``book.url`` + book fields when the notice links a book
    (gallica.js:83-148)."""
    notice_url = f"{base}/notice/{rec_id}"
    prov = " ".join(rng.sample(WORDS, 2))
    auteurs = [w.capitalize() for w in rng.sample(WORDS, rng.randint(1, 2))]
    rows: list[tuple[str, list[str] | str]] = [
        ("Provenance", prov),
        ("Auteurs", auteurs),
    ]
    if rng.random() < 0.3:  # empty value → dropped (record.js:14-21)
        rows.append(("Vide", ""))
    # image: usually a fresh vignette; sometimes the record's own image,
    # which the startswith guard must skip (gallica.js:108-114)
    own_image = rng.random() < 0.3
    img_src = (
        f"/record/{rec_id}/zoom.jpg" if own_image else f"/vignette/{rec_id}.jpg"
    )
    has_book = rng.random() < 0.6
    book_k = rng.randrange(n_books) if has_book else 0
    book_href = f"/book/b{book_k}" if has_book else None
    # the parent's own ``Notice\turl`` line comes from extra_rows via
    # _render_detail; these are the post-merge additions only
    lines = [
        f"notice.url\t{notice_url}",
        f"notice.Provenance\t{prov}",
    ]
    lines.extend(f"notice.Auteurs\t{a}" for a in auteurs)
    if has_book:
        book_url = f"{base}/book/b{book_k}"
        lines.append(f"book.url\t{book_url}")
        lines.extend(_book_lines(book_k))
    pages = [
        (notice_url, _render_notice_page(rows, img_src, book_href)),
    ]
    extra_rows = [("Notice", notice_url, notice_url)]
    return extra_rows, lines, pages


def _book_lines(k: int) -> list[str]:
    return [f"book.Titre\tRecueil {k}", "book.Siecle\tXVIII"]


def _render_book_page(k: int) -> str:
    return _render_notice_page(
        [("Titre", f"Recueil {k}"), ("Siecle", "XVIII")],
        f"/bookimg/{k}.jpg",
        None,
    )


def _render_search_json(count_known: int | None, links: list[str]) -> str:
    return json.dumps(
        {
            "total": count_known,
            "records": [{"url": u} for u in links],
        }
    )


def _render_search(
    count_known: int | None, links: list[str], count_style: str = "plain"
) -> str:
    """``count_style``: "plain" = "N results"; "paren" = "(1,234)"
    (smithsonian.js:19-26); "label" = "Schede trovate: N"
    (venetian.js:31-39). The decorated styles are unparsable by the
    default first-token rule — they require the connector's count_regex."""
    if count_known is None:
        count_el = ""
    elif count_style == "paren":
        count_el = f'<div id="count">({count_known:,})</div>'
    elif count_style == "label":
        count_el = f'<div id="count">Schede trovate: {count_known}</div>'
    else:
        count_el = f'<div id="count">{count_known} results</div>'
    lis = "".join(
        f'<li class="result"><a href="{u}">item</a></li>' for u in links
    )
    return f'<html><body>{count_el}<ul class="results">{lis}</ul></body></html>'


def generate_site(spec: SiteSpec):
    """→ dict: pandas DataFrames pages/seeds/politeness + ``connectors``
    (connector_id → ConnectorConfig for the engine's extractor closures).

    pages: url, warc_ts, html (bytes), text, lang — input_hint shape.
    JSON hosts serve S3 JSON bodies; latin1 hosts encode bodies as
    ISO-8859-1 (ceres-mcu.js:121); ``seeds_per_host > 1`` splits a host's
    corpus across seed URLs to exercise the U1 rotation order.
    """
    from crawler_spark.operators.extract import (
        ConnectorConfig,
        SecondaryFetch,
    )

    rng = random.Random(spec.seed)
    pages_rows = []
    seeds_rows = []
    pol_rows = []
    connectors: dict[str, ConnectorConfig] = {}
    langs = ["en", "fr", "es", "it", "ca"]
    ts0 = pd.Timestamp("2026-01-01 00:00:00")
    row_i = 0

    def emit(url: str, html_doc: str, text: str, encoding: str = "utf-8"):
        nonlocal row_i
        pages_rows.append(
            {
                "url": url,
                "warc_ts": ts0 + pd.Timedelta(seconds=row_i),
                "html": html_doc.encode(encoding),
                "text": text,
                "lang": langs[row_i % len(langs)],
            }
        )
        row_i += 1

    for h in range(spec.n_hosts):
        base = _base(h)

        # ---- S4/S5 POST-style hosts (offset paging, JSON record payloads)
        if h in spec.msearch_hosts or h in spec.graphql_hosts:
            is_msearch = h in spec.msearch_hosts
            n_details = spec.details_per_host
            # related ids start past BOTH the historical base and the
            # detail range: with details_per_host >= 91 (msearch) / 901
            # (graphql) the fixed bases collided with detail refs,
            # emitting the same /notice/ URL twice with different bodies
            # (a duplicate-row pages table → nondeterministic parity)
            if is_msearch:
                rel_base = max(90, n_details)
                refs = [f"7.{h}.{i}" for i in range(1, n_details + 1)]
                rel_refs = [
                    f"7.{h}.{rel_base + j}"
                    for j in range(1, spec.related_per_host + 1)
                ]
            else:
                rel_base = max(900, n_details)
                refs = [str(i) for i in range(1, n_details + 1)]
                rel_refs = [
                    str(rel_base + j)
                    for j in range(1, spec.related_per_host + 1)
                ]
            for rid in refs + rel_refs:
                # under related_first_page_only the related→related edge is
                # also cut (a related fetched in wave 2 must not discover a
                # wave-3 URL)
                rel_eligible = not spec.related_first_page_only or (
                    rid in refs and refs.index(rid) < spec.limit
                )
                rel_of_rel = (
                    [rel_refs[0]]
                    if rid in rel_refs and rel_refs
                    and not spec.related_first_page_only
                    else []
                )
                rel = (
                    rng.sample(rel_refs, rng.randint(1, 2))
                    if rel_refs and rid in refs and rel_eligible
                    and rng.random() < 0.3
                    else rel_of_rel
                )
                if is_msearch:
                    body, text, _ = _render_detail_msearch(rng, base, rid, rel)
                    emit(f"{base}/notice/{rid}", body, text)
                else:
                    ent, text, _ = _graphql_entity(rng, base, rid, rel)
                    emit(f"{base}/oeuvre/{rid}", json.dumps(ent), text)
            total_pages = math.ceil(len(refs) / spec.limit) or 1
            for p in range(total_pages):
                chunk = refs[p * spec.limit : (p + 1) * spec.limit]
                if is_msearch:
                    body = _render_search_msearch(len(refs), chunk)
                    emit(f"{base}/search?offset={p * spec.limit}", body, "")
                else:
                    ents: list = [
                        {"entityId": int(r), "absolutePath": f"/oeuvre/{r}"}
                        for r in chunk
                    ]
                    # null entity injected (P5 — paris-musees.js:102-107)
                    ents.insert(min(1, len(ents)), None)
                    body = _render_search_graphql(len(refs), ents)
                    emit(f"{base}/graphql?offset={p * spec.limit}", body, "")
            path = "/search" if is_msearch else "/graphql"
            seeds_rows.append(
                {
                    "connector_id": f"c{h}",
                    "seed_idx": 0,
                    "url": f"{base}{path}?offset=0",
                    "paging_style": "offset",
                    "limit": spec.limit,
                    "start_page": 0,
                    "max_offset": None,
                    "related_policy": (
                        "before_parent_write" if is_msearch
                        else "after_parent_write"
                    ),
                }
            )
            # live-mode request shape: both kinds POST (joconde.js:44-51
            # NDJSON _msearch; paris-musees.js:65-80 GraphQL JSON). The
            # frontier URL keeps offset= for identity; the template moves it
            # into the body and strip_params removes it from the sent URL.
            if is_msearch:
                live_req = dict(
                    method="POST",
                    content_type="application/x-ndjson",
                    body_template=(
                        '{{"index":"collection"}}\n'
                        '{{"from":{offset},"size":{limit},'
                        '"query":{{"match_all":{{}}}}}}\n'
                    ),
                    detail_body_template=(
                        '{{"index":"collection"}}\n'
                        '{{"query":{{"term":{{"REF":"{id}"}}}}}}\n'
                    ),
                    strip_params=("offset",),
                    body_defaults={"limit": spec.limit},
                )
            else:
                live_req = dict(
                    method="POST",
                    content_type="application/json",
                    body_template=(
                        '{{"query":"nodeQuery(offset: {offset}, '
                        'limit: {limit})"}}'
                    ),
                    detail_body_template='{{"query":"entityById({id})"}}',
                    strip_params=("offset",),
                    body_defaults={"limit": spec.limit},
                )
            connectors[f"c{h}"] = ConnectorConfig(
                connector_id=f"c{h}",
                body_format="es_msearch" if is_msearch else "graphql",
                **live_req,
            )
            pol_rows.append(
                {
                    "host": _host(h),
                    "crawl_delay_ms": spec.crawl_delay_ms,
                    "budget_per_round": spec.budget_per_round,
                    "disallow": spec.disallow.get(h, []),
                }
            )
            continue

        is_json = h in spec.json_hosts
        is_latin1 = h in spec.latin1_hosts
        has_secondary = h in spec.secondary_hosts and not is_json
        n_books = 3
        if has_secondary:
            for k in range(n_books):
                emit(f"{base}/book/b{k}", _render_book_page(k), "")
        encoding = "latin-1" if is_latin1 else "utf-8"
        n_details = spec.details_per_host
        if spec.hot_host is not None and h == spec.hot_host:
            n_details *= spec.hot_factor
        detail_ids = [str(i) for i in range(1, n_details + 1)]
        related_ids = [f"r{j}" for j in range(1, spec.related_per_host + 1)]
        unknown = h in spec.unknown_total_hosts
        is_path = h in spec.path_hosts and not is_json
        is_short = h in spec.short_page_hosts and not is_json
        is_paren = h in spec.paren_count_hosts and not is_json
        is_multiline = h in spec.multiline_hosts and not is_json
        is_idlabel = h in spec.id_label_hosts and not is_json
        count_style = "label" if is_path else ("paren" if is_paren else "plain")

        # related/detail pages
        for rid in detail_ids:
            rel_eligible = (
                not spec.related_first_page_only or int(rid) <= spec.limit
            )
            rel = (
                rng.sample(related_ids, rng.randint(1, 2))
                if rel_eligible and related_ids and rng.random() < 0.3
                else []
            )
            if is_json:
                body, text, _ = _render_detail_json(rng, h, base, rid, rel)
            elif has_secondary:
                extra_rows, sec_lines, sec_pages = _gen_secondary(
                    rng, base, rid, n_books
                )
                body, text, _ = _render_detail(
                    rng, h, base, rid, rel, accents=is_latin1,
                    extra_rows=extra_rows,
                )
                # golden = parent text + the merged chain lines, composed
                # from raw values (never via the parser/merger)
                text = "\n".join([text] + sec_lines)
                for u, ph in sec_pages:
                    emit(u, ph, "", encoding)
            else:
                inv = (
                    [("Inventory", f"INV-{h}-{rid}", f"INV-{h}-{rid}")]
                    if is_idlabel else None
                )
                body, text, _ = _render_detail(
                    rng, h, base, rid, rel, accents=is_latin1,
                    extra_rows=inv, split_multiline=is_multiline,
                )
            emit(f"{base}/record/{rid}", body, text, encoding)
        for rid in related_ids:
            # related pages carry related links too — must NOT be expanded
            # (one-level DFS, met-museum.js:245)
            rel = [f"r{(int(rid[1:]) % spec.related_per_host) + 1}"]
            if is_json:
                body, text, _ = _render_detail_json(rng, h, base, rid, rel)
            else:
                inv = (
                    [("Inventory", f"INV-{h}-{rid}", f"INV-{h}-{rid}")]
                    if is_idlabel else None
                )
                body, text, _ = _render_detail(
                    rng, h, base, rid, rel, accents=is_latin1,
                    extra_rows=inv, split_multiline=is_multiline,
                )
            emit(f"{base}/record/{rid}", body, text, encoding)

        # search pages, split across seeds_per_host seed URL spaces (U1)
        n_seeds = max(1, spec.seeds_per_host)
        is_offset = h in spec.offset_hosts
        start_page = 0 if is_offset else spec.start_page

        def render_search(count, links):
            if is_json:
                return _render_search_json(count, links)
            return _render_search(count, links, count_style)

        def page_url(path: str, p: int) -> str:
            """Search URL for 0-based page ordinal ``p``."""
            if is_path:  # page ordinal in the PATH (venetian.js:27-29)
                return f"{base}{path}/page:{p + spec.start_page}"
            q = (
                f"offset={p * spec.limit}"
                if is_offset
                else f"page={p + spec.start_page}"
            )
            return f"{base}{path}?{q}"

        for s in range(n_seeds):
            seed_ids = detail_ids[s::n_seeds]  # deterministic round-robin
            path = "/search" if n_seeds == 1 else f"/search/s{s}"
            total_pages = math.ceil(len(seed_ids) / spec.limit) or 1
            # short_page hosts publish no count (mfa-boston has none the
            # engine can use); unknown-total hosts likewise
            count = None if (unknown or is_short) else len(seed_ids)
            for p in range(total_pages):
                chunk = seed_ids[p * spec.limit : (p + 1) * spec.limit]
                links = [f"/record/{rid}" for rid in chunk]
                emit(page_url(path, p), render_search(count, links), "", encoding)
            if unknown or (is_short and len(seed_ids) % spec.limit == 0):
                # terminal empty page: unknown-total chains until empty
                # (artic.js:59-78); a short_page host whose last page is
                # exactly full also serves one empty overflow page
                # (mfa-boston.js:53-60 stops only on a SHORT page)
                emit(page_url(path, total_pages), render_search(None, []), "", encoding)
            seeds_rows.append(
                {
                    "connector_id": f"c{h}",
                    "seed_idx": s,
                    "url": page_url(path, 0),
                    "paging_style": (
                        "unknown_total" if unknown
                        else "short_page" if is_short
                        else "path" if is_path
                        else ("offset" if is_offset else "page")
                    ),
                    "limit": spec.limit,
                    "start_page": start_page,
                    "max_offset": None,
                    "related_policy": POLICIES[h % len(POLICIES)],
                }
            )
        sec_chain = ()
        if has_secondary:
            sec_chain = (
                SecondaryFetch(
                    kind="notice", from_field="Notice",
                    row_selector="div.notice",
                    label_selector="span.notice-label",
                    image_selector="img.grand",
                ),
                SecondaryFetch(
                    kind="book", link_selector="div.appartient a",
                    row_selector="div.notice",
                    label_selector="span.notice-label",
                    image_selector="img.grand",
                ),
            )
        connectors[f"c{h}"] = ConnectorConfig(
            connector_id=f"c{h}",
            body_format="json" if is_json else "html",
            encoding=encoding,
            secondary_fetches=sec_chain,
            # decorated result counts need the connector's regex
            # (venetian.js:31-39 label text; smithsonian.js:19-26 parens)
            count_regex=(
                r"Schede trovate: (\d+)" if is_path
                else r"\(([\d,]+)\)" if is_paren
                else None
            ),
            split_multiline_values=is_multiline,  # louvre.js:143-148
            record_id_label="Inventory" if is_idlabel else None,  # versailles.js:128
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
        "connectors": connectors,
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
