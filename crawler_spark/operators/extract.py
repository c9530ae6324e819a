"""HTML → links / records / text extraction (SURVEY.md §2.1 S2, §2.10).

The reference uses cheerio CSS selectors + ``.text()`` per connector
(e.g. les-arts-decoratifs.js:21,67; risd-museum.js:19,75). cheerio's
``.text()`` is the concatenation of all descendant text nodes, verbatim —
no whitespace insertion between elements. Three connectors pre-replace
``<br>`` with ``\\n`` before calling ``.text()``
(les-arts-decoratifs.js:122, met-museum.js:204-208, mtmad.js:168); that is
DOM-level, so it is modelled here as a text()-time option, never a string
replace on serialized HTML.

No lxml/bs4 in the runtime — a small DOM on stdlib ``html.parser`` implements
exactly the semantics above. Spark-facing entry points are Arrow-batched
pandas UDFs (``mapInPandas``): one Arrow batch of pages in, one batch of
links/records out — no per-row Python dispatch.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from html.parser import HTMLParser
from typing import Iterator

import pandas as pd

from crawler_spark.functions.canonicalize import canonicalize_url

_VOID = frozenset(
    "area base br col embed hr img input link meta param source track wbr".split()
)


class Node:
    __slots__ = ("tag", "attrs", "children", "parent")

    def __init__(self, tag: str, attrs: dict[str, str], parent: "Node | None"):
        self.tag = tag
        self.attrs = attrs
        self.children: list[Node | str] = []
        self.parent = parent

    # -- cheerio-compatible text(): concat of descendant text nodes verbatim
    def text(self, br_as_newline: bool = False) -> str:
        out: list[str] = []
        self._text(out, br_as_newline)
        return "".join(out)

    def _text(self, out: list[str], br_nl: bool) -> None:
        for c in self.children:
            if isinstance(c, str):
                out.append(c)
            elif c.tag == "br":
                if br_nl:
                    out.append("\n")
            else:
                c._text(out, br_nl)

    def attr(self, name: str) -> str | None:
        return self.attrs.get(name)

    def iter(self) -> Iterator["Node"]:
        for c in self.children:
            if isinstance(c, Node):
                yield c
                yield from c.iter()


class _TreeBuilder(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.root = Node("#root", {}, None)
        self.cur = self.root

    def handle_starttag(self, tag: str, attrs) -> None:
        node = Node(tag, {k: (v or "") for k, v in attrs}, self.cur)
        self.cur.children.append(node)
        if tag not in _VOID:
            self.cur = node

    def handle_startendtag(self, tag: str, attrs) -> None:
        self.cur.children.append(Node(tag, {k: (v or "") for k, v in attrs}, self.cur))

    def handle_endtag(self, tag: str) -> None:
        # close nearest matching open ancestor (forgiving, browser-ish)
        n: Node | None = self.cur
        while n is not None and n.tag != tag:
            n = n.parent
        if n is not None and n.parent is not None:
            self.cur = n.parent

    def handle_data(self, data: str) -> None:
        if data:
            self.cur.children.append(data)


def parse_html(html: bytes | str | None, encoding: str = "utf-8") -> Node:
    if html is None:
        html = ""
    if isinstance(html, (bytes, bytearray, memoryview)):
        html = bytes(html).decode(encoding, errors="replace")
    b = _TreeBuilder()
    b.feed(html)
    return b.root


def _match_simple(node: Node, sel: str) -> bool:
    """tag, .class, #id, tag.class, tag#id."""
    tag = None
    cls = None
    nid = None
    rest = sel
    if "#" in rest:
        rest, nid = rest.split("#", 1)
    if "." in rest:
        rest, cls = rest.split(".", 1)
    tag = rest or None
    if tag and node.tag != tag:
        return False
    if nid is not None and node.attrs.get("id") != nid:
        return False
    if cls is not None and cls not in (node.attrs.get("class") or "").split():
        return False
    return True


def select(root: Node, selector: str) -> list[Node]:
    """Descendant-combinator CSS subset: ``div.field td.value`` etc.
    Document order, like cheerio."""
    parts = selector.split()
    current = [root]
    for part in parts:
        nxt: list[Node] = []
        seen: set[int] = set()
        for base in current:
            for n in base.iter():
                if id(n) not in seen and _match_simple(n, part):
                    nxt.append(n)
                    seen.add(id(n))
        current = nxt
    return current


# ---------------------------------------------------------------------------
# Connector extraction programs — the ~21 museum connectors collapse into
# config rows (north_star); this dataclass is the per-connector "program".


@dataclass(frozen=True)
class ConnectorConfig:
    connector_id: str
    # search page
    count_selector: str = "#count"
    result_link_selector: str = "ul.results a"
    # detail page
    title_selector: str = "h1.title"
    field_row_selector: str = "tr.field"
    label_selector: str = "td.label"
    value_selector: str = "td.value"
    image_selector: str = "div.images img"
    related_selector: str = "div.related a"
    # behavior toggles mapped from the census (SURVEY.md Appendix A)
    br_to_newline: bool = True  # les-arts-decoratifs.js:122
    encoding: str = "utf-8"  # ceres-mcu.js:121 uses latin1
    content_filter_label: str | None = None  # risd silk filter
    content_filter_substr: str | None = None
    drop_params: frozenset[str] = field(default_factory=frozenset)
    # body format: "html" (cheerio connectors, S2) or "json" (typed JSON API
    # connectors, S3 — vam.js:25-49,72-133, mobilier-international.js:26-99)
    body_format: str = "html"


SYNTH = ConnectorConfig(connector_id="synth")


def extract_count(root: Node, cfg: ConnectorConfig) -> int | None:
    """Result count — 'N results' text (anchor: les-arts-decoratifs.js:22-23)."""
    nodes = select(root, cfg.count_selector)
    if not nodes:
        return None
    txt = nodes[0].text().strip()
    digits = "".join(ch for ch in txt.split(" ")[0] if ch.isdigit())
    return int(digits) if digits else None


def _decode(body: bytes | str, encoding: str) -> str:
    if isinstance(body, (bytes, bytearray, memoryview)):
        return bytes(body).decode(encoding, errors="replace")
    return body


def extract_search_json(
    body: bytes | str, base_url: str, cfg: ConnectorConfig = SYNTH
) -> tuple[int | None, list[str]]:
    """JSON search response → (total, record URLs) — the S3 path
    (vam.js:25-49: typed traversal of ``info.record_count`` + per-record
    links). Fixture shape: ``{"total": N|null, "records": [{"url": ...}]}``."""
    import json

    try:
        data = json.loads(_decode(body, cfg.encoding))
    except ValueError:
        return None, []
    total = data.get("total")
    urls: list[str] = []
    for rec in data.get("records", []):
        u = canonicalize_url(rec.get("url"), base_url, cfg.drop_params)
        if u:
            urls.append(u)
    return (int(total) if total is not None else None), urls


def extract_detail_json(
    body: bytes | str, base_url: str, cfg: ConnectorConfig = SYNTH
) -> dict:
    """JSON detail response → record dict with reference semantics:

    * P1 empty-value filter (record.js:14-21): null/''/[] skipped;
    * P3 type projection (vam.js:74-76): only string|number values kept,
      numbers serialized verbatim;
    * scalar→array promotion by repeated labels (record.js:22-37);
    * image-URL dedup (record.js:47-50).

    ``text`` composition is identical to the HTML path: title line +
    one ``label\\tvalue`` line per kept value, in input order.
    """
    import json

    try:
        data = json.loads(_decode(body, cfg.encoding))
    except ValueError:
        data = {}
    title = (data.get("title") or "").strip()
    fields: list[tuple[str, list[str]]] = []
    by_label: dict[str, list[str]] = {}
    lines: list[str] = [title]
    for f in data.get("fields", []):
        label = (f.get("label") or "").strip()
        raw = f["values"] if "values" in f else [f.get("value")]
        clean: list[str] = []
        for v in raw or []:
            if isinstance(v, bool) or v is None:
                continue  # P1 (booleans are flags, never field values — §1.2)
            if isinstance(v, (int, float)):
                v = repr(v)  # number copied verbatim (vam.js:74-76)
            elif not isinstance(v, str):
                continue  # P3: drop objects/arrays-of-objects
            v = v.strip()
            if not v:
                continue  # P1
            clean.append(v)
        if not label or not clean:
            continue
        for v in clean:
            lines.append(f"{label}\t{v}")
        if label in by_label:
            by_label[label].extend(clean)
        else:
            by_label[label] = list(clean)
            fields.append((label, by_label[label]))

    images: list[str] = []
    img_seen: set[str] = set()
    for src in data.get("images", []):
        u = canonicalize_url(src, base_url, cfg.drop_params)
        if u and u not in img_seen:
            img_seen.add(u)
            images.append(u)

    related: list[str] = []
    for href in data.get("related", []):
        u = canonicalize_url(href, base_url, cfg.drop_params)
        if u:
            related.append(u)

    keep = True
    if cfg.content_filter_label and cfg.content_filter_substr:
        vals = by_label.get(cfg.content_filter_label, [])
        keep = any(cfg.content_filter_substr in v.lower() for v in vals)

    return {
        "title": title,
        "fields": fields,
        "images": images,
        "related": related,
        "text": "\n".join(lines),
        "keep": keep,
    }


def extract_search(
    html: bytes | str, base_url: str, cfg: ConnectorConfig = SYNTH
) -> tuple[int | None, list[str]]:
    """Search page → (total_count, record URLs in DOM order); dispatches on
    the connector's body format (S2 html / S3 json)."""
    if cfg.body_format == "json":
        return extract_search_json(html, base_url, cfg)
    root = parse_html(html, cfg.encoding)
    total = extract_count(root, cfg)
    urls: list[str] = []
    for a in select(root, cfg.result_link_selector):
        href = a.attr("href")
        u = canonicalize_url(href, base_url, cfg.drop_params)
        if u:
            urls.append(u)
    return total, urls


def extract_detail(
    html: bytes | str, base_url: str, cfg: ConnectorConfig = SYNTH
) -> dict:
    """Detail page → record dict with reference field-merge semantics;
    dispatches to the JSON path for S3 connectors.

    Field order = DOM order; repeated labels merge by appending values
    (record.js:22-37 addField promotion). Image URLs deduped per record
    (record.js:47-50). ``text`` is the byte-parity extraction: title line +
    one ``label\\tvalue`` line per (label, value) pair, values with <br>
    rendered as newline, each side ``.trim()``-ed — the exact composition the
    synthetic corpus golden column uses.
    """
    if cfg.body_format == "json":
        return extract_detail_json(html, base_url, cfg)
    root = parse_html(html, cfg.encoding)
    title_nodes = select(root, cfg.title_selector)
    title = title_nodes[0].text().strip() if title_nodes else ""

    fields: list[tuple[str, list[str]]] = []
    by_label: dict[str, list[str]] = {}
    lines: list[str] = [title]
    for row in select(root, cfg.field_row_selector):
        lab_nodes = select(row, cfg.label_selector)
        val_nodes = select(row, cfg.value_selector)
        if not lab_nodes or not val_nodes:
            continue
        label = lab_nodes[0].text().strip()
        value = val_nodes[0].text(br_as_newline=cfg.br_to_newline).strip()
        # addField empty-value filter (record.js:14-21)
        if not label or not value:
            continue
        lines.append(f"{label}\t{value}")
        if label in by_label:
            by_label[label].append(value)  # scalar→array promotion + append
        else:
            vals = [value]
            by_label[label] = vals
            fields.append((label, vals))

    images: list[str] = []
    img_seen: set[str] = set()
    for img in select(root, cfg.image_selector):
        src = canonicalize_url(img.attr("src"), base_url, cfg.drop_params)
        if src and src not in img_seen:  # addImage url-dedup (record.js:47-50)
            img_seen.add(src)
            images.append(src)

    related: list[str] = []
    for a in select(root, cfg.related_selector):
        u = canonicalize_url(a.attr("href"), base_url, cfg.drop_params)
        if u:
            related.append(u)

    keep = True
    if cfg.content_filter_label and cfg.content_filter_substr:
        # risd-museum.js:77-87 — keep only records whose field contains "silk"
        vals = by_label.get(cfg.content_filter_label, [])
        keep = any(cfg.content_filter_substr in v.lower() for v in vals)

    return {
        "title": title,
        "fields": fields,
        "images": images,
        "related": related,
        "text": "\n".join(lines),
        "keep": keep,
    }


# ---------------------------------------------------------------------------
# Spark-facing vectorized extractors (mapInPandas batch functions).

LINKS_OUT_SCHEMA = (
    "url string, total_count int, out_url string, out_idx int, kind string"
)


def extract_links_batch_for(cfg_map: dict[str, ConnectorConfig] | None):
    """Build the mapInPandas link extractor for a per-connector config map.

    The map travels inside the task closure (Python workers re-import the
    module, so a driver-side registry would be invisible to them). Input
    cols: url, body, connector_id; a connector missing from the map falls
    back to the synthetic default.
    """
    cfg_map = cfg_map or {}

    def _batch(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows: list[tuple] = []
            cids = (
                pdf["connector_id"]
                if "connector_id" in pdf.columns
                else [None] * len(pdf)
            )
            for url, body, cid in zip(pdf["url"], pdf["body"], cids):
                cfg = cfg_map.get(cid, SYNTH)
                total, urls = extract_search(body, url, cfg)
                for i, u in enumerate(urls):
                    rows.append((url, total, u, i, "record"))
                if not urls:
                    rows.append((url, total, None, None, None))
            yield pd.DataFrame(
                rows,
                columns=["url", "total_count", "out_url", "out_idx", "kind"],
            )

    return _batch


def extract_links_batch(
    it: Iterator[pd.DataFrame], cfg: ConnectorConfig = SYNTH
) -> Iterator[pd.DataFrame]:
    """Single-config variant (input cols: url, body) — see
    ``extract_links_batch_for``."""
    yield from extract_links_batch_for({None: cfg})(it)


RECORD_OUT_SCHEMA = (
    "url string, record_id string, text string, keep boolean, "
    "fields array<struct<label:string, values:array<string>>>, "
    "image_urls array<string>, related_urls array<string>"
)


def extract_records_batch_for(cfg_map: dict[str, ConnectorConfig] | None):
    """Build the mapInPandas record extractor for a per-connector config map
    (input cols: url, body, connector_id)."""
    cfg_map = cfg_map or {}

    def _batch(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = {
                "url": [],
                "record_id": [],
                "text": [],
                "keep": [],
                "fields": [],
                "image_urls": [],
                "related_urls": [],
            }
            cids = (
                pdf["connector_id"]
                if "connector_id" in pdf.columns
                else [None] * len(pdf)
            )
            for url, body, cid in zip(pdf["url"], pdf["body"], cids):
                cfg = cfg_map.get(cid, SYNTH)
                rec = extract_detail(body, url, cfg)
                out["url"].append(url)
                out["record_id"].append(url.rstrip("/").rsplit("/", 1)[-1])
                out["text"].append(rec["text"])
                out["keep"].append(rec["keep"])
                out["fields"].append(
                    [{"label": l, "values": v} for l, v in rec["fields"]]
                )
                out["image_urls"].append(rec["images"])
                out["related_urls"].append(rec["related"])
            yield pd.DataFrame(out)

    return _batch


def extract_records_batch(
    it: Iterator[pd.DataFrame], cfg: ConnectorConfig = SYNTH
) -> Iterator[pd.DataFrame]:
    """Single-config variant (input cols: url, body) — see
    ``extract_records_batch_for``."""
    yield from extract_records_batch_for({None: cfg})(it)
