"""S10 DOCX table scan (SURVEY.md §2.1; el-tesoro.js:42-100,120-141).

The reference converts a local DOCX to HTML with mammoth, then walks the
``<tr>`` rows with a state machine: a row whose first cell spans the full
table (``colspan="3"``) starts a new record (its text is the title); ordinary
two-cell rows are (label, value) fields; ``<img src="data:...;base64,...">``
cells carry embedded images (el-tesoro.js:120-141 decodes them to files).

The converter here is REAL and stdlib-only: a .docx is a zip whose
``word/document.xml`` carries tables as ``w:tbl/w:tr/w:tc`` (text in
``w:t`` runs, column spans in ``w:tcPr/w:gridSpan``) and whose embedded
images are ``a:blip r:embed`` relationship ids resolved through
``word/_rels/document.xml.rels`` to ``word/media/*`` parts — exactly the
pieces mammoth turns into ``<table>`` rows and base64 data URIs. An
alternative converter stays injectable for tests.
"""

from __future__ import annotations

import base64
import re
from typing import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from crawler_spark.operators.extract import Node, parse_html, select

_W = "{http://schemas.openxmlformats.org/wordprocessingml/2006/main}"
_A = "{http://schemas.openxmlformats.org/drawingml/2006/main}"
_R = "{http://schemas.openxmlformats.org/officeDocument/2006/relationships}"


def docx_to_html(data: bytes) -> str:
    """DOCX bytes → the minimal table HTML the el-tesoro state machine
    consumes (mammoth-equivalent for the subset the reference uses:
    tables, gridSpan→colspan, embedded images→base64 data URIs)."""
    import html as _h
    import io
    import zipfile
    from xml.etree import ElementTree as ET

    zf = zipfile.ZipFile(io.BytesIO(data))
    doc = ET.fromstring(zf.read("word/document.xml"))
    rels: dict[str, str] = {}
    try:
        relroot = ET.fromstring(zf.read("word/_rels/document.xml.rels"))
        for rel in relroot:
            rid, target = rel.get("Id"), rel.get("Target")
            if rid and target:
                rels[rid] = target
    except KeyError:
        pass

    # ownership map: ElementTree's subtree iter() would pull a NESTED
    # table's rows/cells into the outer grid (and emit the inner table a
    # second time as its own <table>), garbling colspans and vMerge
    # resolution. Each tr/tc is attributed to its NEAREST tbl/tr ancestor;
    # nested-table text still flattens into the owning cell via
    # tc.iter(w:t), mammoth-ishly.
    parents = {c: p for p in doc.iter() for c in p}

    def _nearest(el, tag):
        p = parents.get(el)
        while p is not None:
            if p.tag == tag:
                return p
            p = parents.get(p)
        return None

    out: list[str] = []
    for tbl in doc.iter(_W + "tbl"):
        if _nearest(tbl, _W + "tbl") is not None:
            continue  # nested table: content belongs to its owning cell
        # pass 1: grid-position every cell and resolve vertical merges the
        # way mammoth does — a w:vMerge val="restart" cell opens a span,
        # continuation cells (w:vMerge with no val / val="continue") in the
        # same grid column on following rows extend it and are DROPPED from
        # the emitted HTML; the restart cell gets rowspan="N"
        # (el-tesoro.js:73-81 keys its image branch on that attribute)
        grid_rows: list[list[dict]] = []
        for tr in tbl.iter(_W + "tr"):
            if _nearest(tr, _W + "tbl") is not tbl:
                continue  # a nested table's row
            col = 0
            cells: list[dict] = []
            for tc in tr.iter(_W + "tc"):
                if _nearest(tc, _W + "tr") is not tr:
                    continue  # a nested table's cell
                span = tc.find(f"{_W}tcPr/{_W}gridSpan")
                # a <w:gridSpan/> with no w:val means 1 (mammoth's default);
                # int(None) would crash the whole Arrow batch
                colspan = (
                    int(span.get(_W + "val") or 1) if span is not None else 1
                )
                vm = tc.find(f"{_W}tcPr/{_W}vMerge")
                vmerge = (
                    (vm.get(_W + "val") or "continue")
                    if vm is not None
                    else None
                )
                cells.append(
                    {"tc": tc, "col": col, "colspan": colspan,
                     "vmerge": vmerge, "rowspan": 1}
                )
                col += colspan
            grid_rows.append(cells)
        for ri, cells in enumerate(grid_rows):
            for c in cells:
                if c["vmerge"] != "restart":
                    continue
                for below in grid_rows[ri + 1:]:
                    cont = next(
                        (b for b in below
                         if b["col"] == c["col"] and b["vmerge"] == "continue"),
                        None,
                    )
                    if cont is None:
                        break
                    c["rowspan"] += 1

        # pass 2: emit
        out.append("<table>")
        for cells in grid_rows:
            out.append("<tr>")
            for c in cells:
                if c["vmerge"] == "continue":
                    continue  # swallowed by the restart cell above it
                tc = c["tc"]
                attrs = ""
                if c["colspan"] > 1:
                    attrs += f' colspan="{c["colspan"]}"'
                if c["rowspan"] > 1:
                    attrs += f' rowspan="{c["rowspan"]}"'
                text = "".join(t.text or "" for t in tc.iter(_W + "t"))
                imgs: list[str] = []
                for blip in tc.iter(_A + "blip"):
                    target = rels.get(blip.get(_R + "embed") or "")
                    if not target:
                        continue
                    name = "word/" + target.lstrip("/")
                    try:
                        img_bytes = zf.read(name)
                    except KeyError:
                        continue
                    fmt = name.rsplit(".", 1)[-1].lower()
                    b64 = base64.b64encode(img_bytes).decode("ascii")
                    imgs.append(f'<img src="data:image/{fmt};base64,{b64}">')
                out.append(f"<td{attrs}>{_h.escape(text)}{''.join(imgs)}</td>")
            out.append("</tr>")
        out.append("</table>")
    return "".join(out)


# retained name for callers that injected around the old stub
docx_to_html_stub = docx_to_html


_DATA_URI = re.compile(r"^data:image/(\w+);base64,(.*)$", re.S)


def parse_record_tables(html: str) -> list[dict]:
    """The el-tesoro ``<tr>`` state machine over converted HTML."""
    root = parse_html(html)
    records: list[dict] = []
    cur: dict | None = None
    for tr in select(root, "tr"):
        tds = [c for c in tr.children if isinstance(c, Node) and c.tag == "td"]
        if not tds:
            continue
        if tds[0].attr("colspan") == "3":  # record separator row
            cur = {"title": tds[0].text().strip(), "fields": [], "images": []}
            records.append(cur)
            continue
        if cur is None:
            continue
        # collect embedded base64 images anywhere in the row
        for img in select(tr, "img"):
            m = _DATA_URI.match(img.attr("src") or "")
            if m:
                cur["images"].append(
                    {
                        "format": m.group(1),
                        "bytes": base64.b64decode(m.group(2)),
                    }
                )
        if tds[0].attr("rowspan") == "10":
            # el-tesoro.js:73-81: the 10-row-spanning image cell's row
            # carries the record number two cells over ($td.next.next);
            # its image was collected above. Later rows of the span omit
            # the merged cell, so they fall through to the generic
            # (label, value) branch below with the right first cell.
            if len(tds) >= 3:
                value = tds[2].text().strip()
                if value:
                    cur["fields"].append(("Nº de Inventario", value))
        elif len(tds) >= 2:
            label = tds[0].text().strip()
            value = tds[1].text().strip()
            if label and value:
                cur["fields"].append((label, value))
    return records


DOCX_RECORDS_SCHEMA = (
    "path string, record_idx int, title string, "
    "fields array<struct<label:string, values:array<string>>>, "
    "n_images int"
)


def docx_records(
    spark: SparkSession,
    path: str,
    convert: Callable[[bytes], str] = docx_to_html,
) -> DataFrame:
    """DOCX files under ``path`` → one row per record table.

    ``binaryFile`` is the Spark source (one row per file, content as
    binary); conversion + state machine run Arrow-batched.
    """
    files = spark.read.format("binaryFile").load(path)

    def _batch(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = {
                "path": [], "record_idx": [], "title": [],
                "fields": [], "n_images": [],
            }
            for p, content in zip(pdf["path"], pdf["content"]):
                html = convert(bytes(content))
                for i, rec in enumerate(parse_record_tables(html)):
                    out["path"].append(p)
                    out["record_idx"].append(i)
                    out["title"].append(rec["title"])
                    out["fields"].append(
                        [
                            {"label": l, "values": [v]}
                            for l, v in rec["fields"]
                        ]
                    )
                    out["n_images"].append(len(rec["images"]))
            yield pd.DataFrame(out)

    return files.select("path", "content").mapInPandas(
        _batch, DOCX_RECORDS_SCHEMA
    )
