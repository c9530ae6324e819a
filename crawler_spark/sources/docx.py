"""S10 DOCX table scan (SURVEY.md §2.1; el-tesoro.js:42-100,120-141).

The reference converts a local DOCX to HTML with mammoth, then walks the
``<tr>`` rows with a state machine: a row whose first cell spans the full
table (``colspan="3"``) starts a new record (its text is the title); ordinary
two-cell rows are (label, value) fields; ``<img src="data:...;base64,...">``
cells carry embedded images (el-tesoro.js:120-141 decodes them to files).

Split of real vs stub: the docx→html conversion needs mammoth/python-docx
(absent in this container) and is injectable/stubbed; the Spark plumbing
(``binaryFile`` source, Arrow-batched parse) and the row state machine are
real and tested against generated HTML.
"""

from __future__ import annotations

import base64
import re
from typing import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from crawler_spark.operators.extract import Node, parse_html, select


def docx_to_html_stub(data: bytes) -> str:
    """Placeholder for mammoth.convert_to_html (NOT a real converter)."""
    raise NotImplementedError(
        "docx→html conversion requires mammoth/python-docx, which are not "
        "available in this container; inject a converter callable instead"
    )


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
        if len(tds) >= 2:
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
    convert: Callable[[bytes], str] = docx_to_html_stub,
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
