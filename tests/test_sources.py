"""Source-family coverage: S6 sessionful fetch affinity, S7 delimited-text
parse, S8 local NDJSON scan, S9 local TSV scan (SURVEY.md §2.1)."""

import pytest
from pyspark.sql import functions as F


def test_s6_one_session_per_host_run(spark):
    """Salted-by-host + sortWithinPartitions ⇒ each worker opens exactly one
    session per host it owns (imatex/mtmad session contract)."""
    from crawler_spark.operators.fetch import sessionful_fixture_fetch
    from crawler_spark.operators.politeness import salted_host_repartition

    rows = [
        (f"http://h{h}.example.test/record/{i}", f"h{h}.example.test")
        for h in range(4)
        for i in range(30)
    ]
    pages_map = {u: b"<html>x</html>" for u, _ in rows}
    batch = spark.createDataFrame(rows, "url string, host string").select(
        "url", "host",
        F.lit(0).alias("depth"), F.lit(0).alias("seed_idx"),
        F.lit(0).alias("page_no"), F.lit(0).alias("in_page_idx"),
        F.lit(0).alias("dfs_rank"),
    )
    salted = salted_host_repartition(batch, target_per_task=15)
    fetched = sessionful_fixture_fetch(salted, pages_map)
    got = fetched.collect()
    assert len(got) == len(rows)
    assert all(r["status"] == 200 for r in got)
    # sessions per host ≤ salt buckets (ceil(30/15) = 2): affinity held —
    # a broken sort would show ~30 sessions for some host
    per_host = {}
    for r in got:
        per_host.setdefault(r["host"], set()).add(r["session_id"])
    assert all(len(s) <= 2 for s in per_host.values()), per_host


def test_s7_delimited_scan(spark):
    """imatex custom delimited body: rows split on '|', ids on '><'
    (imatex.js:134-154) — pure JVM split+explode."""
    body = "a1><t1|a2><t2|a3><t3"
    df = spark.createDataFrame([(body,)], "body string")
    out = (
        df.select(F.explode(F.split("body", r"\|")).alias("row"))
        .select(F.split("row", "><").alias("parts"))
        .select(
            F.element_at("parts", 1).alias("rec_id"),
            F.element_at("parts", 2).alias("rec_type"),
        )
    )
    assert [(r["rec_id"], r["rec_type"]) for r in out.collect()] == [
        ("a1", "t1"), ("a2", "t2"), ("a3", "t3")
    ]


def test_s8_ndjson_scan(spark, tmp_path):
    """unipa local NDJSON resources (unipa.js:22-46) → native spark.read.json."""
    p = tmp_path / "records.ndjson"
    p.write_text(
        '{"id": "1", "title": "Silk panel", "year": 1850}\n'
        '{"id": "2", "title": "Velvet border", "year": 1901}\n'
    )
    df = spark.read.json(str(p))
    rows = {r["id"]: r for r in df.collect()}
    assert rows["1"]["title"] == "Silk panel"
    assert rows["2"]["year"] == 1901


def test_s9_tsv_scan(spark, tmp_path):
    """musee-st-etienne TSV with BOM, headers, tab sep, no quoting
    (musee-st-etienne.js:33-59) → native csv reader options."""
    p = tmp_path / "records.tsv"
    p.write_bytes(
        "﻿id\ttitle\tmaterial\n1\tChasuble\tsilk \"brocade\"\n2\tPanel\tvelvet\n".encode()
    )
    df = (
        spark.read.option("sep", "\t")
        .option("header", True)
        .option("quote", "")  # quote:null in the reference
        .csv(str(p))
    )
    rows = {r["id"]: r for r in df.collect()}
    assert rows["1"]["material"] == 'silk "brocade"'  # quoting disabled
    assert rows["2"]["title"] == "Panel"
    assert "id" in df.columns  # BOM stripped from first header


def test_s10_docx_table_scan(spark, tmp_path):
    """el-tesoro DOCX table state machine (el-tesoro.js:58-90) over the
    binaryFile source, with an injected docx→html conversion (the
    stdlib converter has its own round-trip test below)."""
    import base64

    from crawler_spark.sources.docx import docx_records, docx_to_html_stub

    png_b64 = base64.b64encode(b"\x89PNG\r\n\x1a\nfake").decode()
    fake_html = (
        "<table>"
        '<tr><td colspan="3"> Chasuble of Toledo </td></tr>'
        "<tr><td> Material </td><td> silk </td></tr>"
        "<tr><td> Century </td><td> XVI </td></tr>"
        f'<tr><td>Image</td><td><img src="data:image/png;base64,{png_b64}"></td></tr>'
        '<tr><td colspan="3">Second Record</td></tr>'
        "<tr><td>Material</td><td>velvet</td></tr>"
        "<tr><td>Empty</td><td>  </td></tr>"
        "</table>"
    )
    d = tmp_path / "docx"
    d.mkdir()
    (d / "records.docx").write_bytes(b"PK\x03\x04 not a real docx")

    out = docx_records(spark, str(d), convert=lambda b: fake_html).collect()
    assert len(out) == 2
    first = next(r for r in out if r["record_idx"] == 0)
    assert first["title"] == "Chasuble of Toledo"
    fields = [(f["label"], list(f["values"])) for f in first["fields"]]
    assert fields[:2] == [("Material", ["silk"]), ("Century", ["XVI"])]
    assert first["n_images"] == 1
    second = next(r for r in out if r["record_idx"] == 1)
    assert [(f["label"], f["values"][0]) for f in second["fields"]] == [
        ("Material", "velvet")
    ]  # empty value dropped (P1)

    # the converter is real now (stdlib zip+XML); alias retained
    from crawler_spark.sources.docx import docx_to_html
    assert docx_to_html_stub is docx_to_html


def _build_docx(records, image_bytes=None) -> bytes:
    """Minimal real .docx (zip of WordprocessingML) with one table:
    colspan-3 separator rows + (label, value) rows + an optional embedded
    image resolved through the rels part — the subset el-tesoro consumes."""
    import io
    import zipfile

    W = "http://schemas.openxmlformats.org/wordprocessingml/2006/main"
    A = "http://schemas.openxmlformats.org/drawingml/2006/main"
    R = "http://schemas.openxmlformats.org/officeDocument/2006/relationships"

    def cell(text, span=None, img_rid=None, vmerge=None):
        pr = ""
        if span:
            pr += f'<w:gridSpan w:val="{span}"/>'
        if vmerge == "restart":
            pr += '<w:vMerge w:val="restart"/>'
        elif vmerge == "continue":
            pr += "<w:vMerge/>"
        pr = f"<w:tcPr>{pr}</w:tcPr>" if pr else ""
        drawing = (
            f'<w:p><w:r><w:drawing><a:blip r:embed="{img_rid}"/></w:drawing>'
            "</w:r></w:p>" if img_rid else ""
        )
        return (
            f"<w:tc>{pr}<w:p><w:r><w:t>{text}</w:t></w:r></w:p>{drawing}</w:tc>"
        )

    rows = []
    for rec in records:
        rows.append(f"<w:tr>{cell(rec['title'], span=3)}</w:tr>")
        if rec.get("vmerged_image"):
            # el-tesoro layout: the image cell vMerge-spans the field rows
            # (mammoth renders it rowspan="10"); continuation rows carry a
            # silent merged cell ahead of their (label, value) cells
            fields = list(rec["fields"])
            first_label, first_value = fields[0]
            rows.append(
                "<w:tr>"
                + cell("", img_rid="rId9", vmerge="restart")
                + cell(first_label) + cell(first_value)
                + "</w:tr>"
            )
            for label, value in fields[1:]:
                rows.append(
                    "<w:tr>" + cell("", vmerge="continue")
                    + cell(label) + cell(value) + "</w:tr>"
                )
            # pad the span out to 10 rows like the real documents
            for _ in range(10 - len(fields)):
                rows.append(
                    "<w:tr>" + cell("", vmerge="continue")
                    + cell("") + cell("") + "</w:tr>"
                )
            continue
        for label, value in rec["fields"]:
            rows.append(f"<w:tr>{cell(label)}{cell(value)}</w:tr>")
        if rec.get("image") and image_bytes is not None:
            rows.append(f"<w:tr>{cell('Image')}{cell('', img_rid='rId9')}</w:tr>")
    doc = (
        f'<w:document xmlns:w="{W}" xmlns:a="{A}" xmlns:r="{R}">'
        f"<w:body><w:tbl>{''.join(rows)}</w:tbl></w:body></w:document>"
    )
    rels = (
        '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
        '<Relationship Id="rId9" Type="img" Target="media/image1.png"/>'
        "</Relationships>"
    )
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr("word/document.xml", doc)
        zf.writestr("word/_rels/document.xml.rels", rels)
        if image_bytes is not None:
            zf.writestr("word/media/image1.png", image_bytes)
    return buf.getvalue()


def test_s10_docx_vmerge_rowspan(spark, tmp_path):
    """w:vMerge vertical merges render as rowspan (mammoth semantics) and
    the state machine's el-tesoro image branch (first cell rowspan="10" →
    record image + 'Nº de Inventario' two cells over, el-tesoro.js:73-81)
    extracts the merged layout identically."""
    from crawler_spark.sources.docx import (
        docx_records,
        docx_to_html,
        parse_record_tables,
    )

    png = b"\x89PNG\r\n\x1a\n" + b"\x00" * 8
    data = _build_docx(
        [
            {"title": "Merged Record", "vmerged_image": True,
             "fields": [("Nº de Inventario", "1234"),
                        ("Material", "silk"), ("Century", "XVII")]},
        ],
        image_bytes=png,
    )
    html = docx_to_html(data)
    assert 'rowspan="10"' in html
    assert html.count("<img") == 1  # continuation cells emit nothing

    recs = parse_record_tables(html)
    assert len(recs) == 1
    assert recs[0]["title"] == "Merged Record"
    # restart row → record number via the rowspan branch; continuation
    # rows (merged cell omitted) → ordinary (label, value) fields
    assert recs[0]["fields"] == [
        ("Nº de Inventario", "1234"),
        ("Material", "silk"), ("Century", "XVII"),
    ]
    assert len(recs[0]["images"]) == 1

    d = tmp_path / "docx_vm"
    d.mkdir()
    (d / "r.docx").write_bytes(data)
    out = docx_records(spark, str(d)).collect()
    assert len(out) == 1 and out[0]["n_images"] == 1


def test_s10_docx_nested_table_not_flattened():
    """A table nested inside a cell must not leak its rows/cells into the
    outer grid nor be emitted again as a standalone <table>; its text
    flattens into the owning cell (mammoth-ish)."""
    import io
    import zipfile

    from crawler_spark.sources.docx import docx_to_html

    W = "http://schemas.openxmlformats.org/wordprocessingml/2006/main"
    inner = (
        "<w:tbl><w:tr><w:tc><w:p><w:r><w:t>inner</w:t></w:r></w:p>"
        "</w:tc></w:tr></w:tbl>"
    )
    doc = (
        f'<w:document xmlns:w="{W}"><w:body><w:tbl>'
        "<w:tr><w:tc><w:p><w:r><w:t>outer</w:t></w:r></w:p>"
        f"{inner}</w:tc>"
        "<w:tc><w:p><w:r><w:t>val</w:t></w:r></w:p></w:tc></w:tr>"
        "</w:tbl></w:body></w:document>"
    )
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr("word/document.xml", doc)
    html = docx_to_html(buf.getvalue())
    assert html.count("<table>") == 1  # inner tbl not re-emitted
    assert html.count("<tr>") == 1  # inner row not pulled into the grid
    assert html.count("<td") == 2  # inner cell not pulled into the row
    assert "outerinner" in html  # nested text flattens into its cell


def test_sitegen_large_msearch_no_ref_collision():
    """detail refs and related refs must stay disjoint at any
    details_per_host — at >= 91 the fixed related base used to collide,
    emitting duplicate /notice/ URLs with different bodies."""
    from crawler_spark.sources.sitegen import SiteSpec, generate_site

    site = generate_site(SiteSpec(
        n_hosts=1, details_per_host=95, limit=10, related_per_host=3,
        msearch_hosts=(0,),
    ))
    urls = list(site["pages"]["url"])
    assert len(urls) == len(set(urls))


def test_s10_real_docx_roundtrip(spark, tmp_path):
    """End-to-end over a REAL .docx: stdlib zip/XML conversion → state
    machine → records, embedded image surfaced as a data URI."""
    from crawler_spark.sources.docx import docx_records

    png = b"\x89PNG\r\n\x1a\n" + b"\x00" * 8
    data = _build_docx(
        [
            {"title": "Chasuble of Toledo",
             "fields": [("Material", "silk"), ("Century", "XVI")],
             "image": True},
            {"title": "Second Record", "fields": [("Material", "velvet")]},
        ],
        image_bytes=png,
    )
    d = tmp_path / "docx_real"
    d.mkdir()
    (d / "r.docx").write_bytes(data)

    out = docx_records(spark, str(d)).collect()
    assert len(out) == 2
    first = next(r for r in out if r["record_idx"] == 0)
    assert first["title"] == "Chasuble of Toledo"
    assert [(f["label"], f["values"][0]) for f in first["fields"]] == [
        ("Material", "silk"), ("Century", "XVI"),
    ]
    assert first["n_images"] == 1  # blip → rels → media → data URI
    second = next(r for r in out if r["record_idx"] == 1)
    assert second["title"] == "Second Record" and second["n_images"] == 0
