"""WARC container source (crawler_spark.sources.warc): writer∘parser
round-trip, envelope skipping, charset decode, gzip members, malformed
input, and the Spark binaryFile scan."""

import gzip
from datetime import datetime

import pytest

from crawler_spark.sources.warc import (
    http_response_payload,
    iter_warc_records,
    parse_warc_responses,
    warc_scan,
    write_warc,
    write_warc_record,
)


def _resp(url, date, body, *, status=200, reason="OK",
          content_type="text/html; charset=utf-8", lang=None):
    return write_warc_record(
        warc_type="response",
        url=url,
        date=date,
        payload=http_response_payload(
            status=status, reason=reason, body=body,
            content_type=content_type, content_language=lang,
        ),
    )


def _sample_container(compress=False):
    recs = [
        write_warc_record(
            warc_type="warcinfo", url=None, date="2024-03-01T00:00:00Z",
            payload=b"software: test\r\n",
            content_type="application/warc-fields",
        ),
        _resp("http://a.example.com/1", "2024-03-01T00:00:01Z",
              b"<html><body>hello</body></html>", lang="en"),
        write_warc_record(  # request record: must be envelope-skipped
            warc_type="request", url="http://a.example.com/2",
            date="2024-03-01T00:00:02Z",
            payload=b"GET /2 HTTP/1.1\r\nHost: a.example.com\r\n\r\n",
            content_type="application/http; msgtype=request",
        ),
        _resp("http://a.example.com/2", "2024-03-01T00:00:02Z",
              "café".encode("latin-1"), status=200,
              content_type="text/plain; charset=iso-8859-1"),
        _resp("http://a.example.com/3", "2024-03-01T00:00:03Z",
              b"\x89PNG\r\n\x1a\nxxxx", content_type="image/png"),
        _resp("http://a.example.com/4", "2024-03-01T00:00:04Z",
              b"", status=404, reason="Not Found",
              content_type="text/html; charset=utf-8"),
    ]
    return write_warc(recs, compress=compress)


def test_roundtrip_fields():
    rows = list(parse_warc_responses(_sample_container()))
    assert [r["url"] for r in rows] == [
        f"http://a.example.com/{i}" for i in (1, 2, 3, 4)
    ]
    r1, r2, r3, r4 = rows
    assert r1["text"] == "<html><body>hello</body></html>"
    assert r1["lang"] == "en" and r1["status"] == 200
    assert r1["warc_ts"] == datetime(2024, 3, 1, 0, 0, 1)
    assert r2["text"] == "café"  # latin-1 decoded per declared charset
    assert r2["html"] == "café".encode("latin-1")
    assert r3["text"] is None and r3["mime"] == "image/png"
    assert r3["html"].startswith(b"\x89PNG")
    assert r4["status"] == 404 and r4["text"] == ""


def test_envelope_skips_non_response():
    kinds = [h.get("warc-type") for h, _ in
             iter_warc_records(_sample_container())]
    assert kinds == ["warcinfo", "response", "request",
                     "response", "response", "response"]
    # request/warcinfo records do not become rows
    assert len(list(parse_warc_responses(_sample_container()))) == 4


def test_gzip_members_roundtrip():
    plain = list(parse_warc_responses(_sample_container()))
    gz = list(parse_warc_responses(_sample_container(compress=True)))
    assert gz == plain
    # per-record members: the stream has >1 gzip magic
    data = _sample_container(compress=True)
    assert data.count(b"\x1f\x8b\x08") >= 6


def test_malformed_inputs_raise():
    good = _sample_container()
    with pytest.raises(ValueError, match="version line"):
        list(iter_warc_records(b"HTTP/1.1 200 OK\r\n\r\n"))
    with pytest.raises(ValueError, match="truncated WARC payload"):
        list(iter_warc_records(good[: len(good) - 40]))
    no_len = write_warc_record(
        warc_type="response", url="http://x/", date="2024-03-01T00:00:00Z",
        payload=b"",
    ).replace(b"Content-Length: 0\r\n", b"")
    with pytest.raises(ValueError, match="Content-Length"):
        list(iter_warc_records(no_len))


def test_unknown_charset_falls_back_utf8():
    rec = _resp("http://a/", "2024-03-01T00:00:00Z", b"abc",
                content_type="text/plain; charset=x-bogus-enc")
    (row,) = parse_warc_responses(rec)
    assert row["text"] == "abc"


def test_warc_scan_binaryfile(spark, tmp_path):
    (tmp_path / "part-0.warc").write_bytes(_sample_container())
    (tmp_path / "part-1.warc.gz").write_bytes(_sample_container(compress=True))
    (tmp_path / "ignore.txt").write_bytes(b"not a warc")
    df = warc_scan(spark, str(tmp_path))
    rows = df.collect()
    assert len(rows) == 8  # 4 responses per container
    assert df.columns == [
        "url", "warc_ts", "html", "text", "lang", "status", "mime",
        "warc_file",
    ]
    by_file = {}
    for r in rows:
        by_file.setdefault(r["warc_file"].rsplit("/", 1)[-1], []).append(r)
    assert set(by_file) == {"part-0.warc", "part-1.warc.gz"}
    for rs in by_file.values():
        texts = {r["url"].rsplit("/", 1)[-1]: r["text"] for r in rs}
        assert texts == {"1": "<html><body>hello</body></html>",
                         "2": "café", "3": None, "4": ""}


def test_warc_scan_dataframe_input(spark):
    pdf_rows = [("mem://a.warc", bytearray(_sample_container()))]
    df = spark.createDataFrame(pdf_rows, "path string, content binary")
    out = warc_scan(df)
    assert out.count() == 4
    assert {r["status"] for r in out.collect()} == {200, 404}


def test_warc_export_roundtrip(spark, tmp_path):
    from datetime import datetime

    from crawler_spark.sources.warc import warc_export

    rows = [
        (
            f"http://h{i % 3}.example.com/p/{i}",
            datetime(2024, 5, 1, 12, 0, i),
            f"<html><body>doc {i} café</body></html>".encode(),
            "text/html",
            "en" if i % 2 == 0 else None,
            200,
        )
        for i in range(40)
    ]
    df = spark.createDataFrame(
        rows,
        "url string, warc_ts timestamp, html binary, mime string,"
        " lang string, status int",
    )
    out = str(tmp_path / "export")
    manifest = warc_export(
        df, out, mime_col="mime", lang_col="lang", status_col="status",
        n_files=4,
    )
    man = manifest.collect()
    assert sum(r["n_records"] for r in man) == 40
    assert all(r["warc_file"].endswith(".warc.gz") for r in man)
    import os

    files = [f for f in os.listdir(out) if f.endswith(".warc.gz")]
    assert sorted(files) == sorted(r["warc_file"] for r in man)
    # manifest persisted next to the archives
    assert (
        spark.read.parquet(os.path.join(out, "_manifest")).count()
        == len(man)
    )

    # scan recovers every row: url, timestamp, bytes, text, lang, status
    back = warc_scan(spark, out)
    got = {r["url"]: r for r in back.collect()}
    assert len(got) == 40
    for url, ts, html, mime, lang, status in rows:
        r = got[url]
        assert bytes(r["html"]) == html
        assert r["warc_ts"] == ts
        assert r["text"] == html.decode()
        assert r["lang"] == lang
        assert r["status"] == status
        assert r["mime"] == "text/html"


def test_warc_export_nulls_unicode_and_subseconds(spark, tmp_path):
    """NULL warc_ts (NaT) and NULL status must not crash the export task;
    non-ASCII URL paths and sub-second timestamps must round-trip through
    the archive."""
    from datetime import datetime

    from crawler_spark.sources.warc import warc_export

    rows = [
        ("http://h.example/récord/1",
         datetime(2024, 5, 1, 12, 0, 0, 500000), b"<p>a</p>", 200),
        ("http://h.example/p/2", None, b"<p>b</p>", None),
    ]
    df = spark.createDataFrame(
        rows, "url string, warc_ts timestamp, html binary, status int"
    )
    out = str(tmp_path / "exp_nulls")
    warc_export(df, out, status_col="status", n_files=1)
    got = {r["url"]: r for r in warc_scan(spark, out).collect()}
    assert set(got) == {"http://h.example/récord/1", "http://h.example/p/2"}
    r1 = got["http://h.example/récord/1"]
    assert r1["warc_ts"] == datetime(2024, 5, 1, 12, 0, 0, 500000)
    r2 = got["http://h.example/p/2"]
    assert r2["warc_ts"] == datetime(1970, 1, 1)  # NULL ts → epoch default
    assert r2["status"] == 200  # NULL status → 200, not int(NaN)


def test_warc_export_cleans_stale_parts(spark, tmp_path):
    """Re-exporting the same path with fewer files must not leave the
    previous run's extra containers behind — warc_scan globs *.warc* and
    stale parts would resurface rows the manifest never describes."""
    import os

    from datetime import datetime

    from crawler_spark.sources.warc import warc_export

    def mk(n):
        return spark.createDataFrame(
            [(f"http://h/p/{i}", datetime(2024, 1, 1), b"<p>x</p>")
             for i in range(n)],
            "url string, warc_ts timestamp, html binary",
        )

    out = str(tmp_path / "exp_stale")
    warc_export(mk(40), out, n_files=4)
    assert warc_scan(spark, out).count() == 40
    warc_export(mk(10), out, n_files=2)
    files = [f for f in os.listdir(out) if f.endswith(".warc.gz")]
    assert len(files) == 2  # parts 2..3 from the first run reclaimed
    assert warc_scan(spark, out).count() == 10


def test_warc_export_deterministic_and_idempotent(spark, tmp_path):
    from datetime import datetime

    from crawler_spark.sources.warc import warc_export

    df = spark.createDataFrame(
        [(f"http://h/p{i}", datetime(2024, 1, 1), b"x") for i in range(8)],
        "url string, warc_ts timestamp, html binary",
    ).repartition(2)
    out = str(tmp_path / "w")
    warc_export(df, out, n_files=2)
    import os

    first = {
        f: open(os.path.join(out, f), "rb").read()
        for f in os.listdir(out)
        if f.endswith(".warc.gz")
    }
    # re-export (simulates a retried/speculative task re-running): byte-
    # identical files, no leftovers, no duplicates
    warc_export(df, out, n_files=2)
    second = {
        f: open(os.path.join(out, f), "rb").read()
        for f in os.listdir(out)
        if f.endswith(".warc.gz")
    }
    assert first == second
    assert not any(".inprogress" in f for f in os.listdir(out))


def test_warc_export_uncompressed_and_defaults(spark, tmp_path):
    from datetime import datetime

    from crawler_spark.sources.warc import warc_export

    df = spark.createDataFrame(
        [("http://h/a", datetime(2024, 1, 1), "<p>t</p>".encode())],
        "url string, warc_ts timestamp, html binary",
    )
    out = str(tmp_path / "u")
    warc_export(df, out, compress=False, n_files=1)
    back = warc_scan(spark, out).collect()
    assert len(back) == 1
    r = back[0]
    # defaults: text/html, status 200, no language
    assert (r["mime"], r["status"], r["lang"]) == ("text/html", 200, None)
    assert r["text"] == "<p>t</p>"
