"""S16 WARC container scan (Common-Crawl envelope for the crawl's input).

The reference crawls live HTTP one page at a time (base.js:100-112 keeps a
single request in flight); at Common-Crawl scale the equivalent input is
WARC/1.0 container files (ISO 28500): a byte stream of records, each a
header block (``WARC/1.0`` version line + ``Name: value`` lines + blank
line) followed by exactly ``Content-Length`` payload bytes and a CRLFCRLF
separator. :func:`warc_scan` turns ``.warc`` / ``.warc.gz`` files into the
engine's input-table shape ``(url, warc_ts, html, text, lang)`` — the
exact shape BASELINE.json's ``input_hint`` names — with the parse running
as a streaming ``mapInPandas`` over ``binaryFile`` rows (one Arrow batch
per file; record payloads are sliced by Content-Length arithmetic, never
re-scanned).

Only ``WARC-Type: response`` records carrying ``application/http``
payloads become rows; request/metadata/revisit/warcinfo records are
envelope-skipped without parsing their payloads. The HTTP head is split
off, status + Content-Type parsed, and the body decoded per the declared
charset (utf-8 fallback, errors replaced) for ``text/*`` payloads;
non-text payloads keep ``html`` bytes with ``text`` null. ``lang`` comes
from the HTTP ``Content-Language`` header when present (Common Crawl
publishes language in sidecar metadata; the header is the in-band
equivalent this synthetic corpus can state).

:func:`write_warc` is the deterministic inverse used by tests and the
``s16_warc_scan`` driver query: byte-stable output (fixed header order,
``urn:md5`` record ids derived from url+date) so writer∘parser is an
identity the DuckDB oracle can express over the source table.
"""

from __future__ import annotations

import gzip
import hashlib
import re
from datetime import datetime, timezone
from typing import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

_CRLF = b"\r\n"
_GZIP_MAGIC = b"\x1f\x8b"

# output schema of warc_scan — the north-rule input-table shape plus the
# HTTP envelope fields a curation pipeline filters on
WARC_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("warc_ts", T.TimestampType()),
        T.StructField("html", T.BinaryType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("status", T.IntegerType()),
        T.StructField("mime", T.StringType()),
        T.StructField("warc_file", T.StringType()),
    ]
)


# -- writer (deterministic; tests + driver query) ---------------------------


def write_warc_record(
    *,
    warc_type: str,
    url: str | None,
    date: str,
    payload: bytes,
    content_type: str = "application/http; msgtype=response",
) -> bytes:
    """One WARC/1.0 record with byte-stable header order. ``date`` is the
    ISO-8601 ``WARC-Date`` string (``YYYY-MM-DDTHH:MM:SSZ``)."""
    rid = hashlib.md5(
        f"{warc_type}|{url or ''}|{date}".encode("utf-8")
    ).hexdigest()
    head = [
        b"WARC/1.0",
        b"WARC-Type: " + warc_type.encode("ascii"),
        b"WARC-Record-ID: <urn:md5:" + rid.encode("ascii") + b">",
        b"WARC-Date: " + date.encode("ascii"),
    ]
    if url is not None:
        # UTF-8, not ascii: canonical URLs IDNA-encode only the host —
        # non-ASCII path/query characters pass through verbatim and an
        # ascii encode here crashed the export task on any such URL.
        # warc_scan decodes headers as UTF-8, so the URI round-trips.
        head.append(b"WARC-Target-URI: " + url.encode("utf-8"))
    head.append(b"Content-Type: " + content_type.encode("ascii"))
    head.append(b"Content-Length: " + str(len(payload)).encode("ascii"))
    return _CRLF.join(head) + _CRLF + _CRLF + payload + _CRLF + _CRLF


def http_response_payload(
    *,
    status: int,
    reason: str,
    body: bytes,
    content_type: str,
    content_language: str | None = None,
    extra_headers: list[tuple[str, str]] | None = None,
) -> bytes:
    """The ``application/http; msgtype=response`` block: status line +
    headers + CRLFCRLF + body."""
    lines = [
        f"HTTP/1.1 {status} {reason}".encode("ascii"),
        b"Content-Type: " + content_type.encode("ascii"),
        b"Content-Length: " + str(len(body)).encode("ascii"),
    ]
    if content_language is not None:
        lines.append(b"Content-Language: " + content_language.encode("ascii"))
    for k, v in extra_headers or ():
        lines.append(f"{k}: {v}".encode("ascii"))
    return _CRLF.join(lines) + _CRLF + _CRLF + body


def write_warc(records: list[bytes], *, compress: bool = False) -> bytes:
    """Concatenate records into one WARC file; ``compress`` emits the
    standard per-record-gzip-member layout (each record its own deflate
    stream, so a reader can split members without decompressing the whole
    file — the Common-Crawl on-disk convention)."""
    if not compress:
        return b"".join(records)
    out = bytearray()
    for rec in records:
        out += gzip.compress(rec, mtime=0)
    return bytes(out)


# -- distributed export sink -------------------------------------------------


def warc_export(
    df: DataFrame,
    path: str,
    url_col: str = "url",
    ts_col: str = "warc_ts",
    body_col: str = "html",
    mime_col: str | None = None,
    lang_col: str | None = None,
    status_col: str | None = None,
    compress: bool = True,
    n_files: int | None = None,
) -> DataFrame:
    """Distributed WARC export: write a fetched-pages DataFrame as
    Common-Crawl-style ``.warc(.gz)`` container files, one per partition,
    in parallel across the cluster. The inverse of :func:`warc_scan` —
    ``warc_scan(warc_export(df, p), p)`` recovers the rows.

    Physical shape: each task serializes ITS OWN partition's rows
    (deterministic byte layout — fixed header order, ``urn:md5`` ids from
    url+date, gzip ``mtime=0``) and lands one container file named by the
    partition id alone, via write-to-temp + atomic rename. A retried task
    re-produces byte-identical content and the rename is last, so
    speculative/re-executed tasks cannot tear or duplicate a file — the
    same manifest-last idempotence the round checkpointer uses. No
    driver-side iteration; the only driver data is the one-row-per-file
    manifest this returns (written to ``<path>/_manifest`` as parquet).

    ``n_files`` repartitions first (round-robin) to control file count /
    size; pre-partitioning by SURT key (``repartitionByRange`` on
    ``functions.canonicalize.surt_key``) instead gives domain-contiguous
    archives, mirroring the Common-Crawl CDX layout. At 100 TB the export
    is a single narrow map stage over the pages table — no shuffle unless
    the caller asked for one.

    ``path`` must be task-writable POSIX storage (local disk / NFS — the
    sandbox and test shape); an object-store deployment swaps the
    ``open``/``os.replace`` pair for its put-if-absent primitive, the
    rest is unchanged.
    """
    import os

    from pyspark.sql import functions as F

    if n_files is not None:
        df = df.repartition(n_files)
    cols = [url_col, ts_col, body_col]
    cols += [c for c in (mime_col, lang_col, status_col) if c]
    sel = df.select(*cols)
    names = {
        "url": url_col, "ts": ts_col, "body": body_col,
        "mime": mime_col, "lang": lang_col, "status": status_col,
    }
    ext = ".warc.gz" if compress else ".warc"
    os.makedirs(path, exist_ok=True)

    def _write(it):
        import pandas as pd
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        recs: list[bytes] = []
        for pdf in it:
            for r in pdf.itertuples(index=False):
                d = dict(zip(pdf.columns, r))
                url = d[names["url"]]
                ts = d[names["ts"]]
                # pd.isna, not `is not None`: a NULL warc_ts arrives as
                # NaT, which passed the None check and crashed strftime.
                # Sub-second timestamps keep their microseconds (the
                # documented scan∘export identity must not truncate);
                # whole seconds keep the compact historical format.
                if ts is None or pd.isna(ts):
                    date = "1970-01-01T00:00:00Z"
                else:
                    t = pd.Timestamp(ts)
                    fmt = (
                        "%Y-%m-%dT%H:%M:%S.%fZ"
                        if t.microsecond
                        else "%Y-%m-%dT%H:%M:%SZ"
                    )
                    date = t.strftime(fmt)
                body = d[names["body"]]
                body = bytes(body) if body is not None else b""
                mime = (
                    d.get(names["mime"]) if names["mime"] else None
                ) or "text/html"
                lang = d.get(names["lang"]) if names["lang"] else None
                status_raw = (
                    d.get(names["status"]) if names["status"] else None
                )
                # nullable int arrives as NaN (truthy!) — int(NaN) raises
                if status_raw is None or pd.isna(status_raw):
                    status_raw = 200
                status = int(status_raw)
                reason = "OK" if status == 200 else "Not Found" if (
                    status == 404
                ) else "Status"
                payload = http_response_payload(
                    status=status,
                    reason=reason,
                    body=body,
                    content_type=f"{mime}; charset=utf-8",
                    content_language=lang,
                )
                recs.append(
                    write_warc_record(
                        warc_type="response",
                        url=url,
                        date=date,
                        payload=payload,
                    )
                )
        if not recs:
            yield pd.DataFrame(
                {"warc_file": [], "n_records": [], "n_bytes": []}
            )
            return
        blob = write_warc(recs, compress=compress)
        fname = f"part-{pid:05d}{ext}"
        final = os.path.join(path, fname)
        tmp = final + f".inprogress-{os.getpid()}"
        with open(tmp, "wb") as f:
            f.write(blob)
        os.replace(tmp, final)
        yield pd.DataFrame(
            {
                "warc_file": [fname],
                "n_records": [len(recs)],
                "n_bytes": [len(blob)],
            }
        )

    manifest_rows = sel.mapInPandas(
        _write, "warc_file string, n_records long, n_bytes long"
    ).collect()
    # reclaim container files this export did not produce (a previous
    # larger or crashed export's parts): warc_scan globs *.warc* — stale
    # parts would otherwise resurface as rows the manifest never
    # describes, silently breaking the scan∘export identity. Runs after
    # every new part landed (atomic renames), before the manifest flips.
    keep = {r["warc_file"] for r in manifest_rows}
    for name in os.listdir(path):
        stale_part = (
            name.startswith("part-")
            and (name.endswith(".warc") or name.endswith(".warc.gz"))
            and name not in keep
        )
        # a SIGKILLed task's un-renamed temp also matches scan's *.warc*
        orphan_tmp = name.startswith("part-") and ".inprogress-" in name
        if stale_part or orphan_tmp:
            try:
                os.remove(os.path.join(path, name))
            except OSError:
                pass
    spark = df.sparkSession
    manifest = spark.createDataFrame(
        manifest_rows or [],
        "warc_file string, n_records long, n_bytes long",
    )
    manifest.coalesce(1).write.mode("overwrite").parquet(
        os.path.join(path, "_manifest")
    )
    return manifest


# -- parser ------------------------------------------------------------------


def iter_warc_records(data: bytes) -> Iterator[tuple[dict, bytes]]:
    """Yield ``(headers, payload)`` per record. Headers are lower-cased
    name → value. Gzip input (single- or multi-member) is transparently
    decompressed. Malformed envelopes raise ``ValueError`` — a corrupt
    container should fail the file loudly, not silently drop records."""
    if data[:2] == _GZIP_MAGIC:
        data = gzip.decompress(data)  # handles concatenated members
    pos, n = 0, len(data)
    while pos < n:
        # tolerate separator CRLFs / trailing padding between records
        while pos < n and data[pos : pos + 2] == _CRLF:
            pos += 2
        if pos >= n:
            break
        eol = data.find(_CRLF, pos)
        if eol < 0 or not data[pos:eol].startswith(b"WARC/"):
            raise ValueError(
                f"malformed WARC version line at byte {pos}: "
                f"{data[pos : pos + 24]!r}"
            )
        headers: dict[str, str] = {}
        pos = eol + 2
        while True:
            eol = data.find(_CRLF, pos)
            if eol < 0:
                raise ValueError("truncated WARC header block")
            line = data[pos:eol]
            pos = eol + 2
            if not line:
                break
            k, sep, v = line.partition(b":")
            if not sep:
                raise ValueError(f"malformed WARC header line: {line!r}")
            headers[k.strip().lower().decode("ascii")] = v.strip().decode(
                "utf-8", "replace"
            )  # UTF-8 values: non-ASCII Target-URIs round-trip (writer twin)
        try:
            length = int(headers["content-length"])
        except (KeyError, ValueError):
            raise ValueError("WARC record without valid Content-Length")
        if pos + length > n:
            raise ValueError("truncated WARC payload")
        yield headers, data[pos : pos + length]
        pos += length


_CHARSET_RE = re.compile(r"charset\s*=\s*\"?([A-Za-z0-9_-]+)", re.I)
_STATUS_RE = re.compile(rb"^HTTP/\d\.\d\s+(\d{3})")


def parse_warc_responses(data: bytes, warc_file: str = "") -> Iterator[dict]:
    """Rows for ``WARC-Type: response`` + ``application/http`` records;
    everything else (request/metadata/revisit/warcinfo) is skipped by the
    envelope walk without touching its payload."""
    for headers, payload in iter_warc_records(data):
        if headers.get("warc-type") != "response":
            continue
        if "application/http" not in headers.get("content-type", ""):
            continue
        split = payload.find(_CRLF + _CRLF)
        if split < 0:
            raise ValueError("HTTP payload without header/body separator")
        head, body = payload[:split], payload[split + 4 :]
        m = _STATUS_RE.match(head)
        status = int(m.group(1)) if m else None
        mime, charset, lang = None, None, None
        for line in head.split(_CRLF)[1:]:
            k, sep, v = line.partition(b":")
            if not sep:
                continue
            key = k.strip().lower()
            val = v.strip().decode("ascii", "replace")
            if key == b"content-type":
                mime = val.split(";")[0].strip().lower() or None
                cm = _CHARSET_RE.search(val)
                if cm:
                    charset = cm.group(1)
            elif key == b"content-language":
                lang = val or None
        text = None
        if mime is not None and mime.startswith("text/"):
            try:
                text = body.decode(charset or "utf-8", "replace")
            except LookupError:  # unknown charset label → spec fallback
                text = body.decode("utf-8", "replace")
        ts = None
        raw_ts = headers.get("warc-date")
        if raw_ts:
            # naive-UTC like the rest of the engine's TimestampType columns
            ts = datetime.fromisoformat(raw_ts.replace("Z", "+00:00")).astimezone(
                timezone.utc
            ).replace(tzinfo=None)
        yield {
            "url": headers.get("warc-target-uri"),
            "warc_ts": ts,
            "html": body,
            "text": text,
            "lang": lang,
            "status": status,
            "mime": mime,
            "warc_file": warc_file,
        }


# -- Spark scan ---------------------------------------------------------------


def warc_scan(
    spark_or_df: SparkSession | DataFrame,
    path: str | None = None,
) -> DataFrame:
    """WARC files → the input table. Two call shapes:

    - ``warc_scan(spark, "/data/*.warc.gz")`` — ``binaryFile`` reader over
      the glob; each file is one task-side parse (Common-Crawl WARCs are
      ~1 GB, the natural partition grain — at 100 TB that is ~10⁵ files
      and the scan parallelizes per file with zero shuffle).
    - ``warc_scan(df)`` — a DataFrame with ``(path: string, content:
      binary)`` columns, for containers already staged in a table.
    """
    import pandas as pd

    if isinstance(spark_or_df, DataFrame):
        files = spark_or_df.select("path", "content")
    else:
        if path is None:
            raise ValueError("warc_scan(spark, path): path is required")
        files = (
            spark_or_df.read.format("binaryFile")
            .option("pathGlobFilter", "*.warc*")
            .load(path)
            .select("path", "content")
        )

    def _parse(batches):
        for pdf in batches:
            rows = []
            for fp, blob in zip(pdf["path"], pdf["content"]):
                rows.extend(parse_warc_responses(bytes(blob), warc_file=fp))
            yield pd.DataFrame(
                rows, columns=[f.name for f in WARC_SCHEMA.fields]
            )

    return files.mapInPandas(_parse, schema=WARC_SCHEMA)
