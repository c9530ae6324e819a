"""Asset (image) sink pipeline — S12/S13/A5/F6/J3 from SURVEY.md §2.

Reference semantics re-expressed over tables:

* ``image_targets`` — per-record image position → ``<id>_<index>.jpg``
  filename (A5, base.js:203-205) with the filenamify reserved-char policy
  (F6, base.js:124: reserved chars → '!').
* ``fetch_assets`` — the downloadFile sink (S12, base.js:116-146):
  skip-if-exists = left-anti join vs the existing assets table
  (base.js:135-138), fetch = equi-join against a (url, bytes) source,
  magic-byte validation (S13, base.js:212-217) sets ``has_error`` exactly
  like ``imageType(buf) === null ⇒ image.hasError = true``.
* ``recheck_errored`` — the ``--check-images`` job (J3,
  images-checker.js:22-44): semi-select errored assets, refetch, clear the
  flag on success, keep everything else untouched (MERGE-shaped union).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from crawler_spark.functions.multimodal import image_type_valid

# filenamify's reserved set (base.js:124 uses the filenamify package):
# <>:"/\|?* and control chars → '!'
_FILENAMIFY_RE = r'[<>:"/\\|?*\x00-\x1f]'


def filenamify(col: F.Column) -> F.Column:
    return F.regexp_replace(col, _FILENAMIFY_RE, "!")


def image_targets(records: DataFrame) -> DataFrame:
    """records → one row per (record, image index): url + local filename.

    ``posexplode`` preserves the in-record image order that names files
    ``<id>_<index>.jpg`` (A5). When the records carry a ``connector_id``,
    filenames are namespaced ``<connector_id>/<id>_<index>.jpg`` — the
    reference writes each museum's downloads into its own directory
    (base.js:124-138), and a flat namespace would let two connectors'
    records with the same id collide on filename, where the within-run
    filename dedup silently discards one record's image.
    """
    has_conn = "connector_id" in records.columns
    base = records.select(
        *(["connector_id"] if has_conn else []),
        F.col("id").alias("record_id"),
        F.posexplode("images").alias("img_idx", "img"),
    )
    fname = F.concat(
        filenamify(F.col("record_id")),
        F.lit("_"),
        F.col("img_idx").cast("string"),
        F.lit(".jpg"),
    )
    if has_conn:
        fname = F.concat(
            filenamify(F.col("connector_id")), F.lit("/"), fname
        )
    return base.select(
        "record_id",
        "img_idx",
        F.col("img.url").alias("url"),
        fname.alias("filename"),
    )


def fetch_assets(
    targets: DataFrame,
    source: DataFrame,
    existing: DataFrame | None = None,
) -> DataFrame:
    """Fetch image bytes for targets, skipping already-stored urls.

    ``source`` is a (url, bytes) table (fixture corpus or a prior fetch
    stage's output); live mode swaps the join for a host-grouped
    ``mapInPandas`` HTTP stage exactly like the page fetcher. A target url
    missing from the source is an error row (null bytes), matching the
    reference's catch-and-flag path (base.js:218-222).
    """
    if existing is not None:
        # skip-if-exists keys on the destination FILE, not the source url
        # (base.js:135-138 existsSync on <recordId>_<index>.jpg): two records
        # sharing an image url still each get their own file
        targets = targets.join(
            existing.select(F.col("filename").alias("__e_fname")),
            targets["filename"] == F.col("__e_fname"),
            "left_anti",
        )
    # within-run dedup also keys on filename (first write wins); shared urls
    # across records survive as separate rows
    targets = targets.dropDuplicates(["filename"])
    fetched = targets.join(source.select("url", "bytes"), "url", "left")
    valid = image_type_valid(F.col("bytes"))
    return fetched.select(
        "url",
        "record_id",
        "img_idx",
        "filename",
        "bytes",
        (F.col("bytes").isNull() | ~valid).alias("has_error"),
    )


def recheck_errored(assets: DataFrame, source: DataFrame) -> DataFrame:
    """images-checker (J3): refetch errored assets; on success replace the
    row and clear the flag, else keep the errored row. Non-errored rows are
    untouched. At scale this is an Iceberg MERGE INTO; the parquet fallback
    expresses the same row-level update as anti-join + union."""
    ok = assets.where(~F.col("has_error"))
    errored = assets.where(F.col("has_error"))
    refetched = errored.drop("bytes").join(
        source.select("url", F.col("bytes").alias("__new_bytes")), "url", "left"
    )
    valid = image_type_valid(F.col("__new_bytes"))
    repaired = refetched.select(
        "url",
        "record_id",
        "img_idx",
        "filename",
        F.col("__new_bytes").alias("bytes"),
        (F.col("__new_bytes").isNull() | ~valid).alias("has_error"),
    )
    return ok.unionByName(repaired)
