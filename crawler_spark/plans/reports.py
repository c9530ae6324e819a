"""Reporting jobs re-expressing the reference's ops tooling as DataFrame
aggregations (SURVEY.md §3.2, §2.4 A4, §2.7 U3 / §2.1 S14).

* ``fields_report`` — the ``--list-fields`` job (fields-lister.js:27-64):
  union of field labels across all records, per-label record count, a
  deterministic sample value, and the multi-value count (the post-merge
  signal of the reference's duplicate-label warning, fields-lister.js:33-39).
* ``fields_report_markdown`` — the md renderer (fields-lister.js:67-98),
  600-char truncation included; driver-side on the (small) report.
* ``missing_images`` — the SPARQL completeness audit
  (scripts/check-silknow-urls.py:23-48): image URLs referenced by records
  EXCEPT urls present in the assets table, both directions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def fields_report(records: DataFrame) -> DataFrame:
    """records(fields ARRAY<STRUCT<label,values>>) → per-label stats.

    One explode + one hash aggregation; Catalyst does partial+final, so at
    10^10 records the shuffle carries only per-label partials.
    """
    f = records.select(F.explode("fields").alias("f"))
    return f.groupBy(F.col("f.label").alias("label")).agg(
        F.count("*").alias("n_records"),
        # first non-empty sample, deterministic (min) — fields-lister
        # prefers a non-empty example value (fields-lister.js:42-64)
        F.min(
            F.when(
                F.size("f.values") > 0, F.element_at("f.values", 1)
            )
        ).alias("sample_value"),
        F.sum(
            F.when(F.size("f.values") > 1, 1).otherwise(0)
        ).alias("n_multi_value"),
    )


def fields_report_markdown(report: DataFrame, truncate: int = 600) -> str:
    """Render the (small) report driver-side as a markdown table —
    fields-lister.js:67-98 incl. the 600-char truncation."""
    rows = sorted(report.collect(), key=lambda r: r["label"])
    lines = ["| label | records | multi-value | sample |", "|---|---|---|---|"]
    for r in rows:
        sample = (r["sample_value"] or "").replace("|", "\\|").replace("\n", " ")
        if len(sample) > truncate:
            sample = sample[:truncate] + "…"
        lines.append(
            f"| {r['label']} | {r['n_records']} | {r['n_multi_value']} | {sample} |"
        )
    return "\n".join(lines)


def missing_images(records: DataFrame, assets: DataFrame) -> DataFrame:
    """Set-difference audit both directions (U3):
    ``referenced_not_stored`` — image URLs in records without an asset row;
    ``stored_not_referenced`` — asset rows no record references."""
    referenced = records.select(
        F.explode("images").alias("img")
    ).select(F.col("img.url").alias("url")).distinct()
    stored = assets.select("url").distinct()
    a = referenced.exceptAll(stored).select(
        F.lit("referenced_not_stored").alias("direction"), "url"
    )
    b = stored.exceptAll(referenced).select(
        F.lit("stored_not_referenced").alias("direction"), "url"
    )
    return a.unionByName(b)
