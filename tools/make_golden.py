"""Materialize the crawl-e2e golden table from the pure-Python replay oracle.

The ``crawl_e2e_webtext`` driver query runs the full CrawlEngine over a
deterministic synthetic site (no dependence on sf_dir). Its independent
oracle is ``crawler_spark.oracle.replay`` — the sequential reference-semantics
replay. This script replays the exact same SiteSpec and writes the resulting
webtext table to ``tests/fixtures/crawl_e2e_webtext_golden.parquet`` (single
file, µs timestamps) so the driver's DuckDB can ``read_parquet`` it and
value-hash the engine output against it.

Regenerate after any change to sitegen/replay semantics:
    python tools/make_golden.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from crawler_spark.oracle.replay import replay
from crawler_spark.sources.sitegen import generate_site

OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "tests", "fixtures", "crawl_e2e_webtext_golden.parquet",
)


def main() -> None:
    # the ONE shared spec — imported from the driver contract so the golden
    # can never drift from the query it oracles
    from __spark_entry__ import _e2e_sitespec

    site = generate_site(_e2e_sitespec())
    pages_pd = site["pages"]
    pages = {r["url"]: r["html"] for _, r in pages_pd.iterrows()}
    meta = {
        r["url"]: (r["lang"], r["warc_ts"]) for _, r in pages_pd.iterrows()
    }
    seeds = site["seeds"].to_dict("records")
    res = replay(pages, seeds, cfg=site["connectors"])

    rows = []
    for url, text in res.webtext.items():
        lang, warc_ts = meta[url]
        rows.append({"url": url, "text": text, "lang": lang, "warc_ts": warc_ts})
    df = pd.DataFrame(rows, columns=["url", "text", "lang", "warc_ts"])
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    table = pa.Table.from_pandas(df, preserve_index=False)
    pq.write_table(table, OUT, coerce_timestamps="us")
    print(f"wrote {len(df)} rows to {OUT}")


if __name__ == "__main__":
    main()
