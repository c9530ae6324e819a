"""Engine table schemas (SURVEY.md §1.4).

Fixed StructTypes — deliberately the opposite of the reference's schemaless
JSON-per-record files (silknow/crawler ``src/models/record.js:1-11``): what we
preserve are the *semantics* (field-merge promotion, per-record image URL
dedup, URL-seen skip), not the storage format.
"""

from __future__ import annotations

from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# Input corpus (authoritative shape: BASELINE.json input_hint) — one row per
# fetchable URL, Common-Crawl-style.
PAGES = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("warc_ts", T.TimestampType(), True),
        T.StructField("html", T.BinaryType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("lang", T.StringType(), True),
    ]
)

# ---------------------------------------------------------------------------
# Frontier — the explicit version of the reference's implicit pagination
# counters + seed lists + related queues (base.js:19-23,59-65).
# Ordering tuple (seed_idx, page_no, in_page_idx, dfs_rank) reproduces the
# reference's deterministic sequential visit order under any parallelism.
FRONTIER = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("url_hash", T.LongType(), False),
        T.StructField("host", T.StringType(), False),
        T.StructField("depth", T.IntegerType(), False),
        T.StructField("score", T.DoubleType(), False),
        T.StructField("seed_idx", T.IntegerType(), False),
        T.StructField("page_no", T.IntegerType(), False),
        T.StructField("in_page_idx", T.IntegerType(), False),
        T.StructField("dfs_rank", T.IntegerType(), False),
        T.StructField("round_added", T.IntegerType(), False),
        T.StructField("attempts", T.IntegerType(), False),
        # earliest round this row may be popped — retry backoff lands here
        # (delay_round = round + 2^(attempts-1), the §2.9 mapping of the
        # reference's exponential retry delay, base.js:46-56)
        T.StructField("not_before", T.IntegerType(), False),
        T.StructField("kind", T.StringType(), False),  # search | record | related
        T.StructField("connector_id", T.StringType(), False),
    ]
)

URL_SEEN = T.StructType([T.StructField("url_hash", T.LongType(), False)])

# opt-in per-round link-graph edges (EngineConfig.persist_link_graph):
# hashes only — the frontier/records tables hold the url strings, and an
# offline scorer (operators/opic.py:pagerank) needs only identity
LINK_GRAPH = T.StructType(
    [
        T.StructField("src_hash", T.LongType(), False),
        T.StructField("dst_hash", T.LongType(), False),
    ]
)

# Bloom sidecar: one row per hash-bucket partition (SURVEY.md §4.3.2).
SEEN_BLOOM = T.StructType(
    [
        T.StructField("partition_id", T.IntegerType(), False),
        T.StructField("bits", T.BinaryType(), False),
        T.StructField("n_items", T.LongType(), False),
    ]
)

# ---------------------------------------------------------------------------
# Output record — reference Record model (record.js:1-11): fields keep
# DOM/input order; values arrays come from addField's scalar→array promotion
# (record.js:29-36); images are URL-deduped per record (record.js:47-50).
FIELD = T.StructType(
    [
        T.StructField("label", T.StringType(), False),
        T.StructField("values", T.ArrayType(T.StringType()), False),
    ]
)

IMAGE = T.StructType(
    [
        T.StructField("id", T.StringType(), True),
        T.StructField("url", T.StringType(), False),
        T.StructField("title", T.StringType(), True),
        T.StructField("description", T.StringType(), True),
        T.StructField("author", T.StringType(), True),
        T.StructField("license", T.StringType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("localFilename", T.StringType(), True),
        T.StructField("hasError", T.BooleanType(), True),
    ]
)

RECORDS = T.StructType(
    [
        T.StructField("connector_id", T.StringType(), False),
        T.StructField("id", T.StringType(), False),
        T.StructField("url", T.StringType(), False),
        T.StructField("fields", T.ArrayType(FIELD), False),
        T.StructField("images", T.ArrayType(IMAGE), False),
        # original response blob for connectors that keep it
        # (paris-musees.js:164-165 record.raw)
        T.StructField("raw", T.StringType(), True),
        # crawl-order parity tuple (SURVEY.md §4.3.3)
        T.StructField("seed_idx", T.IntegerType(), False),
        T.StructField("page_no", T.IntegerType(), False),
        T.StructField("in_page_idx", T.IntegerType(), False),
        T.StructField("dfs_rank", T.IntegerType(), False),
    ]
)

# Extracted text per url — byte-identical to the reference extraction
# (north_star gate).
WEBTEXT = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("text", T.StringType(), True),
        T.StructField("lang", T.StringType(), True),
        T.StructField("warc_ts", T.TimestampType(), True),
    ]
)

FETCH_LOG = T.StructType(
    [
        T.StructField("round", T.IntegerType(), False),
        T.StructField("url", T.StringType(), False),
        T.StructField("status", T.IntegerType(), True),
        T.StructField("error", T.StringType(), True),
        T.StructField("bytes", T.LongType(), True),
        T.StructField("duration_ms", T.DoubleType(), True),
        T.StructField("partition_id", T.IntegerType(), True),
    ]
)

# ---------------------------------------------------------------------------
# Config tables: the ~21 museum connectors collapse into rows (north_star).
SEEDS = T.StructType(
    [
        T.StructField("connector_id", T.StringType(), False),
        T.StructField("seed_idx", T.IntegerType(), False),
        T.StructField("url", T.StringType(), False),
        T.StructField("paging_style", T.StringType(), False),  # page|offset|unknown_total
        T.StructField("limit", T.IntegerType(), False),
        T.StructField("start_page", T.IntegerType(), False),
        T.StructField("max_offset", T.IntegerType(), True),
        # none | after_parent_write (met/risd) | before_parent_write (joconde)
        T.StructField("related_policy", T.StringType(), False),
    ]
)

POLITENESS = T.StructType(
    [
        T.StructField("host", T.StringType(), False),
        T.StructField("crawl_delay_ms", T.LongType(), False),
        T.StructField("budget_per_round", T.IntegerType(), False),
        T.StructField("disallow", T.ArrayType(T.StringType()), True),
    ]
)
