"""Deterministic token-quota sampling — the data-mix selection step that
follows the token census (``textstats.corpus_token_report``): given a
per-language token budget, keep a reproducible, order-stable prefix of each
language's documents whose running token sum stays within the budget.

Semantics (the naive single-window definition both engines can check):
order each language's docs by ``(h, doc_id)`` where
``h = (doc_id * 2654435761) mod 2^32`` (Knuth's multiplicative hash —
pure int64 arithmetic, bit-identical in any engine; ids must stay below
~3.4e9 so the product fits in int64), and keep a doc iff its inclusive
running token sum is <= the language's quota. Languages absent from the
quota map are dropped (an explicit mix, not a default keep).

At-scale plan — the naive form is a per-language global window, i.e. ONE
task per language no matter how many executors (a 40 TB English split
funnels through a single core). Instead, a distributed prefix-sum:

1. range-bucket the hash key: ``b = h div (2^32 / n_buckets)`` — bucket
   order IS hash order, so per-language bucket totals are prefix-summable;
2. ONE map-side-combined aggregation at (lang, bucket) grain — the summary
   is <= n_langs x n_buckets rows, collected to the driver (bounded,
   ~100 langs x 1024 buckets = 100k tiny rows);
3. driver prefix-sum picks each language's boundary bucket: buckets whose
   end-cumulative fits the quota keep ALL rows (no window at all), buckets
   past the boundary drop entirely (never shuffled), and only the single
   boundary bucket per language — ~1/n_buckets of that language — runs the
   intra-bucket running-sum window;
4. the per-bucket decision table broadcasts back as an equi-join.

So the full-table path is scan -> map-side agg -> broadcast-join filter;
the only window touches n_langs tiny partitions. Cost: the input is read
twice (once for the summary, once for the filtered pass) — at 100 TB two
column-pruned parquet scans beat one single-task-per-language window by
orders of magnitude.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .textstats import token_count

KNUTH_MULT = 2654435761  # 2^32 * golden-ratio conjugate, Knuth TAOCP v3 6.4
HASH_SPACE = 1 << 32


def order_hash(id_col: Column) -> Column:
    """Deterministic shuffle-order key: pure int64 arithmetic so any SQL
    engine reproduces it bit-for-bit (unlike xxhash64/md5 string forms)."""
    return F.pmod(id_col.cast("long") * F.lit(KNUTH_MULT), F.lit(HASH_SPACE))


def quota_sample(
    df: DataFrame,
    quotas: dict[str, int],
    lang_col: str = "lang",
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 1024,
) -> DataFrame:
    """Per-language token-quota prefix sample (see module docstring).

    Returns ``(id_col, lang_col, n_tokens)`` for every kept doc. Output
    equals the naive global-window definition exactly; only the physical
    plan differs (distributed two-phase prefix-sum, boundary-bucket-only
    window).
    """
    if HASH_SPACE % n_buckets:
        raise ValueError("n_buckets must divide 2^32 (use a power of two)")
    if not quotas:
        raise ValueError("quotas must name at least one language")
    width = HASH_SPACE // n_buckets

    lang = F.col(lang_col)
    base = (
        df.where(lang.isin(*quotas.keys()))
        .select(
            F.col(id_col).alias("__id"),
            lang.alias("__lang"),
            token_count(F.col(text_col)).cast("long").alias("n_tokens"),
            order_hash(F.col(id_col)).alias("__h"),
        )
        .withColumn("__b", F.expr(f"__h div {width}"))
    )

    # phase 1: bounded summary (<= n_langs x n_buckets rows)
    summary = (
        base.groupBy("__lang", "__b")
        .agg(F.sum("n_tokens").alias("t"))
        .collect()
    )

    # phase 2: driver prefix-sum -> per-(lang, bucket) decision rows
    by_lang: dict[str, list] = {}
    for r in summary:
        by_lang.setdefault(r["__lang"], []).append((r["__b"], r["t"]))
    decisions = []  # (lang, bucket, kind, offset, quota)
    for lg, buckets in by_lang.items():
        quota = int(quotas[lg])
        cum = 0
        for b, t in sorted(buckets):
            if cum + t <= quota:
                decisions.append((lg, b, "ALL", 0, quota))
                cum += t
            else:
                # first bucket whose end-cumulative exceeds the quota: the
                # per-doc window decides inside it; everything after is
                # already past the quota (running sum is monotone) — no
                # decision row, the inner join drops those buckets unread.
                decisions.append((lg, b, "BOUNDARY", cum, quota))
                break

    spark = df.sparkSession
    if not decisions:
        return base.select(
            F.col("__id").alias(id_col),
            F.col("__lang").alias(lang_col),
            "n_tokens",
        ).limit(0)
    dec = spark.createDataFrame(
        decisions,
        "__lang string, __b long, kind string, offset long, quota long",
    )

    joined = base.join(F.broadcast(dec), ["__lang", "__b"])
    keep_all = joined.where(F.col("kind") == "ALL")
    # one bucket per language -> n_langs partitions of ~1/n_buckets each
    win = Window.partitionBy("__lang").orderBy("__h", "__id")
    boundary = (
        joined.where(F.col("kind") == "BOUNDARY")
        .withColumn("__cum", F.sum("n_tokens").over(win))
        .where(F.col("offset") + F.col("__cum") <= F.col("quota"))
    )
    cols = ["__id", "__lang", "n_tokens"]
    return (
        keep_all.select(*cols)
        .unionByName(boundary.select(*cols))
        .select(
            F.col("__id").alias(id_col),
            F.col("__lang").alias(lang_col),
            "n_tokens",
        )
    )


def quota_sample_naive(
    df: DataFrame,
    quotas: dict[str, int],
    lang_col: str = "lang",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Reference single-window form (ONE task per language — test oracle
    only, never the production path; parity-pinned in tests)."""
    lang = F.col(lang_col)
    spark = df.sparkSession
    q = spark.createDataFrame(
        list(quotas.items()), f"{lang_col} string, quota long"
    )
    win = Window.partitionBy(lang_col).orderBy("__h", id_col)
    return (
        df.join(F.broadcast(q), lang_col)
        .select(
            id_col,
            lang_col,
            token_count(F.col(text_col)).cast("long").alias("n_tokens"),
            order_hash(F.col(id_col)).alias("__h"),
            "quota",
        )
        .withColumn("__cum", F.sum("n_tokens").over(win))
        .where(F.col("__cum") <= F.col("quota"))
        .select(id_col, lang_col, "n_tokens")
    )
