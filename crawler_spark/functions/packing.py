"""Sequence packing — assign every document a deterministic byte/token
offset in the concatenated per-language training stream, so fixed-length
training sequences (concat-and-chunk, the GPT-style packing) can be cut
without any sequential pass.

Semantics (the naive definition both engines can check): within each
language, order docs by ``(order_hash(doc_id), doc_id)`` — the same
Knuth-hash shuffle order the quota sampler uses, so sampling and packing
agree on the stream order — and give each doc
``start_offset = exclusive running sum of its token count``. The training
sequence a doc starts in is ``seq_id = start_offset div seq_len``; a doc
may straddle a boundary (concat-and-chunk cuts mid-document by design).

At-scale plan — the naive form is a per-language global window (one task
per language; a 40 TB English split funnels through one core). Instead the
same distributed two-phase prefix-sum as ``sampling.quota_sample``:

1. range-bucket the hash key (bucket order == stream order);
2. ONE map-side-combined agg to (lang, bucket) token totals — bounded,
   collected to the driver;
3. driver prefix-sum yields each bucket's starting offset, broadcast back;
4. the intra-bucket exclusive cumsum runs in a window partitioned by
   (lang, bucket) — n_langs × n_buckets independent partitions, each
   ~1/n_buckets of its language.

Unlike the sampler, every bucket keeps all its rows (packing drops
nothing), so phase 4 windows over every bucket — but each is a bounded
slice, and all integer arithmetic, so the result is bit-identical to the
naive definition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .sampling import HASH_SPACE, order_hash
from .textstats import token_count


def pack_sequences(
    df: DataFrame,
    seq_len: int,
    lang_col: str = "lang",
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 1024,
) -> DataFrame:
    """Concat-and-chunk packing offsets (see module docstring).

    Returns ``(id_col, lang_col, n_tokens, start_offset, seq_id)`` for
    every input doc. ``start_offset`` is the doc's position (in tokens) in
    its language's concatenated stream; ``seq_id`` = start_offset div
    seq_len.
    """
    if seq_len < 1:
        raise ValueError("seq_len must be >= 1")
    if HASH_SPACE % n_buckets:
        raise ValueError("n_buckets must divide 2^32 (use a power of two)")
    width = HASH_SPACE // n_buckets

    base = df.select(
        F.col(id_col).alias("__id"),
        F.col(lang_col).alias("__lang"),
        token_count(F.col(text_col)).cast("long").alias("n_tokens"),
        order_hash(F.col(id_col)).alias("__h"),
    ).withColumn("__b", F.expr(f"__h div {width}"))

    # phase 1: bounded (lang, bucket) totals
    summary = (
        base.groupBy("__lang", "__b")
        .agg(F.sum("n_tokens").alias("t"))
        .collect()
    )

    # phase 2: driver prefix-sum -> per-bucket starting offsets
    by_lang: dict[str, list] = {}
    for r in summary:
        by_lang.setdefault(r["__lang"], []).append((r["__b"], r["t"]))
    offsets = []
    for lg, buckets in by_lang.items():
        cum = 0
        for b, t in sorted(buckets):
            offsets.append((lg, b, cum))
            cum += t

    spark = df.sparkSession
    if not offsets:
        return base.select(
            F.col("__id").alias(id_col),
            F.col("__lang").alias(lang_col),
            "n_tokens",
            F.lit(0).cast("long").alias("start_offset"),
            F.lit(0).cast("long").alias("seq_id"),
        ).limit(0)
    off = spark.createDataFrame(
        offsets, "__lang string, __b long, bucket_offset long"
    )

    # phase 3/4: broadcast offsets back; exclusive cumsum inside each
    # (lang, bucket) slice only
    win = (
        Window.partitionBy("__lang", "__b")
        .orderBy("__h", "__id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    start = F.col("bucket_offset") + F.coalesce(
        F.sum("n_tokens").over(win), F.lit(0)
    )
    return (
        base.join(F.broadcast(off), ["__lang", "__b"])
        .withColumn("start_offset", start.cast("long"))
        .select(
            F.col("__id").alias(id_col),
            F.col("__lang").alias(lang_col),
            "n_tokens",
            "start_offset",
            # integer div — double division truncates past 2^53 offsets
            F.expr(f"start_offset div {int(seq_len)}").alias("seq_id"),
        )
    )


def pack_sequences_naive(
    df: DataFrame,
    seq_len: int,
    lang_col: str = "lang",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Reference single-window form (one task per language — test oracle
    only, never the production path; parity-pinned in tests)."""
    win = (
        Window.partitionBy(lang_col)
        .orderBy("__h", id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        df.select(
            id_col,
            lang_col,
            token_count(F.col(text_col)).cast("long").alias("n_tokens"),
            order_hash(F.col(id_col)).alias("__h"),
        )
        .withColumn(
            "start_offset",
            F.coalesce(F.sum("n_tokens").over(win), F.lit(0)).cast("long"),
        )
        .select(
            id_col,
            lang_col,
            "n_tokens",
            "start_offset",
            F.expr(f"start_offset div {int(seq_len)}").alias("seq_id"),
        )
    )
