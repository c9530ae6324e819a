"""Sequence packing: distributed two-phase prefix-sum vs the naive
single-window definition — exact identity — plus boundary semantics."""

import pytest
from pyspark.sql import functions as F

from crawler_spark.functions.packing import (
    pack_sequences,
    pack_sequences_naive,
)


def _docs(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id long, lang string, text string"
    )


def _rows(df):
    return sorted(
        (r["lang"], r["doc_id"], r["n_tokens"], r["start_offset"], r["seq_id"])
        for r in df.collect()
    )


def test_matches_naive_across_bucket_counts(spark):
    rows = [
        (i, ["en", "fr", "de"][i % 3], " ".join(["w"] * ((i * 11) % 37)))
        for i in range(300)
    ]
    df = _docs(spark, rows)
    want = _rows(pack_sequences_naive(df, seq_len=64))
    for n_buckets in (4, 64, 1024):
        got = _rows(pack_sequences(df, seq_len=64, n_buckets=n_buckets))
        assert got == want and got, f"n_buckets={n_buckets}"


def test_offsets_are_a_dense_stream_per_lang(spark):
    rows = [(i, "en", " ".join(["w"] * 10)) for i in range(50)]
    out = pack_sequences(_docs(spark, rows), seq_len=32).collect()
    # stream order: sort by start_offset; offsets must be the exclusive
    # prefix sums of the token counts with no gaps or overlaps
    out.sort(key=lambda r: r["start_offset"])
    cum = 0
    for r in out:
        assert r["start_offset"] == cum
        assert r["seq_id"] == cum // 32
        cum += r["n_tokens"]
    assert cum == 500


def test_docs_straddle_boundaries(spark):
    # 10-token docs into 16-token sequences: every other doc straddles
    rows = [(i, "en", " ".join(["w"] * 10)) for i in range(8)]
    out = pack_sequences(_docs(spark, rows), seq_len=16).collect()
    seq_ids = sorted(r["seq_id"] for r in out)
    # offsets 0,10,..,70 -> seq ids 0,0,1,1,2,3,3,4
    assert seq_ids == [0, 0, 1, 1, 2, 3, 3, 4]


def test_zero_token_docs_keep_their_slot(spark):
    rows = [(0, "en", "a b c"), (1, "en", "   "), (2, "en", "d e")]
    out = {r["doc_id"]: r for r in
           pack_sequences(_docs(spark, rows), seq_len=4).collect()}
    assert out[1]["n_tokens"] == 0
    total = sum(r["n_tokens"] for r in out.values())
    assert total == 5
    # zero-token doc occupies a zero-width slot: some other doc shares
    # its start offset; all three rows still present
    assert len(out) == 3


def test_validation(spark):
    df = _docs(spark, [(0, "en", "a")])
    with pytest.raises(ValueError):
        pack_sequences(df, seq_len=0)
    with pytest.raises(ValueError):
        pack_sequences(df, seq_len=8, n_buckets=3)


def test_no_global_window_in_plan(spark):
    # the scale contract: no window partitioned by lang alone — every
    # window in the plan must include the bucket key
    rows = [(i, "en", "w w w") for i in range(20)]
    df = pack_sequences(_docs(spark, rows), seq_len=8, n_buckets=16)
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    for line in plan.splitlines():
        if "Window" in line and "windowspecdefinition" in line:
            assert "__b" in line, line
