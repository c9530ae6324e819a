"""SURT key + range-partitioned CDX index write."""

import glob

from pyspark.sql import functions as F

from crawler_spark.functions.canonicalize import surt_key, write_cdx_index


def _keys(spark, urls):
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    return [
        r["k"] for r in df.select(surt_key(F.col("url")).alias("k")).collect()
    ]


def test_surt_key_forms(spark):
    got = _keys(
        spark,
        [
            "https://www.Example.COM/shop/1?id=2",
            "http://example.com",
            "http://a.b.example.com:8080/x",
            "https://user:pw@example.com:443/y#frag",
            "http://www2.example.com/z?b=2&a=1",
        ],
    )
    assert got == [
        "com,example)/shop/1?id=2",
        "com,example)/",
        "com,example,b,a:8080)/x",
        "com,example)/y",
        "com,example)/z?b=2&a=1",
    ]


def test_surt_domain_contiguity(spark):
    """Same registrable domain sorts contiguously: every example.com URL
    (any subdomain) lands between com,example and com,example~ — the
    property that makes the CDX index range-prunable per domain."""
    urls = [
        "http://example.com/a",
        "http://sub.example.com/b",
        "http://examplf.com/x",
        "http://an-example.org/y",
        "http://deep.sub.example.com/c",
    ]
    ks = sorted(_keys(spark, urls))
    in_domain = [k for k in ks if k.startswith("com,example,") or
                 k.startswith("com,example)")]
    lo, hi = ks.index(in_domain[0]), ks.index(in_domain[-1])
    assert ks[lo:hi + 1] == in_domain  # contiguous run


def test_write_cdx_index(spark, tmp_path):
    rows = [(f"http://h{i % 37}.example.com/p/{i}",) for i in range(2000)]
    df = spark.createDataFrame(rows, "url string")
    out = str(tmp_path / "cdx")
    write_cdx_index(df, out, n_partitions=8)
    files = sorted(glob.glob(out + "/part-*.parquet"))
    assert len(files) > 1
    # each file internally sorted; files own disjoint, ordered surt ranges
    prev_max = None
    ranges = []
    for f in files:
        keys = [r["surt"] for r in spark.read.parquet(f).collect()]
        if not keys:
            continue
        assert keys == sorted(keys)
        ranges.append((keys[0], keys[-1]))
    for (a_lo, a_hi), (b_lo, b_hi) in zip(ranges, ranges[1:]):
        assert a_hi <= b_lo
    # round-trips every row
    assert spark.read.parquet(out).count() == 2000
