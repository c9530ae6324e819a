"""Redirect-chain resolution: pointer jumping vs a pure-Python walk —
terminal, hop count, cycle cut, and canonical-alias collapse."""

import pytest
from pyspark.sql import functions as F

from crawler_spark.operators.redirects import (
    canonical_alias_map,
    resolve_redirects,
)


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src string, dst string")


def _py_resolve(pairs, max_hops):
    nxt = dict(pairs)
    out = {}
    for s in nxt:
        cur, hops = nxt[s], 1
        while cur in nxt and hops < max_hops:
            cur = nxt[cur]
            hops += 1
        out[s] = (cur, hops, cur not in nxt)
    return out


def _spark_resolve(spark, pairs, max_hops=32):
    df = resolve_redirects(_edges(spark, pairs), max_hops=max_hops)
    return {
        r["src"]: (r["final_dst"], r["hops"], r["resolved"])
        for r in df.collect()
    }


def test_chains_of_every_length(spark):
    # chains u<k>_0 -> u<k>_1 -> ... -> u<k>_k for k = 1..20
    pairs = []
    for k in range(1, 21):
        pairs += [(f"u{k}_{i}", f"u{k}_{i+1}") for i in range(k)]
    got = _spark_resolve(spark, pairs)
    want = _py_resolve(pairs, 32)
    assert got == want
    # spot-check semantics, not just parity
    assert got["u20_0"] == ("u20_20", 20, True)
    assert got["u20_19"] == ("u20_20", 1, True)


def test_cycle_is_cut_not_looped(spark):
    pairs = [("a", "b"), ("b", "c"), ("c", "a"), ("x", "a")]
    got = _spark_resolve(spark, pairs, max_hops=8)
    # every walk that enters the cycle is unresolved with hops capped
    for src in ("a", "b", "c", "x"):
        final, hops, resolved = got[src]
        assert not resolved
        assert hops == 8
        assert final in ("a", "b", "c")


def test_self_loop(spark):
    got = _spark_resolve(spark, [("s", "s"), ("t", "s")], max_hops=4)
    assert got["s"][2] is False
    assert got["t"][2] is False  # lands in the self-loop


def test_mixed_fanin(spark):
    # many sources converging on one chain (the common web shape)
    pairs = [("m", "n"), ("n", "z")] + [(f"p{i}", "m") for i in range(10)]
    got = _spark_resolve(spark, pairs)
    assert got["m"] == ("z", 2, True)
    for i in range(10):
        assert got[f"p{i}"] == ("z", 3, True)


def test_max_hops_validation(spark):
    with pytest.raises(ValueError):
        resolve_redirects(_edges(spark, [("a", "b")]), max_hops=0)


def test_canonical_alias_map(spark):
    pages = spark.createDataFrame(
        [
            ("u1", "u1"),       # self-canonical: pruned
            ("u2", "u3"),       # chain u2 -> u3 -> u4
            ("u3", "u4"),
            ("u4", None),       # no canonical declared
            ("u5", "u2"),       # joins the chain
        ],
        "url string, canonical_url string",
    )
    got = {
        r["url"]: (r["canonical_final"], r["hops"], r["resolved"])
        for r in canonical_alias_map(pages).collect()
    }
    assert set(got) == {"u2", "u3", "u5"}  # u1/u4 never enter the map
    assert got["u2"] == ("u4", 2, True)
    assert got["u3"] == ("u4", 1, True)
    assert got["u5"] == ("u4", 3, True)


def test_extract_rel_canonical_variants(spark):
    from crawler_spark.operators.redirects import extract_rel_canonical

    base = "http://h.example.com/item/1"
    rows = [
        # (html, expected canonical)
        ("<html><body>no head link</body></html>", None),
        # rel-first, absolute, double quotes
        ('<link rel="canonical" href="http://h.example.com/canon/1">',
         "http://h.example.com/canon/1"),
        # href-first, root-relative, single quotes, uppercase tag+attrs
        ("<LINK HREF='/canon/2' REL='canonical'>",
         "http://h.example.com/canon/2"),
        # bare (unquoted) attribute values + &amp; entity in the query
        ("<link rel=canonical href=/canon/3?a=1&amp;b=2>",
         "http://h.example.com/canon/3?a=1&b=2"),
        # decoy non-canonical link first; target needs normalization
        # (scheme/host case, default port) and has a dot-segment
        ('<link rel="stylesheet" href="/s.css">'
         '<link rel="canonical" href="HTTP://H.Example.COM:80/x/../canon/4">',
         "http://h.example.com/canon/4"),
        # two canonical tags: first one wins (browser behavior)
        ('<link rel="canonical" href="/first">'
         '<link rel="canonical" href="/second">',
         "http://h.example.com/first"),
        # rel=canonicalize must NOT match (word boundary)
        ('<link rel="canonicalize" href="/nope">', None),
        # newline inside the tag
        ('<link rel="canonical"\n      href="/multi/line">',
         "http://h.example.com/multi/line"),
    ]
    pages = spark.createDataFrame(
        [(base, h) for h, _ in rows], "url string, html string"
    )
    got = [
        r["canonical_url"]
        for r in extract_rel_canonical(pages)
        .select("canonical_url")
        .collect()
    ]
    assert got == [want for _, want in rows]


def test_extract_rel_canonical_binary_html(spark):
    from crawler_spark.operators.redirects import extract_rel_canonical

    pages = spark.createDataFrame(
        [("http://b.example.com/p",
          '<link rel="canonical" href="/c">'.encode())],
        "url string, html binary",
    )
    assert (
        extract_rel_canonical(pages).first()["canonical_url"]
        == "http://b.example.com/c"
    )


def test_canonical_alias_map_from_html(spark):
    # one call: raw (url, html) pages table -> collapsed alias map,
    # including a canonical-of-canonical chain declared across pages
    pages = spark.createDataFrame(
        [
            ("http://s/u1", '<link rel="canonical" href="/u1">'),
            ("http://s/u2", '<link rel="canonical" href="/u3">'),
            ("http://s/u3", '<link rel="canonical" href="/u4">'),
            ("http://s/u4", "<p>terminal</p>"),
        ],
        "url string, html string",
    )
    got = {
        r["url"]: (r["canonical_final"], r["hops"], r["resolved"])
        for r in canonical_alias_map(pages, html_col="html").collect()
    }
    assert set(got) == {"http://s/u2", "http://s/u3"}
    assert got["http://s/u2"] == ("http://s/u4", 2, True)
    assert got["http://s/u3"] == ("http://s/u4", 1, True)


def test_lineage_is_cut_per_round(spark):
    # each doubling references the previous state twice, so WITHOUT the
    # per-round localCheckpoint the plan doubles per round (2^6 - 1 = 63
    # joins for max_hops=32); WITH it (the default) the final plan is the
    # last round's single join over checkpointed partitions
    edges = _edges(spark, [(f"c{i}", f"c{i+1}") for i in range(20)])
    unchecked = resolve_redirects(edges, max_hops=32, checkpoint=False)
    plan = unchecked._jdf.queryExecution().optimizedPlan().toString()
    assert plan.count("Join") == 63  # documents WHY checkpoint=True

    checked = resolve_redirects(edges, max_hops=32)
    plan = checked._jdf.queryExecution().optimizedPlan().toString()
    # lineage fully cut: the result reads the last round's checkpointed
    # partitions, no join tree left to re-execute
    assert plan.count("Join") == 0 and "LogicalRDD" in plan
    # and the checkpointed result is still correct
    got = {r["src"]: r["hops"] for r in checked.collect()}
    assert got["c0"] == 20
