"""Property + example tests for URL canonicalization (SURVEY.md §2.8 F1)."""

from hypothesis import given, settings
from hypothesis import strategies as st

from crawler_spark.functions.canonicalize import canonicalize_url, host_of


def test_examples():
    assert (
        canonicalize_url("HTTP://Example.COM:80/a/../b/./c?x=1#frag")
        == "http://example.com/b/c?x=1"
    )
    assert canonicalize_url("https://h.io:443/") == "https://h.io/"
    assert canonicalize_url("https://h.io:8443/p") == "https://h.io:8443/p"
    assert canonicalize_url("http://h.io") == "http://h.io/"
    assert canonicalize_url("http://h.io/%7Euser/%2fx") == "http://h.io/~user/%2Fx"
    # relative resolution (met-museum.js:8-11 url.resolve semantics)
    assert (
        canonicalize_url("/record/9", base="http://h.io/search?page=2")
        == "http://h.io/record/9"
    )
    assert canonicalize_url("../up", base="http://h.io/a/b/c") == "http://h.io/a/up"
    # non-fetchable schemes dropped
    assert canonicalize_url("mailto:x@y.z") is None
    assert canonicalize_url("javascript:void(0)") is None
    assert canonicalize_url(None) is None
    assert canonicalize_url("   ") is None


def test_drop_params():
    # versailles.js:156-187 strips width/height/bg resize params
    out = canonicalize_url(
        "http://h.io/iiif/img.jpg?width=100&id=7&height=50",
        drop_params=frozenset({"width", "height", "bg"}),
    )
    assert out == "http://h.io/iiif/img.jpg?id=7"


url_strategy = st.builds(
    lambda scheme, host, port, path, q: f"{scheme}://{host}{port}/{path}"
    + (f"?{q}" if q else ""),
    st.sampled_from(["http", "https", "HTTP", "Http"]),
    st.from_regex(r"[a-zA-Z0-9][a-zA-Z0-9.-]{0,20}[a-zA-Z0-9]", fullmatch=True),
    st.sampled_from(["", ":80", ":443", ":8080"]),
    st.from_regex(r"[a-zA-Z0-9_./%~-]{0,30}", fullmatch=True),
    st.from_regex(r"[a-zA-Z0-9=&_%-]{0,20}", fullmatch=True),
)


@settings(max_examples=200, deadline=None)
@given(url_strategy)
def test_idempotent(url):
    once = canonicalize_url(url)
    if once is not None:
        assert canonicalize_url(once) == once
        assert host_of(once) == host_of(once.upper().lower())


def test_spark_path(spark):
    """Vectorized UDF + JVM host/hash agree with the pure function."""
    from pyspark.sql import functions as F

    from crawler_spark.functions.canonicalize import with_canonical_url

    urls = [
        "HTTP://Example.COM:80/a/../b?x=1#f",
        "https://h0.Example.test/record/3",
        "mailto:skip@me",
    ]
    df = spark.createDataFrame([(u,) for u in urls], ["url"])
    rows = with_canonical_url(df).orderBy("url").collect()
    expected = sorted(u for u in (canonicalize_url(x) for x in urls) if u)
    assert [r["url"] for r in rows] == expected
    for r in rows:
        host = r["url"].split("://")[1].split("/")[0].split(":")[0]
        assert r["host"] == host
        assert isinstance(r["url_hash"], int)


def test_fast_path_equals_slow_path():
    """The vectorized already-canonical fast path must be EXACTLY the
    per-row function: for every input either the mask is off (slow path) or
    the url is a fixed point of canonicalize_url."""
    import pandas as pd

    from crawler_spark.functions.canonicalize import (
        _canonical_fixed_point_mask,
        _canonicalize_batch,
    )

    urls = [
        # canonical fixed points (fast path should take these)
        "http://h0.example.test/record/3",
        "https://a-b.c9.org/x/y;v=(z)/,@:!$&'*+=~._-",
        "http://h.io/p?a=1&b=2",
        "http://h.io/a//b",  # empty segment preserved
        # NOT fixed points — must route slow and still come out right
        "HTTP://Example.COM:80/a/../b?x=1#f",
        "http://h.io/a/./b",
        "http://h.io/a/..",
        "http://h.io/a/..?x=1",  # terminal dot-segment BEFORE a query
        "http://h.io/.?x=1",
        "http://h.io/a/./b?x=1",
        "http://host",  # no path → '/'
        "http://user@host/p",  # userinfo stripped by urlsplit
        "http://h.io/p?",  # empty query dropped
        "http://h.io/%7Euser",  # %7E → ~
        "http://HOST.example./p",  # trailing-dot + uppercase host
        "mailto:nope@x",  # non-fetchable → None
        "",
        None,
    ]
    s = pd.Series(urls, dtype="object")
    base = pd.Series([None] * len(urls), dtype="object")
    got = _canonicalize_batch(s, base, frozenset())
    want = [canonicalize_url(u, None, frozenset()) for u in urls]
    assert list(got) == want
    # every fast-path row really is a fixed point
    mask = _canonical_fixed_point_mask(s, base)
    for u, m in zip(urls, mask):
        if m:
            assert canonicalize_url(u, None, frozenset()) == u, u
    assert mask.sum() >= 4  # the canonical ones actually took the fast path


@given(st.text(min_size=0, max_size=60))
@settings(max_examples=300, deadline=None)
def test_fast_path_equals_slow_path_fuzz(raw):
    """Property: batch path == row path for arbitrary junk, with and
    without drop_params."""
    import pandas as pd

    from crawler_spark.functions.canonicalize import _canonicalize_batch

    for prefix in ("", "http://", "http://h.io/"):
        u = prefix + raw
        s = pd.Series([u], dtype="object")
        b = pd.Series([None], dtype="object")
        for dp in (frozenset(), frozenset({"utm"})):
            got = _canonicalize_batch(s, b, dp)
            assert got.iloc[0] == canonicalize_url(u, None, dp)


messy_url_strategy = st.builds(
    lambda scheme, user, host, port, path, q, frag: (
        f"{scheme}://{user}{host}{port}{path}{q}{frag}"
    ),
    st.sampled_from(["http", "https", "HTTP", "hTTps", "ftp", "web+x"]),
    st.sampled_from(["", "user@", "a:b@"]),
    st.sampled_from(
        ["Example.COM", "h0.test", "h.io.", "[::1]", "a:b:c", "", "ho st"]
    ),
    st.sampled_from(["", ":80", ":443", ":0080", ":8080", ":", ":99999999",
                     ":0"]),
    st.sampled_from(
        ["", "/", "/a/./b", "/a/../b", "/a/..", "/%7Euser", "/a\tb",
         "/x//y/", "/a/.", "/."]
    ),
    st.sampled_from(["", "?", "?a=1&utm=x", "?%41=1", "?a=1&&b=2", "?utm=x"]),
    st.sampled_from(["", "#f", "#a#b"]),
)


@given(messy_url_strategy, st.sampled_from([None, "", "http://base.io/dir/"]))
@settings(max_examples=500, deadline=None)
def test_vectorized_messy_path_equals_pure(url, base):
    """Property: the staged-vectorized messy path (_canonicalize_vec via
    _canonicalize_batch) is EXACTLY the pure function on authority/port/
    dot-segment/percent/query/fragment combinations, with and without a
    base and drop_params."""
    import pandas as pd

    from crawler_spark.functions.canonicalize import _canonicalize_batch

    s = pd.Series([url], dtype="object")
    b = pd.Series([base], dtype="object")
    for dp in (frozenset(), frozenset({"utm", "a"})):
        got = _canonicalize_batch(s, b, dp)
        want = canonicalize_url(url, base, dp)
        assert got.iloc[0] == want, (url, base, dp, got.iloc[0], want)


def test_idn_hosts_converge_to_punycode():
    from crawler_spark.functions.canonicalize import canonicalize_url as c

    uni = c("http://Bücher.example/x")
    puny = c("http://xn--bcher-kva.example/x")
    assert uni == puny == "http://xn--bcher-kva.example/x"
    # multi-label, non-latin, with normalization work besides the host
    assert (
        c("http://münchen.de.:80/a/../b")
        == "http://xn--mnchen-3ya.de/b"
    )
    # idempotent on the encoded form
    assert c(uni) == uni
    # ascii hosts untouched
    assert c("http://plain.example.com/x") == "http://plain.example.com/x"


def test_by_connector_udf_applies_each_rows_params(spark):
    """canonicalize_urls_by_connector_udf strips each row's OWN connector
    drop_params (the set extract_links used for that connector), with
    unknown / NULL connector ids falling back to no stripping — so a 3xx
    landing URL gets the identical seen-key as its link-discovered form."""
    from pyspark.sql import functions as F

    from crawler_spark.functions.canonicalize import (
        canonicalize_urls_by_connector_udf,
    )

    rows = [
        ("http://H0.Example.test/img?width=5&x=1", "http://h0.example.test/", "c_drop"),
        ("http://h0.example.test/img?width=5&x=1", "http://h0.example.test/", "c_keep"),
        ("http://h0.example.test/img?width=5", "http://h0.example.test/", "c_unknown"),
        ("http://h0.example.test/img?width=5", "http://h0.example.test/", None),
    ]
    df = spark.createDataFrame(rows, "u string, b string, cid string")
    canon = canonicalize_urls_by_connector_udf(
        {"c_drop": frozenset({"width"}), "c_keep": frozenset()}
    )
    got = {
        (r["cid"], r["c"])
        for r in df.select(
            "cid", canon(F.col("u"), F.col("b"), F.col("cid")).alias("c")
        ).collect()
    }
    assert ("c_drop", "http://h0.example.test/img?x=1") in got
    assert ("c_keep", "http://h0.example.test/img?width=5&x=1") in got
    assert ("c_unknown", "http://h0.example.test/img?width=5") in got
    assert (None, "http://h0.example.test/img?width=5") in got


def test_by_connector_udf_no_params_fast_path(spark):
    """All-empty drop_params degrades to the plain canonicalizer (same
    outputs, no per-batch groupby)."""
    from pyspark.sql import functions as F

    from crawler_spark.functions.canonicalize import (
        canonicalize_urls_by_connector_udf,
        canonicalize_urls_udf,
    )

    df = spark.createDataFrame(
        [("http://A.b/x/../y?q=1", None, "c0"), ("/rel", "http://a.b/d/", None)],
        "u string, b string, cid string",
    )
    by_conn = canonicalize_urls_by_connector_udf({"c0": frozenset()})
    plain = canonicalize_urls_udf(frozenset())
    got = df.select(
        by_conn(F.col("u"), F.col("b"), F.col("cid")).alias("a"),
        plain(F.col("u"), F.col("b")).alias("p"),
    ).collect()
    for r in got:
        assert r["a"] == r["p"]
