"""DUST param-irrelevance mining (crawler_spark.functions.dust)."""

import pytest

from crawler_spark.functions.dust import dust_canonicalize, dust_param_rules


def _mk(spark, rows):
    return spark.createDataFrame(rows, "url string, fp string")


@pytest.fixture(scope="module")
def corpus(spark):
    rows = []
    # host a: 'ref' irrelevant (varies, fp constant), 'id' relevant
    for item in (1, 2, 3):
        for ref in ("x", "y"):
            rows.append(
                (f"http://a.test/p?id={item}&ref={ref}", f"fp-a-{item}")
            )
    # host a: 'utm' irrelevant via presence/absence
    rows.append(("http://a.test/q?id=9", "fp-a-9"))
    rows.append(("http://a.test/q?id=9&utm=z", "fp-a-9"))
    rows.append(("http://a.test/q?id=8", "fp-a-8"))
    rows.append(("http://a.test/q?id=8&utm=w", "fp-a-8"))
    # host b: 'page' RELEVANT (fp changes with it)
    for page in (0, 1):
        for ref in ("x", "y"):
            rows.append(
                (f"http://b.test/p?page={page}&ref={ref}", f"fp-b-{page}")
            )
    return _mk(spark, rows)


def test_rules(corpus):
    got = {
        (r["host"], r["param"]): (
            r["support"],
            r["violations"],
            r["is_irrelevant"],
        )
        for r in dust_param_rules(corpus).collect()
    }
    assert got[("a.test", "ref")][2] is True
    assert got[("a.test", "ref")] == (3, 0, True)  # one group per item
    assert got[("a.test", "utm")] == (2, 0, True)  # presence/absence pairs
    assert got[("b.test", "ref")] == (2, 0, True)
    assert got[("b.test", "page")][2] is False  # violations == support
    assert got[("b.test", "page")][1] == got[("b.test", "page")][0]
    # 'id' on host a: URLs sharing a ref differ only in id, with distinct
    # fps → supported but violating on every group → relevant
    # (2 ref-groups on /p + the bare /q pair)
    assert got[("a.test", "id")] == (3, 3, False)


def test_min_precision_slack(corpus):
    # with min_precision=0 every supported param passes
    got = {
        (r["host"], r["param"]): r["is_irrelevant"]
        for r in dust_param_rules(corpus, min_precision=0.0).collect()
    }
    assert got[("b.test", "page")] is True


def test_vocab_cap_bounds_absence_fanout(spark):
    rows = [("http://c.test/p?a=1&b=2", "f1"), ("http://c.test/p?a=1", "f1")]
    df = _mk(spark, rows)
    # cap=1 keeps only the most frequent pname ('a'); 'b' absence evidence
    # is never generated, so no 'b' rule appears
    got = {r["param"] for r in
           dust_param_rules(df, max_params_per_host=1).collect()}
    assert "b" not in got


def test_canonicalize(corpus):
    rules = dust_param_rules(corpus)
    out = dust_canonicalize(corpus, rules)
    m = {r["url"]: r["url_dust"] for r in out.collect()}
    # ref stripped on both hosts, utm stripped on a, page kept on b
    assert m["http://a.test/p?id=1&ref=x"] == "http://a.test/p?id=1"
    assert m["http://a.test/q?id=9&utm=z"] == "http://a.test/q?id=9"
    assert m["http://b.test/p?page=1&ref=y"] == "http://b.test/p?page=1"
    # whole-query death drops the '?'
    only_ref = _mk(corpus.sparkSession, [("http://a.test/r?ref=x", "f")])
    out2 = dust_canonicalize(only_ref, rules)
    assert out2.collect()[0]["url_dust"] == "http://a.test/r"
    # alias families collapse: distinct url_dust < distinct url
    assert (
        out.select("url_dust").distinct().count()
        < corpus.select("url").distinct().count()
    )


def test_no_rules_passthrough(spark):
    df = _mk(spark, [("http://z.test/p?x=1", "f1")])
    rules = dust_param_rules(df)  # empty
    assert rules.count() == 0
    out = dust_canonicalize(df, rules)
    assert out.collect()[0]["url_dust"] == "http://z.test/p?x=1"
