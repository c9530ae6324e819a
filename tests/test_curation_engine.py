"""Engine wiring of the webtext-sink curation opt-ins
(EngineConfig.keep_best / dedup_paragraphs): near-dup document clusters
collapse to their highest-quality member, cross-document paragraph repeats
are cut, and both run as deterministic post-passes over the committed
deltas — kill/resume re-derives the identical curated corpus."""

from pyspark.sql import functions as F

from crawler_spark.plans.rounds import CrawlEngine, EngineConfig
from crawler_spark.sources.sitegen import SiteSpec, generate_site, site_to_spark

_BASE_TEXT = (
    "the quick brown fox jumps over the lazy dog near the riverbank while "
    "autumn leaves drift slowly down onto the quiet water and the evening "
    "light settles across the valley in long amber bands"
)


def _tpl(field_value: str) -> str:
    return (
        '<html><body><h1 class="title">Record note</h1>'
        '<table class="fields"><tr class="field">'
        '<td class="label">Description</td>'
        f'<td class="value">{field_value}</td>'
        "</tr></table>"
        '<div class="images"></div><div class="related"></div>'
        "</body></html>"
    )


def _site_with_pair(noise: str = ""):
    """Two record pages sharing a long text block; the second carries extra
    punctuation noise so its quality_score is strictly lower while the
    5-char shingle Jaccard stays above the keep_best threshold."""
    site = generate_site(SiteSpec(n_hosts=1, details_per_host=8, limit=4))
    pages = site["pages"].copy()
    mask = pages["url"].str.contains("/record/")
    a, b = pages[mask].iloc[0]["url"], pages[mask].iloc[1]["url"]
    pages.loc[pages["url"] == a, "html"] = _tpl(_BASE_TEXT).encode()
    pages.loc[pages["url"] == b, "html"] = _tpl(
        _BASE_TEXT + noise
    ).encode()
    s = dict(site)
    s["pages"] = pages
    return s, a, b


def _run(spark, ck, site, **cfg_kw):
    sdfs = site_to_spark(spark, site)
    cfg = EngineConfig(ckpt_dir=str(ck), **cfg_kw)
    return CrawlEngine(
        spark, sdfs["pages"], sdfs["seeds"], sdfs["politeness"], cfg
    ).run()


def test_keep_best_collapses_near_dup_cluster(spark, tmp_path):
    # enough punctuation to trip quality_score's punct_ratio penalty on
    # the FULL extracted text (title + labels dilute it), while adding
    # only ~10 distinct 5-char shingles so the pair stays a near-dup
    noise = " " + "!?!? " * 40
    site, a, b = _site_with_pair(noise)

    base = _run(spark, tmp_path / "base", site)
    base_wt = {r["url"]: r["text"] for r in base.webtext.collect()}
    assert a in base_wt and b in base_wt

    # expected winner: argmax quality_score over the ACTUAL extracted
    # texts (computed with the same function the engine uses)
    from crawler_spark.functions.textstats import quality_score

    q = {
        r["u"]: r["q"]
        for r in spark.createDataFrame(
            [(u, base_wt[u]) for u in (a, b)], "u string, text string"
        )
        .select("u", quality_score(F.col("text")).alias("q"))
        .collect()
    }
    assert q[a] != q[b], "test construction: qualities must differ"
    winner, loser = (a, b) if q[a] > q[b] else (b, a)

    res = _run(spark, tmp_path / "kb", site, keep_best=True)
    got = {r["url"] for r in res.webtext.collect()}
    assert winner in got and loser not in got
    # nothing else was touched
    assert got == set(base_wt) - {loser}
    # records are NOT curated — the record sink keeps both
    rec_urls = {r["url"] for r in res.records.select("url").collect()}
    assert a in rec_urls and b in rec_urls

    # deterministic on resume: re-running the complete checkpoint yields
    # the identical curated view
    again = _run(spark, tmp_path / "kb", site, keep_best=True)
    assert {r["url"] for r in again.webtext.collect()} == got


def test_dedup_paragraphs_cuts_cross_doc_repeats(spark, tmp_path):
    # identical extracted text on both pages: the globally-first
    # (url_hash, pos) copy survives; the other doc loses its only
    # paragraph and is dropped entirely
    site, a, b = _site_with_pair(noise="")

    base = _run(spark, tmp_path / "base", site)
    base_urls = {r["url"] for r in base.webtext.collect()}

    res = _run(spark, tmp_path / "dp", site, dedup_paragraphs=True)
    got = {r["url"]: r["text"] for r in res.webtext.collect()}
    survivors = {a, b} & set(got)
    assert len(survivors) == 1, f"expected exactly one of the pair: {survivors}"
    # the survivor is the lowest-url_hash one (globally-first rule)
    from crawler_spark.functions.canonicalize import url_hash

    h = {
        r["u"]: r["h"]
        for r in spark.createDataFrame([(a,), (b,)], "u string")
        .select("u", url_hash(F.col("u")).alias("h"))
        .collect()
    }
    assert survivors == {min((a, b), key=lambda u: h[u])}
    assert set(got) == base_urls - ({a, b} - survivors)


def test_both_flags_compose(spark, tmp_path):
    noise = " " + "!?!? " * 40
    site, a, b = _site_with_pair(noise)
    res = _run(
        spark, tmp_path / "both", site,
        keep_best=True, dedup_paragraphs=True,
    )
    got = {r["url"] for r in res.webtext.collect()}
    # keep_best already collapsed the pair; paragraph dedup over the
    # survivors finds no cross-doc repeat and drops nothing further
    assert len({a, b} & got) == 1
    assert res.webtext.count() == len(got)


def test_curation_folds_recrawled_duplicate_rows(spark, tmp_path):
    """The assembled delta log can carry several webtext rows per URL (a
    selective recrawl appends a fresh row while the stale delta remains);
    curation must fold to one freshest row per URL first — otherwise
    paragraph_dedup would interleave the copies' paragraphs into one text
    and fan it back out to duplicate rows."""
    from crawler_spark.sources.sitegen import SiteSpec, generate_site

    site = generate_site(SiteSpec(n_hosts=1, details_per_host=8, limit=4))
    sdfs = site_to_spark(spark, site)
    ck = str(tmp_path / "ckr")
    cfg = EngineConfig(ckpt_dir=ck, default_budget=10)
    first = CrawlEngine(
        spark, sdfs["pages"], sdfs["seeds"], sdfs["politeness"], cfg
    ).run()
    target = first.webtext.select("url").orderBy("url").first()["url"]

    recrawl = spark.createDataFrame(
        [(target, "c0")], "url string, connector_id string"
    )
    eng2 = CrawlEngine(
        spark, sdfs["pages"], sdfs["seeds"], sdfs["politeness"],
        EngineConfig(ckpt_dir=ck, default_budget=10, dedup_paragraphs=True),
    )
    second = eng2.run(recrawl=recrawl)

    # the raw delta log holds two rows for the recrawled URL...
    raw = eng2.ckpt.load_all_deltas(spark, "webtext_delta")
    assert raw.where(F.col("url") == target).count() == 2
    # ...but the curated view folds to exactly one row per URL
    wt = second.webtext
    dup_urls = (
        wt.groupBy("url").count().where(F.col("count") > 1).collect()
    )
    assert dup_urls == []
    assert wt.where(F.col("url") == target).count() == 1
    # and the surviving text is a clean single copy (no interleaving):
    # identical to the first run's extraction for that URL
    want = {
        r["text"] for r in first.webtext.where(F.col("url") == target).collect()
    }
    got = {r["text"] for r in wt.where(F.col("url") == target).collect()}
    assert got == want
