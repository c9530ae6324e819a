"""Gallica-style typed secondary fetches (gallica.js:83-148): hop
extraction, chain driving, and the shared merge semantics."""

from crawler_spark.operators.extract import (
    ConnectorConfig,
    SecondaryFetch,
    extract_detail,
    extract_secondary,
    merge_secondaries,
    run_secondary_chain,
)

NOTICE_SF = SecondaryFetch(
    kind="notice",
    from_field="Notice",
    row_selector="div.notice",
    label_selector="span.notice-label",
    image_selector="img.grand",
)
BOOK_SF = SecondaryFetch(
    kind="book",
    link_selector="div.appartient a",
    row_selector="div.notice",
    label_selector="span.notice-label",
    image_selector="img.grand",
)
CFG = ConnectorConfig(
    connector_id="g", secondary_fetches=(NOTICE_SF, BOOK_SF)
)

NOTICE_HTML = b"""<html><body>
<div class="notice"><span class="notice-label">Provenance</span><span> BnF </span></div>
<div class="notice"><span class="notice-label">Auteurs</span>
  <span><a href="/a1">Dupont</a><a class="pictos" href="#">ico</a><a href="/a2">Martin</a></span></div>
<div class="notice"><span class="notice-label">Vide</span><span>  </span></div>
<img class="grand" src="/vignette/n7.jpg">
<div class="appartient"><a href="/book/b3">le livre</a></div>
</body></html>"""

BOOK_HTML = b"""<html><body>
<div class="notice"><span class="notice-label">Titre</span><span>Soieries</span></div>
<img class="grand" src="http://h0.example.test/record/7/self.jpg">
</body></html>"""

DETAIL_HTML = b"""<html><body>
<h1 class="title">Rec 7</h1>
<table><tr class="field"><td class="label">Material</td><td class="value">silk</td></tr>
<tr class="field"><td class="label">Notice</td><td class="value">http://h0.example.test/notice/7</td></tr></table>
</body></html>"""

PARENT = "http://h0.example.test/record/7"


def test_extract_secondary_rows_links_image_and_next():
    got = extract_secondary(
        NOTICE_HTML, "http://h0.example.test/notice/7", NOTICE_SF, CFG,
        PARENT, next_sf=BOOK_SF,
    )
    # sibling-span values; links each a value, .pictos excluded
    # (gallica.js:95-103); empty value dropped (record.js:14-21)
    assert got["fields"] == [
        ("notice.Provenance", "BnF"),
        ("notice.Auteurs", "Dupont"),
        ("notice.Auteurs", "Martin"),
    ]
    # first image-selector match, resolved against the notice URL
    assert [im["url"] for im in got["images"]] == [
        "http://h0.example.test/vignette/n7.jpg"
    ]
    # the NEXT hop's URL comes from this page (gallica.js:116-121)
    assert got["next_url"] == "http://h0.example.test/book/b3"


def test_secondary_image_skipped_when_parents_own():
    got = extract_secondary(
        BOOK_HTML, "http://h0.example.test/book/b3", BOOK_SF, CFG, PARENT,
    )
    # src startswith the parent record URL → not re-added
    # (gallica.js:108-114)
    assert got["images"] == []
    assert got["fields"] == [("book.Titre", "Soieries")]


def test_chain_and_merge_end_to_end():
    pages = {
        "http://h0.example.test/notice/7": NOTICE_HTML,
        "http://h0.example.test/book/b3": BOOK_HTML,
    }
    rec = extract_detail(DETAIL_HTML, PARENT, CFG)
    chain = run_secondary_chain(rec, PARENT, pages.get, CFG)
    assert [h["kind"] for h in chain] == ["notice", "book"]
    merge_secondaries(rec, chain)
    by = dict(rec["fields"])
    # <kind>.url recorded before each hop's fields (gallica.js:85,120)
    assert by["notice.url"] == ["http://h0.example.test/notice/7"]
    assert by["book.url"] == ["http://h0.example.test/book/b3"]
    assert by["notice.Auteurs"] == ["Dupont", "Martin"]
    assert by["book.Titre"] == ["Soieries"]
    # text gains one label\tvalue line per added value, in merge order
    assert rec["text"].splitlines() == [
        "Rec 7",
        "Material\tsilk",
        "Notice\thttp://h0.example.test/notice/7",
        "notice.url\thttp://h0.example.test/notice/7",
        "notice.Provenance\tBnF",
        "notice.Auteurs\tDupont",
        "notice.Auteurs\tMartin",
        "book.url\thttp://h0.example.test/book/b3",
        "book.Titre\tSoieries",
    ]
    # notice vignette added; book's self-image skipped
    assert [im["url"] for im in rec["images"]] == [
        "http://h0.example.test/vignette/n7.jpg"
    ]


def test_chain_stops_on_missing_page_but_records_url():
    pages = {}  # notice 404s
    rec = extract_detail(DETAIL_HTML, PARENT, CFG)
    chain = run_secondary_chain(rec, PARENT, pages.get, CFG)
    assert len(chain) == 1 and chain[0]["fields"] == []
    merge_secondaries(rec, chain)
    by = dict(rec["fields"])
    assert by["notice.url"] == ["http://h0.example.test/notice/7"]
    assert "book.url" not in by


def test_engine_secondary_parity(spark, tmp_path):
    """Distributed path (per-hop fetch joins + chain merge in rounds.py)
    matches the sequential replay oracle AND the generator-composed golden
    text byte-for-byte on a site with a gallica-style secondary host."""
    from crawler_spark.oracle.replay import replay
    from crawler_spark.plans.rounds import CrawlEngine, EngineConfig
    from crawler_spark.sources.sitegen import (
        SiteSpec,
        generate_site,
        site_to_spark,
    )

    site = generate_site(
        SiteSpec(n_hosts=2, details_per_host=12, limit=5,
                 secondary_hosts=(1,))
    )
    sdfs = site_to_spark(spark, site)
    pages = {r["url"]: r["html"] for _, r in site["pages"].iterrows()}
    oracle = replay(pages, site["seeds"].to_dict("records"),
                    site["connectors"])

    res = CrawlEngine(
        spark, sdfs["pages"], sdfs["seeds"], sdfs["politeness"],
        EngineConfig(ckpt_dir=str(tmp_path / "ck"), default_budget=8),
        connectors=site["connectors"],
    ).run()
    got = {r["url"]: r["text"] for r in res.webtext.collect()}
    assert got == oracle.webtext
    golden = {
        r.url: r.text for r in site["pages"].itertuples() if r.url in got
    }
    assert got == golden  # generator-composed bytes, never via the parser

    # merged fields and enrichment images surface in the record sink
    recs = {r["url"]: r for r in res.records.collect()}
    h1 = [r for u, r in recs.items() if u.startswith("http://h1.")]
    with_notice = [
        r for r in h1
        if any(f["label"].startswith("notice.") for f in r["fields"])
    ]
    assert with_notice  # the chain ran distributed
    o_imgs = {
        u: [im["url"] for im in r["images"]]
        for u, r in oracle.records.items()
    }
    for r in with_notice:
        assert [im["url"] for im in r["images"]] == o_imgs[r["url"]]


def test_no_chain_without_from_field():
    rec = extract_detail(
        b"<html><body><h1 class='title'>T</h1></body></html>", PARENT, CFG
    )
    assert run_secondary_chain(rec, PARENT, {}.get, CFG) == []


def test_live_secondary_batch_one_worker_per_host(spark):
    """Live-mode secondary waves carry the same politeness invariant as the
    main fetch stage: all of a host's hop URLs land in ONE partition (the
    in-worker crawl-delay then bounds the host's aggregate rate), and the
    per-host delay is joined on."""
    from pyspark.sql import functions as F

    from crawler_spark.operators.secondary import live_secondary_batch

    wave = spark.createDataFrame(
        [
            (f"http://h{h}.test/record/{i}", f"c{h}",
             f"http://h{h}.test/notice/{i}")
            for h in range(3)
            for i in range(40)
        ],
        "parent_url string, connector_id string, url string",
    )
    politeness = spark.createDataFrame(
        [("h0.test", 500), ("h1.test", 250)],
        "host string, crawl_delay_ms int",
    )
    batch = live_secondary_batch(wave, politeness)
    rows = (
        batch.withColumn("pid", F.spark_partition_id())
        .select("host", "pid", "crawl_delay_ms")
        .collect()
    )
    per_host_pids = {}
    for r in rows:
        per_host_pids.setdefault(r["host"], set()).add(r["pid"])
    assert all(len(p) == 1 for p in per_host_pids.values()), per_host_pids
    delays = {r["host"]: r["crawl_delay_ms"] for r in rows}
    assert delays == {"h0.test": 500, "h1.test": 250, "h2.test": 0}


def test_next_span_immediate_sibling_only():
    """jQuery .next('span') (gallica.js:92-103) matches ONLY the immediate
    next element sibling: an intervening <br> drops the field; whitespace
    text nodes between label and span do not count as siblings."""
    html = b"""<html><body>
    <div class="notice"><span class="notice-label">Broken</span><br><span>v</span></div>
    <div class="notice"><span class="notice-label">Spaced</span>
      <span>w</span></div>
    </body></html>"""
    got = extract_secondary(
        html, "http://h0.example.test/notice/9", NOTICE_SF, CFG, PARENT
    )
    assert got["fields"] == [("notice.Spaced", "w")]
