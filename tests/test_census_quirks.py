"""Connector-census edge coverage (SURVEY.md Appendix A quirks):

* path-segment pagination ``/page:N`` with a labeled count
  ("Schede trovate: 88") — venetian.js:27-39;
* stop-on-short-page chaining (no count element; the next page exists only
  while pages come back full) — mfa-boston.js:53-60;
* parenthesized count "(1,234)" — smithsonian.js:19-26;
* multi-line value split (one value per non-empty line) — louvre.js:143-148;
* record id from an extracted field value, not the URL segment
  ("Nº d'inventaire:") — versailles.js:128.

Each quirk runs through the full engine AND the pure-Python replay oracle
on the same synthetic site; parity covers write order, URL-seen set, and
byte-identical extracted text.
"""

import pytest

from crawler_spark.operators.extract import (
    ConnectorConfig,
    extract_count,
    extract_detail,
    parse_html,
)
from crawler_spark.oracle.replay import replay
from crawler_spark.plans.rounds import CrawlEngine, EngineConfig
from crawler_spark.sources.sitegen import SiteSpec, generate_site, site_to_spark

SPEC = SiteSpec(
    n_hosts=5,
    details_per_host=13,  # 13 % 5 != 0 → the short-page host ends short
    limit=5,
    related_per_host=3,
    path_hosts=(0,),
    short_page_hosts=(1,),
    paren_count_hosts=(2,),
    multiline_hosts=(3,),
    id_label_hosts=(4,),
    budget_per_round=6,
)


@pytest.fixture(scope="module")
def site():
    return generate_site(SPEC)


@pytest.fixture(scope="module")
def oracle(site):
    pages = {r.url: r.html for r in site["pages"].itertuples()}
    return replay(pages, site["seeds"].to_dict("records"), site["connectors"])


@pytest.fixture(scope="module")
def engine_result(spark, site, tmp_path_factory):
    sdfs = site_to_spark(spark, site)
    cfg = EngineConfig(
        ckpt_dir=str(tmp_path_factory.mktemp("ckpt")),
        default_budget=6,
        use_bloom=False,
    )
    eng = CrawlEngine(
        spark, sdfs["pages"], sdfs["seeds"], sdfs["politeness"], cfg,
        connectors=site["connectors"],
    )
    return eng.run()


def test_seen_set_parity(engine_result, oracle):
    got = {r["url"] for r in engine_result.records.select("url").collect()}
    assert got == set(oracle.webtext.keys())


def test_crawl_order_parity(engine_result, oracle):
    rows = engine_result.records.select(
        "connector_id", "seed_idx", "page_no", "in_page_idx", "dfs_rank", "url"
    ).collect()
    got = [
        r["url"]
        for r in sorted(
            rows,
            key=lambda r: (
                r["connector_id"],
                r["seed_idx"],
                r["page_no"],
                r["in_page_idx"],
                r["dfs_rank"],
            ),
        )
    ]
    assert got == [w["url"] for w in oracle.written]


def test_webtext_byte_parity(engine_result, oracle, site):
    got = {r["url"]: r["text"] for r in engine_result.webtext.collect()}
    assert got == oracle.webtext
    golden = {
        r.url: r.text for r in site["pages"].itertuples() if r.url in got
    }
    assert got == golden


def test_path_host_fanned_all_pages(engine_result, oracle):
    """Venetian /page:N pagination: the labeled count yields a known total
    (ceil(13/5) = 3 pages), every page URL visited by both sides."""
    want = {
        f"http://h0.example.test/search/page:{p}" for p in (1, 2, 3)
    }
    assert want <= set(oracle.fetches)
    got = {
        r["url"]
        for r in engine_result.fetch_log.where(
            "url like 'http://h0%'"
        ).collect()
    }
    assert want <= got
    assert f"http://h0.example.test/search/page:4" not in got


def test_short_page_host_stops_on_short(engine_result, oracle):
    """mfa-boston chaining: pages 1-2 come back full (5 links), page 3 is
    short (3 links) → no page 4 fetch on either side."""
    def pages_of(urls):
        return {
            u for u in urls
            if u.startswith("http://h1") and "search" in u
        }

    want = {f"http://h1.example.test/search?page={p}" for p in (1, 2, 3)}
    assert pages_of(oracle.fetches) == want
    got = pages_of(
        r["url"] for r in engine_result.fetch_log.collect()
    )
    assert got == want


def test_short_page_full_last_page_overflows_once():
    """10 details / limit 5: both pages full → one extra (empty) overflow
    fetch ends the chain, identically in engine-config terms: the replay
    oracle fetches exactly pages 1, 2, 3."""
    spec = SiteSpec(
        n_hosts=1, details_per_host=10, limit=5, related_per_host=0,
        short_page_hosts=(0,),
    )
    site = generate_site(spec)
    pages = {r.url: r.html for r in site["pages"].itertuples()}
    oracle = replay(pages, site["seeds"].to_dict("records"), site["connectors"])
    search_fetches = [u for u in oracle.fetches if "search" in u]
    assert search_fetches == [
        f"http://h0.example.test/search?page={p}" for p in (1, 2, 3)
    ]
    assert len(oracle.written) == 10


def test_record_id_from_field(engine_result, oracle):
    """versailles.js:128: ids on the id_label host are the Inventory field
    value; other hosts keep the URL-segment id."""
    rows = engine_result.records.select("connector_id", "url", "id").collect()
    n_inv = 0
    for r in rows:
        seg = r["url"].rstrip("/").rsplit("/", 1)[-1]
        if r["connector_id"] == "c4":
            assert r["id"] == f"INV-4-{seg}"
            n_inv += 1
        else:
            assert r["id"] == seg
    assert n_inv > 0


def test_multiline_split_values(engine_result, oracle):
    """louvre parseText: the <br> Description on the multiline host becomes
    TWO values under one label (elsewhere it stays one value with \\n)."""
    rows = engine_result.records.where("connector_id = 'c3'").collect()
    saw_split = False
    for r in rows:
        for f in r["fields"]:
            assert all("\n" not in v for v in f["values"])
            if f["label"] == "Description" and len(f["values"]) >= 2:
                saw_split = True
    assert saw_split
    other = engine_result.records.where("connector_id = 'c2'").collect()
    assert any(
        "\n" in v
        for r in other
        for f in r["fields"]
        if f["label"] == "Description"
        for v in f["values"]
    )


# ---------------------------------------------------------------------------
# unit level: the count regex and the id/value extraction knobs


def _count_of(html: str, **cfg_kw) -> int | None:
    cfg = ConnectorConfig(connector_id="t", **cfg_kw)
    return extract_count(parse_html(html, "utf-8"), cfg)


def test_count_regex_paren_with_commas():
    html = '<div id="count">(1,234)</div>'
    assert _count_of(html, count_regex=r"\(([\d,]+)\)") == 1234
    # decorated counts inside longer tab text defeat the first-token rule
    tab = '<div id="count">Textiles (1,234)</div>'
    assert _count_of(tab, count_regex=r"\(([\d,]+)\)") == 1234
    assert _count_of(tab) is None


def test_count_regex_labeled_text():
    html = '<div id="count">Schede trovate: 88</div>'
    assert _count_of(html, count_regex=r"Schede trovate: (\d+)") == 88
    assert _count_of(html) is None


def test_count_regex_no_match_is_none():
    html = '<div id="count">nessun risultato</div>'
    assert _count_of(html, count_regex=r"Schede trovate: (\d+)") is None


def test_split_multiline_values_unit():
    html = (
        "<html><body>"
        '<h1 class="title">T</h1>'
        '<table><tr class="field"><td class="label">Desc</td>'
        '<td class="value"> a<br><br>b </td></tr></table>'
        "</body></html>"
    )
    cfg = ConnectorConfig(connector_id="t", split_multiline_values=True)
    rec = extract_detail(html, "http://x.test/r/1", cfg)
    assert rec["fields"] == [("Desc", ["a", "b"])]
    assert rec["text"] == "T\nDesc\ta\nDesc\tb"
    plain = extract_detail(
        html, "http://x.test/r/1", ConnectorConfig(connector_id="t")
    )
    assert plain["fields"] == [("Desc", ["a\n\nb"])]
