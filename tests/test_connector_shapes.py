"""Engine parity over heterogeneous connector shapes (SURVEY.md §2.1
S2/S3, §2.2 P1/P3, §2.7 U1, §2.8 F8):

* JSON-API hosts (vam.js:25-49,72-133 shape) next to HTML hosts,
* a latin1-encoded host (ceres-mcu.js:121),
* multi-seed connectors (seed rotation, vam.js:10-14,38-46),
* an unknown-total host (loop-until-empty, artic.js:59-78),
* an offset-paged host (met-museum offset+perPage, met-museum.js:30),

all in ONE crawl — the engine must reproduce the sequential oracle's
record set, write order, and golden text bytes per url.
"""

import pytest

from crawler_spark.oracle.replay import replay
from crawler_spark.plans.rounds import CrawlEngine, EngineConfig
from crawler_spark.sources.sitegen import SiteSpec, generate_site, site_to_spark

SPEC = SiteSpec(
    n_hosts=5,
    details_per_host=12,
    limit=5,
    related_per_host=3,
    json_hosts=(1, 4),
    latin1_hosts=(2,),
    seeds_per_host=2,
    unknown_total_hosts=(3,),
    offset_hosts=(0,),
    budget_per_round=8,
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
        ckpt_dir=str(tmp_path_factory.mktemp("ckpt_shapes")),
        default_budget=8,
        use_bloom=True,
        bloom_partitions=4,
    )
    eng = CrawlEngine(
        spark, sdfs["pages"], sdfs["seeds"], sdfs["politeness"], cfg,
        connectors=site["connectors"],
    )
    return eng.run()


def test_record_set_parity(engine_result, oracle):
    got = {r["url"] for r in engine_result.records.select("url").collect()}
    assert got == set(oracle.webtext.keys())
    # every connector shape contributed records
    for h in range(SPEC.n_hosts):
        assert any(f"h{h}.example.test" in u for u in got), f"host {h} empty"


def test_crawl_order_parity(engine_result, oracle):
    rows = engine_result.records.select(
        "connector_id", "seed_idx", "page_no", "in_page_idx", "dfs_rank", "url"
    ).collect()
    got = [
        r["url"]
        for r in sorted(
            rows,
            key=lambda r: (
                r["connector_id"], r["seed_idx"], r["page_no"],
                r["in_page_idx"], r["dfs_rank"],
            ),
        )
    ]
    assert got == [w["url"] for w in oracle.written]


def test_webtext_byte_parity_all_shapes(engine_result, oracle, site):
    got = {r["url"]: r["text"] for r in engine_result.webtext.collect()}
    assert got == oracle.webtext
    golden = {r.url: r.text for r in site["pages"].itertuples() if r.url in got}
    assert got == golden
    # latin1 host really produced non-ASCII text (the decode path ran)
    latin1_texts = [t for u, t in got.items() if "h2.example.test" in u]
    assert any(any(ord(ch) > 127 for ch in t) for t in latin1_texts)
    # JSON host produced the number-verbatim Year field
    json_texts = [t for u, t in got.items() if "h1.example.test" in u]
    assert any("Year\t1" in t for t in json_texts)


def test_field_semantics_json_host(engine_result, oracle):
    """P1/P3/number-copy on the JSON connector: engine fields == oracle."""
    recs = {r["url"]: r for r in engine_result.records.collect()}
    checked = 0
    for url, orec in oracle.records.items():
        if "h1.example.test" not in url and "h4.example.test" not in url:
            continue
        erec = recs[url]
        got = [(f["label"], list(f["values"])) for f in erec["fields"]]
        want = [(l, list(v)) for l, v in orec["fields"]]
        assert got == want, url
        assert not any(l in ("Raw", "Nil", "Empty") for l, _ in got), url
        checked += 1
    assert checked > 5
