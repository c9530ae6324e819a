"""Engine wiring of evidence-based trap suppression
(EngineConfig.trap_detection): per-host HLL sketches accumulate across
rounds in a checkpoint sidecar; hosts crossing the URL-vs-fingerprint
thresholds stop contributing link candidates."""

from pyspark.sql import functions as F

from crawler_spark.plans.rounds import CrawlEngine, EngineConfig
from crawler_spark.sources.sitegen import SiteSpec, generate_site, site_to_spark


def _engine(spark, tmp_path, **cfg_kw):
    site = generate_site(SiteSpec(n_hosts=2, details_per_host=12, limit=4))
    sdfs = site_to_spark(spark, site)
    cfg = EngineConfig(ckpt_dir=str(tmp_path / "ck"), **cfg_kw)
    return CrawlEngine(
        spark, sdfs["pages"], sdfs["seeds"], sdfs["politeness"], cfg
    )


def _ok_df(spark, host, n_urls, n_bodies):
    rows = [
        (
            f"http://{host}/p{i}",
            bytearray(f"body-{i % n_bodies}".encode()),
        )
        for i in range(n_urls)
    ]
    return spark.createDataFrame(rows, "url string, body binary")


def test_sketch_merge_and_flagging(spark, tmp_path):
    eng = _engine(
        spark, tmp_path, trap_detection=True,
        trap_min_urls=20, trap_dup_ratio=10.0,
    )
    # round 1: trap host mints 15 URLs over 1 body; healthy host 15/15
    eng._trap_update(
        _ok_df(spark, "trap.test", 15, 1).union(
            _ok_df(spark, "ok.test", 15, 15)
        ),
        1,
    )
    # below trap_min_urls — nobody flagged yet
    assert eng._trapped_hosts().count() == 0
    # round 2: 15 MORE distinct URLs each (range offset via suffix)
    more_trap = spark.createDataFrame(
        [(f"http://trap.test/q{i}", bytearray(b"body-0")) for i in range(15)],
        "url string, body binary",
    )
    more_ok = spark.createDataFrame(
        [
            (f"http://ok.test/q{i}", bytearray(f"x-{i}".encode()))
            for i in range(15)
        ],
        "url string, body binary",
    )
    eng._trap_update(more_trap.union(more_ok), 2)
    flagged = {r["host"] for r in eng._trapped_hosts().collect()}
    assert flagged == {"trap.test"}  # 30 urls / 1 fp; ok.test is 30/30


def test_sidecar_survives_resume(spark, tmp_path):
    eng = _engine(
        spark, tmp_path, trap_detection=True,
        trap_min_urls=10, trap_dup_ratio=5.0,
    )
    eng._trap_update(_ok_df(spark, "trap.test", 12, 1), 1)
    # a NEW engine on the same ckpt_dir sees the learned state
    eng2 = _engine(
        spark, tmp_path, trap_detection=True,
        trap_min_urls=10, trap_dup_ratio=5.0,
    )
    assert {r["host"] for r in eng2._trapped_hosts().collect()} == {
        "trap.test"
    }


def test_e2e_suppression_prunes_candidates(spark, tmp_path):
    # baseline: full crawl
    base = _engine(spark, tmp_path / "a").run()
    n_base = base.records.count()
    # trap config that flags EVERY host once it serves ≥4 distinct URLs
    # (ratio 1.0 is trivially met) — discovery shuts off after round 1
    res = _engine(
        spark, tmp_path / "b", trap_detection=True,
        trap_min_urls=4, trap_dup_ratio=1.0,
    ).run()
    n_trap = res.records.count()
    assert 0 < n_trap < n_base
    # the flag list is persisted next to the checkpoint
    import os

    assert os.path.isdir(str(tmp_path / "b" / "ck" / "trap_sketches"))


def test_off_by_default_no_sidecar(spark, tmp_path):
    _engine(spark, tmp_path).run()
    import os

    assert not os.path.isdir(str(tmp_path / "ck" / "trap_sketches"))
