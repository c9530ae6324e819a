"""Adaptive per-host backoff (429/503 AIMD): the throttle verdict, the
factor table's multiplicative evolution + persistence, and a live engine
run against a throttling localhost host."""

import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pytest
from pyspark.sql import functions as F

from crawler_spark.plans.rounds import CrawlEngine, EngineConfig
from crawler_spark.sources.sitegen import SiteSpec, generate_site, site_to_spark


def test_throttle_stats_verdicts(spark):
    from crawler_spark.operators.politeness import throttle_stats

    rows = (
        [("a", 429)] * 3 + [("a", 200)] * 1        # 3/4 throttled -> backoff
        + [("b", 200)] * 5                          # clean
        + [("c", 503)] * 2                          # too few requests
        + [("d", 429)] * 2 + [("d", 200)] * 6       # 2/8 < ratio
    )
    df = spark.createDataFrame(rows, "host string, status int")
    got = {r["host"]: r for r in throttle_stats(df).collect()}
    assert got["a"]["backoff"] and not got["a"]["clean"]
    assert got["b"]["clean"] and not got["b"]["backoff"]
    assert not got["c"]["backoff"] and not got["c"]["clean"]
    assert not got["d"]["backoff"] and not got["d"]["clean"]


def test_adaptive_factor_evolution(spark, tmp_path):
    """Factor path 1 -> 2 -> 4 under sustained throttling, then 4 -> 2 -> 1
    on clean rounds; state survives a brand-new engine (resume)."""
    site = generate_site(SiteSpec(n_hosts=1, details_per_host=2, limit=2))
    sdfs = site_to_spark(spark, site)
    cfg = EngineConfig(
        ckpt_dir=str(tmp_path / "ck"), adaptive_politeness=True
    )
    eng = CrawlEngine(spark, sdfs["pages"], sdfs["seeds"], None, cfg)

    def round_df(status):
        return spark.createDataFrame(
            [("h.example.test", status)] * 4, "host string, status int"
        )

    def factor():
        t = eng._load_adaptive_factors()
        rows = t.collect() if t is not None else []
        return rows[0]["factor"] if rows else 1.0

    eng._adaptive_update(round_df(429), 1)
    assert factor() == 2.0
    eng._adaptive_update(round_df(429), 2)
    assert factor() == 4.0
    eng._adaptive_update(round_df(200), 3)
    assert factor() == 2.0
    # a fresh engine over the same ckpt_dir sees the learned factor
    eng2 = CrawlEngine(spark, sdfs["pages"], sdfs["seeds"], None, cfg)
    t = eng2._load_adaptive_factors().collect()
    assert t and t[0]["factor"] == 2.0
    eng2._adaptive_update(round_df(200), 4)
    rows = {r["host"]: r["factor"] for r in eng2._load_adaptive_factors().collect()}
    assert rows["h.example.test"] == 1.0
    # another clean round is a no-op (factor already 1): no new write
    eng2._adaptive_update(round_df(200), 5)
    rows = {r["host"]: r["factor"] for r in eng2._load_adaptive_factors().collect()}
    assert rows["h.example.test"] == 1.0


@pytest.fixture()
def throttling_server():
    """Serves the synthetic site but answers 429 to every /record request
    for the first N hits — enough to trip the backoff verdict in round 1."""
    site = generate_site(SiteSpec(n_hosts=1, details_per_host=8, limit=8))
    by_path = {}
    for r in site["pages"].itertuples():
        by_path[r.url.split("example.test", 1)[1]] = bytes(r.html)
    state = {"throttled": 0}

    class Handler(BaseHTTPRequestHandler):
        def do_GET(self):
            if self.path.startswith("/record/") and state["throttled"] < 8:
                state["throttled"] += 1
                self.send_response(429)
                self.end_headers()
                return
            body = by_path.get(self.path)
            if body is None:
                self.send_response(404)
                self.end_headers()
                return
            self.send_response(200)
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, *a):
            pass

    srv = ThreadingHTTPServer(("127.0.0.1", 0), Handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield site, f"http://127.0.0.1:{srv.server_address[1]}", state
    srv.shutdown()


def test_live_crawl_learns_backoff(spark, throttling_server, tmp_path):
    site, base, state = throttling_server
    host = base.split("//", 1)[1]
    seeds = site["seeds"].copy()
    seeds["url"] = seeds["url"].str.replace(
        r"http://h0\.example\.test", base, regex=True
    )
    pol = site["politeness"].copy()
    pol["host"] = host
    sdfs = site_to_spark(spark, {**site, "seeds": seeds, "politeness": pol})
    cfg = EngineConfig(
        ckpt_dir=str(tmp_path / "ck"),
        fetch_mode="live",
        fetch_timeout_s=5,
        live_robots=False,
        adaptive_politeness=True,
        max_attempts=4,
    )
    eng = CrawlEngine(
        spark, None, sdfs["seeds"], sdfs["politeness"], cfg,
        connectors=site["connectors"],
    )
    res = eng.run()
    # the 429 burst tripped backoff at least once during the crawl
    t = spark.read.parquet(str(tmp_path / "ck" / "adaptive_politeness"))
    assert t.where(F.col("factor") > 1.0).count() >= 1
    # the crawl still completed once the host recovered (retries + backoff)
    assert res.records.count() > 0
