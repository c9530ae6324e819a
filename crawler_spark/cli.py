"""spark-submit entry point (SURVEY.md §7.2 M7; north_rule: "run via
spark-submit --py-files on a multi-executor cluster").

Usage::

    spark-submit --master <url> --py-files dist/crawler_spark.zip \
        scripts/run_crawl.py \
        --pages  /data/pages_parquet \
        --seeds  /data/seeds_parquet \
        --politeness /data/politeness_parquet \
        --connectors connectors.json \
        --ckpt   /data/ckpt --out /data/out \
        --budget 1000 --bloom

The session comes from spark-submit (master/executors/conf are cluster
concerns); this module only layers SQL confs and the crawl. A killed job
re-run with the same ``--ckpt`` resumes from the last committed round.
"""

from __future__ import annotations

import argparse
import json
import sys


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="crawler_spark")
    p.add_argument("--pages", default=None, help="parquet dir/file: url, warc_ts, html, text, lang (required unless --fetch-mode live)")
    p.add_argument("--fetch-mode", choices=["fixture", "live"], default="fixture",
                   help="fixture = join the pages table; live = real HTTP (urllib) with per-host crawl-delay")
    p.add_argument("--fetch-timeout", type=float, default=60.0)
    p.add_argument("--seeds", required=True, help="parquet: connector seed rows")
    p.add_argument("--politeness", default=None, help="parquet: host, crawl_delay_ms, budget_per_round, disallow")
    p.add_argument("--connectors", default=None, help="JSON file: connector_id -> ConnectorConfig fields")
    p.add_argument("--ckpt", required=True, help="checkpoint dir (resume point)")
    p.add_argument("--out", required=True, help="output dir (records/webtext/url_seen/fetch_log parquet)")
    p.add_argument("--budget", type=int, default=1000, help="default per-host budget per round (W1)")
    p.add_argument("--global-batch", type=int, default=None, help="optional global round cap")
    p.add_argument("--max-rounds", type=int, default=10_000)
    p.add_argument("--bloom", action="store_true", help="enable the partitioned-Bloom URL-seen sidecar")
    p.add_argument("--bloom-partitions", type=int, default=64)
    p.add_argument("--opic", action="store_true", help="enable OPIC cash priority (A7)")
    p.add_argument("--no-resume", action="store_true", help="ignore existing checkpoint")
    # sink gating (base.js:185-187: argv.records === false skips writeRecord;
    # the --no-files twin gates downloadFile): the crawl itself — fetches,
    # URL-seen updates, checkpoints — is unaffected, only the sink writes are
    p.add_argument("--no-records", dest="records", action="store_false",
                   help="crawl but skip the records sink")
    p.add_argument("--no-files", dest="files", action="store_false",
                   help="skip the image/file sink")
    p.add_argument("--assets-source", default=None,
                   help="parquet (url, bytes): fetch record images from this "
                        "source into <out>/assets (gated by --no-files)")
    return p


def load_connectors(path: str | None):
    if not path:
        return None
    from crawler_spark.operators.extract import ConnectorConfig

    with open(path) as fh:
        raw = json.load(fh)
    out = {}
    for cid, kv in raw.items():
        kv = dict(kv)
        kv.setdefault("connector_id", cid)
        if "drop_params" in kv:
            kv["drop_params"] = frozenset(kv["drop_params"])
        out[cid] = ConnectorConfig(**kv)
    return out


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)

    from pyspark.sql import SparkSession

    from crawler_spark.plans.rounds import CrawlEngine, EngineConfig

    owned = SparkSession.getActiveSession() is None
    spark = (
        SparkSession.builder.appName("crawler_spark")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    if args.fetch_mode == "fixture" and not args.pages:
        raise SystemExit("--pages is required in fixture mode")
    pages = spark.read.parquet(args.pages) if args.pages else None
    seeds = spark.read.parquet(args.seeds)
    politeness = spark.read.parquet(args.politeness) if args.politeness else None

    cfg = EngineConfig(
        ckpt_dir=args.ckpt,
        default_budget=args.budget,
        global_batch=args.global_batch,
        max_rounds=args.max_rounds,
        use_bloom=args.bloom,
        bloom_partitions=args.bloom_partitions,
        use_opic=args.opic,
        fetch_mode=args.fetch_mode,
        fetch_timeout_s=args.fetch_timeout,
    )
    eng = CrawlEngine(
        spark, pages, seeds, politeness, cfg,
        connectors=load_connectors(args.connectors),
    )
    res = eng.run(resume=not args.no_resume)

    outputs = [
        ("webtext", res.webtext),
        ("url_seen", res.url_seen),
        ("fetch_log", res.fetch_log),
    ]
    if args.records:  # --no-records: crawl ran, sink skipped (base.js:185-187)
        outputs.insert(0, ("records", res.records))
    for name, df in outputs:
        df.write.mode("overwrite").parquet(f"{args.out}/{name}")

    n_assets = None
    if args.files and args.assets_source:
        from crawler_spark.operators.assets import fetch_assets, image_targets

        source = spark.read.parquet(args.assets_source)
        assets = fetch_assets(image_targets(res.records), source)
        assets.write.mode("overwrite").parquet(f"{args.out}/assets")
        n_assets = assets.count()

    print(json.dumps({
        "rounds": res.rounds,
        "records": res.records.count() if args.records else None,
        "webtext": res.webtext.count(),
        "url_seen": res.url_seen.count(),
        "assets": n_assets,
        "metrics": res.metrics,
    }))
    if owned:  # embedding callers (tests) keep their session
        spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
