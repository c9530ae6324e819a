"""spark-submit CLI surface: end-to-end run over parquet inputs, sink gating
(--no-records / --no-files, base.js:185-187), and the asset sink stage."""

import json
import os

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def inputs(spark, tmp_path_factory):
    from crawler_spark.sources.sitegen import SiteSpec, generate_site, site_to_spark

    root = tmp_path_factory.mktemp("cli_inputs")
    site = generate_site(SiteSpec(n_hosts=2, details_per_host=8, limit=4))
    sdfs = site_to_spark(spark, site)
    paths = {}
    for name in ("pages", "seeds", "politeness"):
        p = str(root / name)
        sdfs[name].write.parquet(p)
        paths[name] = p
    # asset source: bytes for the detail-record image urls (valid JPEG
    # magic); related-record images stay missing → error rows exercised
    jpeg = b"\xff\xd8\xff\xe0" + b"\x00" * 16
    src = spark.createDataFrame(
        [(f"http://h{h}.example.test/img/{i}_{k}.jpg", bytearray(jpeg))
         for h in range(2) for i in range(1, 9) for k in range(3)],
        "url string, bytes binary",
    )
    p = str(root / "assets_src")
    src.write.parquet(p)
    paths["assets_src"] = p
    return paths


def _run(paths, tmp_path, extra):
    from crawler_spark.cli import main

    out = str(tmp_path / "out")
    rc = main(
        [
            "--pages", paths["pages"],
            "--seeds", paths["seeds"],
            "--politeness", paths["politeness"],
            "--ckpt", str(tmp_path / "ckpt"),
            "--out", out,
            "--budget", "6",
            "--bloom",
            "--bloom-partitions", "4",
        ]
        + extra
    )
    assert rc == 0
    return out


def test_cli_full_run_with_assets(spark, inputs, tmp_path, capsys):
    out = _run(inputs, tmp_path, ["--assets-source", inputs["assets_src"]])
    stats = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert stats["records"] > 0 and stats["webtext"] > 0
    assert stats["assets"] is not None and stats["assets"] > 0
    assert os.path.isdir(f"{out}/records") and os.path.isdir(f"{out}/assets")
    assets = spark.read.parquet(f"{out}/assets")
    ok = assets.where(~F.col("has_error")).count()
    assert ok > 0  # source bytes resolved + magic-validated


def test_cli_no_records_no_files(spark, inputs, tmp_path, capsys):
    out = _run(
        inputs, tmp_path,
        ["--no-records", "--no-files", "--assets-source", inputs["assets_src"]],
    )
    stats = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    # crawl ran (webtext/url_seen written) but both sinks were gated
    assert stats["webtext"] > 0 and stats["url_seen"] > 0
    assert stats["records"] is None and stats["assets"] is None
    assert not os.path.isdir(f"{out}/records")
    assert not os.path.isdir(f"{out}/assets")
    assert os.path.isdir(f"{out}/webtext")


def test_cli_curation_flags(spark, inputs, tmp_path, capsys):
    """--keep-best / --dedup-paragraphs argv plumbing: the flags thread
    into EngineConfig and the curated webtext parquet lands (semantics are
    value-tested in test_curation_engine; this pins the CLI surface). On a
    dup-free fixture both passes must be no-ops — same rows as baseline."""
    base_out = _run(inputs, tmp_path, ["--no-files"])
    capsys.readouterr()
    cur_out = _run(
        inputs, tmp_path / "cur",
        ["--no-files", "--keep-best", "--keep-best-threshold", "0.62",
         "--dedup-paragraphs"],
    )
    stats = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    base_wt = spark.read.parquet(f"{base_out}/webtext")
    cur_wt = spark.read.parquet(f"{cur_out}/webtext")
    assert stats["webtext"] == cur_wt.count()
    assert sorted(r["url"] for r in cur_wt.collect()) == sorted(
        r["url"] for r in base_wt.collect()
    )


def test_cli_force_recrawls(spark, inputs, tmp_path, capsys):
    """--force (base.js:165): a second run over the same inputs re-crawls
    everything instead of no-op'ing against the seen set."""
    out1 = _run(inputs, tmp_path, [])
    stats1 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    # plain re-run with the same ckpt: frontier exhausted → nothing fetched
    _run(inputs, tmp_path, [])
    stats2 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert sum(m["fetched_ok"] for m in stats2["metrics"]) == 0
    # forced re-run: everything fetched again, same record set
    _run(inputs, tmp_path, ["--force"])
    stats3 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert stats3["records"] == stats1["records"] > 0
    assert sum(m["fetched_ok"] for m in stats3["metrics"]) > 0
    assert out1  # same out dir rewritten


def test_cli_list_fields(spark, inputs, tmp_path, capsys):
    """--list-fields (silknow-crawler.js:34-36): no crawl — markdown fields
    report over the checkpointed records."""
    from crawler_spark.cli import main

    _run(inputs, tmp_path, [])
    capsys.readouterr()
    rc = main([
        "--ckpt", str(tmp_path / "ckpt"),
        "--out", str(tmp_path / "out"),
        "--list-fields",
    ])
    assert rc == 0
    md = capsys.readouterr().out
    assert md.startswith("| label | records | multi-value | sample |")
    assert "| Material |" in md and "| Dimensions |" in md


def test_cli_check_images(spark, inputs, tmp_path, capsys):
    """--check-images (silknow-crawler.js:37-40): audit both directions and
    re-fetch errored assets from the source."""
    from crawler_spark.cli import main

    _run(inputs, tmp_path, ["--assets-source", inputs["assets_src"]])
    capsys.readouterr()
    out = str(tmp_path / "out")
    before = spark.read.parquet(f"{out}/assets")
    n_before = before.count()
    n_err = before.where(F.col("has_error")).count()
    assert n_err > 0  # related-record images are absent from the source
    rc = main([
        "--ckpt", str(tmp_path / "ckpt"),
        "--out", out,
        "--assets-source", inputs["assets_src"],
        "--check-images",
    ])
    assert rc == 0
    stats = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert stats["errored_before"] == n_err
    # source still lacks those urls → counts unchanged, rows preserved
    assert stats["errored_after"] == n_err
    after = spark.read.parquet(f"{out}/assets")  # rewritten in place
    assert after.count() == n_before
    assert stats["referenced_not_stored"] >= 0
    assert stats["stored_not_referenced"] >= 0


def test_load_connectors_types(tmp_path):
    """JSON connector configs round-trip into TYPED dataclasses: the
    secondary_fetches hops are attribute-accessed inside executor closures
    (sfs[0].from_field), so raw dicts would crash the round."""
    import json as _json

    from crawler_spark.cli import load_connectors
    from crawler_spark.operators.extract import SecondaryFetch

    p = tmp_path / "connectors.json"
    p.write_text(_json.dumps({
        "gallica": {
            "drop_params": ["utm"],
            "skip_keys": ["image"],
            "strip_params": ["offset"],
            "secondary_fetches": [
                {"kind": "notice", "from_field": "Notice"},
                {"kind": "book", "link_selector": "div.appartient a"},
            ],
        }
    }))
    cfgs = load_connectors(str(p))
    g = cfgs["gallica"]
    assert g.connector_id == "gallica"
    assert g.drop_params == frozenset({"utm"})
    assert g.skip_keys == frozenset({"image"})
    assert g.strip_params == ("offset",)
    assert all(isinstance(sf, SecondaryFetch) for sf in g.secondary_fetches)
    assert g.secondary_fetches[0].from_field == "Notice"
    assert g.secondary_fetches[1].kind == "book"


def test_cli_url_gate_flags(spark, inputs, tmp_path, capsys):
    """--url-blocklist (parquet) + --url-junk-filter thread through to the
    engine: a full-domain blocklist leaves only the seed fetches."""
    blk = str(tmp_path / "blk")
    spark.createDataFrame([("example.test",)], ["domain"]).write.parquet(blk)
    out = _run(
        inputs, tmp_path,
        ["--url-junk-filter", "--url-blocklist", blk, "--no-files"],
    )
    stats = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert stats["records"] == 0
    fl = spark.read.parquet(f"{out}/fetch_log")
    urls = [r["url"] for r in fl.select("url").collect()]
    assert urls and all("/search" in u for u in urls)


def test_cli_trap_detection_flag(spark, inputs, tmp_path, capsys):
    """--trap-detection threads through: with thresholds every host crosses
    after round 1, discovery shuts off and the sidecar is persisted."""
    import os

    _run(
        inputs, tmp_path,
        ["--trap-detection", "--trap-min-urls", "2",
         "--trap-dup-ratio", "1.0", "--no-files"],
    )
    capsys.readouterr()
    assert os.path.isdir(str(tmp_path / "ckpt" / "trap_sketches"))


def test_cli_canonical_collapse_flag(spark, inputs, tmp_path, capsys):
    """--canonical-collapse threads through: the alias sidecar directory is
    created (fixture pages declare no canonicals, so it stays empty — the
    wiring, not the rewrite, is under test here; rewrite semantics live in
    test_canonical_engine.py)."""
    import os

    _run(inputs, tmp_path, ["--canonical-collapse", "--no-files"])
    capsys.readouterr()
    assert os.path.isdir(str(tmp_path / "ckpt" / "canonical_aliases"))


def test_cli_lang_detect_and_warc_out_flags(spark, inputs, tmp_path, capsys):
    """--lang-detect and --warc-out thread through in one run: the WARC
    mirror directory materializes per round (the archive is scan-verified
    in test_lang_warc_engine; this pins the argv plumbing)."""
    import os

    warc_dir = str(tmp_path / "warcs")
    _run(inputs, tmp_path,
         ["--lang-detect", "--warc-out", warc_dir, "--no-files"])
    capsys.readouterr()
    rounds = [d for d in os.listdir(warc_dir) if d.startswith("round=")]
    assert rounds, "no per-round WARC mirror written"
