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
