"""Packaging contract (north rule: run via ``spark-submit --py-files``):
build dist/crawler_spark.zip and drive a real ``spark-submit`` subprocess
with ONLY the zip on the import path — no repo checkout, no PYTHONPATH —
proving the packaged engine is self-contained end-to-end (M7,
tools/build_dist.py + scripts/run_crawl.py)."""

import os
import subprocess
import sys

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _spark_submit() -> str:
    import pyspark

    cand = os.path.join(os.path.dirname(pyspark.__file__), "bin", "spark-submit")
    return cand if os.path.exists(cand) else "spark-submit"


def test_spark_submit_py_files_crawl(spark, tmp_path):
    from crawler_spark.sources.sitegen import SiteSpec, generate_site, site_to_spark

    sys.path.insert(0, os.path.join(ROOT, "tools"))
    import build_dist

    zip_path = build_dist.main()
    assert os.path.exists(zip_path)

    site = generate_site(SiteSpec(n_hosts=2, details_per_host=6, limit=4))
    sdfs = site_to_spark(spark, site)
    paths = {}
    for name in ("pages", "seeds", "politeness"):
        p = str(tmp_path / name)
        sdfs[name].write.parquet(p)
        paths[name] = p

    out = str(tmp_path / "out")
    env = dict(os.environ)
    env.pop("PYTHONPATH", None)  # the zip must be the ONLY source of the pkg
    proc = subprocess.run(
        [
            _spark_submit(),
            "--master", "local[2]",
            "--py-files", zip_path,
            os.path.join(ROOT, "scripts", "run_crawl.py"),
            "--pages", paths["pages"],
            "--seeds", paths["seeds"],
            "--politeness", paths["politeness"],
            "--ckpt", str(tmp_path / "ckpt"),
            "--out", out,
            "--budget", "8",
        ],
        cwd=str(tmp_path),  # repo not importable from cwd either
        env=env,
        capture_output=True,
        text=True,
        timeout=420,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    got = spark.read.parquet(f"{out}/records")
    assert got.count() > 0
    assert spark.read.parquet(f"{out}/webtext").count() == got.count()
