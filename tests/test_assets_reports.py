"""Asset sink (S12/S13/A5/F6), images-checker (J3) and reporting jobs
(A4 fields-lister, U3 missing-images audit)."""

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

JPEG = b"\xff\xd8\xff\xe0" + b"\x00" * 20
PNG = b"\x89PNG\r\n\x1a\n" + b"\x00" * 20
JUNK = b"not an image at all....."


@pytest.fixture(scope="module")
def records(spark):
    def img(url):
        return Row(
            id=None, url=url, title=None, description=None, author=None,
            license=None, text=None, localFilename=None, hasError=False,
        )

    rows = [
        Row(
            id="rec/1",  # reserved char → filenamify '!'
            fields=[
                Row(label="material", values=["silk", "velvet"]),
                Row(label="title", values=["A"]),
            ],
            images=[img("http://a.test/i1.jpg"), img("http://a.test/i2.jpg")],
        ),
        Row(
            id="rec2",
            fields=[
                Row(label="material", values=["wool"]),
                Row(label="empty", values=[]),
            ],
            images=[img("http://a.test/i2.jpg"), img("http://a.test/i3.jpg")],
        ),
    ]
    schema = (
        "id string, "
        "fields array<struct<label:string,values:array<string>>>, "
        "images array<struct<id:string,url:string,title:string,"
        "description:string,author:string,license:string,text:string,"
        "localFilename:string,hasError:boolean>>"
    )
    return spark.createDataFrame(rows, schema)


@pytest.fixture(scope="module")
def source(spark):
    return spark.createDataFrame(
        [
            ("http://a.test/i1.jpg", bytearray(JPEG)),
            ("http://a.test/i2.jpg", bytearray(JUNK)),
            # i3 missing entirely → fetch error path
        ],
        "url string, bytes binary",
    )


def test_image_targets_naming(spark, records):
    from crawler_spark.operators.assets import image_targets

    rows = {
        (r["record_id"], r["img_idx"]): r["filename"]
        for r in image_targets(records).collect()
    }
    assert rows[("rec/1", 0)] == "rec!1_0.jpg"  # F6 filenamify + A5 index
    assert rows[("rec/1", 1)] == "rec!1_1.jpg"
    assert rows[("rec2", 1)] == "rec2_1.jpg"


def test_image_targets_connector_namespacing(spark):
    """Two connectors' records with the same id must not collide on
    filename (the reference writes each museum's downloads into its own
    directory, base.js:124-138): with a connector_id column, filenames are
    namespaced <connector_id>/<id>_<idx>.jpg."""
    from pyspark.sql import Row

    from crawler_spark.operators.assets import image_targets

    def img(url):
        return Row(
            id=None, url=url, title=None, description=None, author=None,
            license=None,
        )

    recs = spark.createDataFrame(
        [
            Row(id="123", connector_id="a", images=[img("http://x/1.jpg")]),
            Row(id="123", connector_id="b", images=[img("http://y/1.jpg")]),
        ],
        "id string, connector_id string, images array<struct<id:string,"
        "url:string,title:string,description:string,author:string,"
        "license:string>>",
    )
    fnames = {r["filename"] for r in image_targets(recs).collect()}
    assert fnames == {"a/123_0.jpg", "b/123_0.jpg"}


def test_fetch_assets_validation_and_skip(spark, records, source):
    from crawler_spark.operators.assets import fetch_assets, image_targets

    targets = image_targets(records)
    assets = fetch_assets(targets, source)
    rows = assets.collect()
    by_fname = {r["filename"]: r for r in rows}
    # shared i2 url → one file per record (base.js keys on <id>_<idx>.jpg)
    assert len(rows) == 4
    assert {r["url"] for r in rows if r["filename"].startswith("rec!1")} == {
        "http://a.test/i1.jpg", "http://a.test/i2.jpg"
    }
    assert not by_fname["rec!1_0.jpg"]["has_error"]  # valid JPEG
    assert by_fname["rec!1_1.jpg"]["has_error"]  # magic-byte fail (S13)
    assert by_fname["rec2_0.jpg"]["has_error"]  # same url, own file
    assert by_fname["rec2_1.jpg"]["has_error"]  # missing → error
    assert by_fname["rec2_1.jpg"]["bytes"] is None

    # skip-if-exists keys on the destination file (base.js:135-138 existsSync)
    existing = spark.createDataFrame(
        [("http://a.test/i1.jpg", "rec!1_0.jpg")], "url string, filename string"
    )
    again = fetch_assets(targets, source, existing=existing)
    assert "rec!1_0.jpg" not in {r["filename"] for r in again.collect()}


def test_recheck_errored_repairs(spark, records, source):
    from crawler_spark.operators.assets import fetch_assets, image_targets, recheck_errored

    assets = fetch_assets(image_targets(records), source)
    # the server "fixed" i2 (now a PNG); i3 still missing
    repaired_source = spark.createDataFrame(
        [
            ("http://a.test/i2.jpg", bytearray(PNG)),
        ],
        "url string, bytes binary",
    )
    rechecked = recheck_errored(assets, repaired_source)
    by_url = {r["url"]: r for r in rechecked.collect()}
    assert not by_url["http://a.test/i2.jpg"]["has_error"]  # flag cleared (J3)
    assert bytes(by_url["http://a.test/i2.jpg"]["bytes"]) == PNG
    assert by_url["http://a.test/i3.jpg"]["has_error"]  # still broken
    assert not by_url["http://a.test/i1.jpg"]["has_error"]  # untouched


def test_fields_report(spark, records):
    from crawler_spark.plans.reports import fields_report, fields_report_markdown

    rep = {r["label"]: r for r in fields_report(records).collect()}
    assert rep["material"]["n_records"] == 2
    assert rep["material"]["n_multi_value"] == 1  # ["silk","velvet"]
    assert rep["material"]["sample_value"] in ("silk", "wool")
    assert rep["empty"]["sample_value"] is None
    md = fields_report_markdown(fields_report(records))
    assert "| material | 2 | 1 |" in md


def test_missing_images(spark, records, source):
    from crawler_spark.plans.reports import missing_images

    assets = source  # i1, i2 stored; i3 referenced-but-missing
    extra = spark.createDataFrame(
        [("http://a.test/orphan.jpg", bytearray(JPEG))],
        "url string, bytes binary",
    )
    diff = missing_images(records, assets.unionByName(extra))
    got = {(r["direction"], r["url"]) for r in diff.collect()}
    assert ("referenced_not_stored", "http://a.test/i3.jpg") in got
    assert ("stored_not_referenced", "http://a.test/orphan.jpg") in got
    assert len(got) == 2
