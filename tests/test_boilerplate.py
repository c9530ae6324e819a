"""Boilerplate removal (functions/boilerplate.py): block segmentation,
link-density classification, entity decode, and the page-level report."""

from pyspark.sql import functions as F

from crawler_spark.functions.boilerplate import (
    boilerplate_report,
    extract_main_text,
)

PROSE = (
    "Silk weaving in seventeenth century Lyon combined imported warp "
    "threads with local dye houses along the river."
)
PROSE2 = (
    "The jacquard loom mechanized pattern selection and let a single "
    "weaver produce figured velvet at scale."
)


def _main(spark, html, **kw):
    df = spark.createDataFrame([(html,)], "html string")
    return df.select(
        extract_main_text(F.col("html"), **kw).alias("t")
    ).first()["t"]


def test_keeps_prose_drops_nav_and_footer(spark):
    html = (
        "<html><body>"
        '<nav><a href="/">Home</a> <a href="/a">About</a> '
        '<a href="/c">Contact</a></nav>'
        f"<p>{PROSE}</p>"
        f"<p>{PROSE2}</p>"
        '<footer><a href="/tos">Terms</a> <a href="/priv">Privacy</a>'
        "</footer></body></html>"
    )
    assert _main(spark, html) == f"{PROSE}\n{PROSE2}"


def test_link_density_drops_link_farm_but_keeps_linked_prose(spark):
    farm = " ".join(f'<a href="/t/{i}">tag number {i}</a>' for i in range(12))
    linked_prose = (
        f'{PROSE[:60]} <a href="/lyon">Lyon</a> {PROSE[60:]}'
    )
    html = f"<div>{farm}</div><p>{linked_prose}</p>"
    out = _main(spark, html)
    assert "tag number" not in out
    assert "Lyon" in out and out.startswith(PROSE[:40])


def test_min_chars_drops_stubs(spark):
    html = f"<p>Menu</p><p>{PROSE}</p><p>ok then</p>"
    assert _main(spark, html) == PROSE
    # threshold is a knob
    assert "ok then" in _main(spark, html, min_chars=5)


def test_script_style_comments_stripped(spark):
    html = (
        f"<script>var x = 'not content enough to pass the length bar';"
        f"</script><style>p {{ color: red; }}</style>"
        f"<!-- a comment long enough to pass the length bar easily -->"
        f"<p>{PROSE}</p>"
    )
    assert _main(spark, html) == PROSE


def test_entities_and_whitespace(spark):
    body = "Warp &amp; weft &quot;figured&quot; velvet &lt;samite&gt; " + (
        "with uneven   spacing and a trailing run of words long enough"
    )
    html = f"<p>{body}</p>"
    out = _main(spark, html)
    assert out == (
        'Warp & weft "figured" velvet <samite> with uneven spacing and '
        "a trailing run of words long enough"
    )


def test_empty_and_chrome_only_pages(spark):
    assert _main(spark, "<nav><a href='/'>Home</a></nav>") == ""
    assert _main(spark, "") == ""


def test_report_columns(spark):
    farm = " ".join(f'<a href="/t/{i}">tag number {i}</a>' for i in range(12))
    html = f"<div>{farm}</div><p>{PROSE}</p>"
    df = spark.createDataFrame(
        [("u1", html.encode()), ("u2", b"<p>tiny</p>")],
        "url string, html binary",
    )
    out = {r["url"]: r for r in boilerplate_report(df).collect()}
    r1 = out["u1"]
    assert r1["main_text"] == PROSE
    assert r1["n_blocks"] == 2 and r1["n_kept"] == 1
    assert 0.0 < r1["content_ratio"] < 1.0
    r2 = out["u2"]
    assert r2["main_text"] == "" and r2["n_kept"] == 0
    assert r2["content_ratio"] == 0.0


def test_whole_stage_codegen_no_python(spark):
    # the entire extraction must stay JVM-side: no BatchEvalPython /
    # ArrowEvalPython / mapInPandas in the physical plan
    df = spark.createDataFrame([("<p>x</p>",)], "html string")
    plan = (
        df.select(extract_main_text(F.col("html")))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Python" not in plan and "InPandas" not in plan
