"""Extraction semantics: cheerio-equivalent text(), br→newline, field merge,
image dedup (SURVEY.md §2.8 F3/F4, §2.4 A3, §2.7 U2)."""

from crawler_spark.operators.extract import (
    SYNTH,
    extract_detail,
    extract_search,
    parse_html,
    select,
)


def test_text_concat_no_added_whitespace():
    # cheerio .text() = concatenation of descendant text nodes, verbatim
    root = parse_html("<div>a<span>b</span>c</div>")
    assert root.text() == "abc"


def test_br_to_newline_only_when_asked():
    root = parse_html("<td>x<br>y</td>")
    td = select(root, "td")[0]
    assert td.text() == "xy"
    assert td.text(br_as_newline=True) == "x\ny"


def test_entities_decoded():
    root = parse_html("<p>a &amp; b &lt;c&gt;</p>")
    assert select(root, "p")[0].text() == "a & b <c>"


def test_selector_subset():
    html = (
        '<div class="a"><p id="p1">one</p></div>'
        '<div class="b"><p>two</p></div>'
    )
    root = parse_html(html)
    assert [n.text() for n in select(root, "div.a p")] == ["one"]
    assert select(root, "#p1")[0].text() == "one"
    assert len(select(root, "p")) == 2


DETAIL = """
<html><body>
<h1 class="title">  My Record </h1>
<table class="fields">
<tr class="field"><td class="label"> Material </td><td class="value">silk</td></tr>
<tr class="field"><td class="label">Material</td><td class="value">velvet</td></tr>
<tr class="field"><td class="label">Description</td><td class="value">  one<br>two </td></tr>
<tr class="field"><td class="label">Empty</td><td class="value">   </td></tr>
</table>
<div class="images"><img src="/i/1.jpg" title="Front" alt="front view"><img src="/i/2.jpg"><img src="/i/1.jpg"></div>
<div class="related"><a href="/record/r1">rel</a></div>
</body></html>
"""


def test_detail_semantics():
    rec = extract_detail(DETAIL, "http://h.io/record/5", SYNTH)
    assert rec["title"] == "My Record"
    # addField merge: repeated label appends values (record.js:22-37)
    assert rec["fields"][0] == ("Material", ["silk", "velvet"])
    # br→newline + trim (les-arts-decoratifs.js:122, mtmad.js:153-163)
    assert rec["fields"][1] == ("Description", ["one\ntwo"])
    # empty value dropped (record.js:14-21)
    assert all(label != "Empty" for label, _ in rec["fields"])
    # image url dedup preserving first-seen order (record.js:47-50)
    assert [i["url"] for i in rec["images"]] == [
        "http://h.io/i/1.jpg", "http://h.io/i/2.jpg"
    ]
    # metadata from tag attrs (mfa-boston.js:105-114 title/alt)
    assert rec["images"][0]["title"] == "Front"
    assert rec["images"][0]["description"] == "front view"
    assert rec["images"][1]["title"] is None
    assert rec["related"] == ["http://h.io/record/r1"]
    assert rec["text"] == (
        "My Record\nMaterial\tsilk\nMaterial\tvelvet\nDescription\tone\ntwo"
    )


def test_search_page():
    html = (
        '<div id="count">42 results</div>'
        '<ul class="results"><li class="result"><a href="/record/1">x</a></li>'
        '<li class="result"><a href="/record/2">y</a></li></ul>'
    )
    total, urls = extract_search(html, "http://h.io/search?page=1", SYNTH)
    assert total == 42
    assert urls == ["http://h.io/record/1", "http://h.io/record/2"]


def test_sitegen_golden_text_matches_parser():
    """The generator's golden text (composed from raw values, no parser) must
    equal what the extraction UDF parses from the HTML — the byte-parity gate
    in miniature."""
    from crawler_spark.sources.sitegen import SiteSpec, generate_site

    site = generate_site(SiteSpec(n_hosts=3, details_per_host=12, limit=5))
    n_checked = 0
    for row in site["pages"].itertuples():
        if "/record/" not in row.url:
            continue
        rec = extract_detail(row.html, row.url, SYNTH)
        assert rec["text"] == row.text, row.url
        n_checked += 1
    assert n_checked > 30


def test_extractors_never_raise_on_junk():
    """Extraction runs inside the fetch hot path — one raising row would
    fail a whole Arrow batch/round. Every body format must degrade to an
    empty record on arbitrary junk, never raise."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from crawler_spark.operators.extract import (
        ConnectorConfig,
        extract_detail,
        extract_search,
    )

    formats = ["html", "json", "es_msearch", "graphql"]

    @given(st.binary(max_size=200), st.sampled_from(formats))
    @settings(max_examples=200, deadline=None)
    def run(junk, fmt):
        cfg = ConnectorConfig(connector_id="fz", body_format=fmt)
        total, urls = extract_search(junk, "http://h.io/s?page=1", cfg)
        assert total is None or isinstance(total, int)
        assert isinstance(urls, list)
        rec = extract_detail(junk, "http://h.io/r/1", cfg)
        assert isinstance(rec["fields"], list)
        assert isinstance(rec["text"], str)

    run()


def test_extractors_never_raise_on_jsonish():
    """Valid JSON of the WRONG shape (arrays, scalars, nulls in odd
    places) must also degrade gracefully in the typed paths."""
    import json as _json

    from crawler_spark.operators.extract import (
        ConnectorConfig,
        extract_detail,
        extract_search,
    )

    shapes = [
        "[]", "1", "null", '"str"', "{}",
        '{"responses": []}', '{"responses": [{}]}',
        '{"responses": [{"hits": null}]}',
        '{"responses": [{"hits": {"hits": [null, {"_source": null}]}}]}',
        '{"data": null}', '{"data": {"nodeQuery": null}}',
        '{"data": {"nodeQuery": {"entities": [null, 1, "x"]}}}',
        '{"records": null}', '{"fields": null, "images": null}',
        '{"fields": [{"label": null, "value": {}}], "related": [null]}',
        '{"title": 7, "fieldVisuels": [null, {"entity": null}]}',
    ]
    for fmt in ("json", "es_msearch", "graphql"):
        cfg = ConnectorConfig(connector_id="fz", body_format=fmt)
        for s in shapes:
            extract_search(s, "http://h.io/s?page=1", cfg)
            rec = extract_detail(s, "http://h.io/r/1", cfg)
            assert isinstance(rec["text"], str)


def test_total_bool_rejected_and_nonstring_related_skipped():
    """``"total": true`` must not parse as count 1 (int(True)) in any of
    the three typed search paths, and a non-string entry in a GraphQL
    entity's related list is skipped — not an AttributeError that kills
    the whole Arrow batch."""
    import json

    from crawler_spark.operators.extract import (
        SYNTH,
        extract_detail_graphql,
        extract_search_es_msearch,
        extract_search_graphql,
        extract_search_json,
    )

    t, _ = extract_search_json(
        json.dumps({"total": True, "records": []}), "http://h/s", SYNTH
    )
    assert t is None
    t, _ = extract_search_es_msearch(
        json.dumps({"responses": [{"hits": {"total": True, "hits": []}}]}),
        "http://h/s",
        SYNTH,
    )
    assert t is None
    t, _ = extract_search_graphql(
        json.dumps({"data": {"nodeQuery": {"count": True, "entities": []}}}),
        "http://h/s",
        SYNTH,
    )
    assert t is None

    rec = extract_detail_graphql(
        json.dumps({"title": "T", "related": [123, None, "/ok"]}),
        "http://h/r/1",
        SYNTH,
    )
    assert rec["related"] == ["http://h/ok"]


def test_detail_json_number_semantics():
    """The fields-list JSON path stringifies numbers like JS String(value)
    too (vam.js:74-76): 1.0 → '1', non-integral floats unchanged."""
    import json

    from crawler_spark.operators.extract import SYNTH, extract_detail_json

    body = json.dumps({
        "title": "T",
        "fields": [
            {"label": "a", "value": 1.0},
            {"label": "b", "values": [1.5, 3]},
        ],
    }).encode()
    rec = extract_detail_json(body, "http://h/x", SYNTH)
    assert "a\t1" in rec["text"]
    assert "b\t1.5" in rec["text"]
    assert "b\t3" in rec["text"]


def test_scalar_pairs_js_number_semantics():
    """JSON numbers stringify like JS String(value): 1.0 → '1' (integral
    floats drop the trailing .0), non-integral floats keep their digits —
    joconde.js:145-156 folds _source numbers into field text this way."""
    from crawler_spark.operators.extract import SYNTH, _scalar_pairs

    rec = {"a": 1.0, "b": 1.5, "c": 7, "d": ["x", 2.0, 2.25], "e": True}
    got = dict(_scalar_pairs(rec, SYNTH))
    assert got["a"] == ["1"]
    assert got["b"] == ["1.5"]
    assert got["c"] == ["7"]
    assert got["d"] == ["x", "2", "2.25"]
    assert "e" not in got  # booleans skipped
