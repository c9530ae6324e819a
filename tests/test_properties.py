"""Property/fuzz tests (SURVEY.md §5.2.5) — pure-Python, no SparkSession:

* the HTML parser never crashes on arbitrary input (crawls see garbage),
* field-merge semantics match a reference model under random field rows
  (record.js:22-37: order-preserving, scalar→array promotion on repeat),
* cheerio-parity text(): concatenation of text nodes, <br>→newline option.
"""

import html as _html

from hypothesis import given, settings
from hypothesis import strategies as st

from crawler_spark.operators.extract import (
    SYNTH,
    extract_detail,
    parse_html,
    select,
)


@settings(max_examples=200, deadline=None)
@given(st.text(max_size=500))
def test_parser_never_crashes(s):
    root = parse_html(s)
    # selectors over arbitrary soup must not raise either
    select(root, "tr.field td.value")
    root.text(br_as_newline=True)


@settings(max_examples=100, deadline=None)
@given(st.binary(max_size=300))
def test_parser_handles_arbitrary_bytes(b):
    parse_html(b).text()


_label = st.sampled_from(["Material", "Date", "Maker", "Technique"])
_value = st.text(
    alphabet=st.characters(whitelist_categories=("Lu", "Ll", "Nd"), max_codepoint=0x2FF),
    min_size=1,
    max_size=20,
)


@settings(max_examples=100, deadline=None)
@given(st.lists(st.tuples(_label, _value), max_size=10))
def test_field_merge_matches_reference_model(rows):
    """Random (label, value) rows rendered to HTML, extracted, and compared
    against the addField model: first-seen label order, values appended."""
    html_doc = "<html><body><h1 class='title'>T</h1><table>" + "".join(
        f"<tr class='field'><td class='label'>{_html.escape(l)}</td>"
        f"<td class='value'>{_html.escape(v)}</td></tr>"
        for l, v in rows
    ) + "</table></body></html>"
    rec = extract_detail(html_doc, "http://x.test/r/1", SYNTH)

    # reference model (record.js:22-37): skip empty after trim, merge by
    # label preserving first-seen order
    model: dict[str, list[str]] = {}
    order: list[str] = []
    for l, v in rows:
        v = v.strip()
        if not l or not v:
            continue
        if l not in model:
            model[l] = []
            order.append(l)
        model[l].append(v)
    assert [l for l, _ in rec["fields"]] == order
    assert {l: vs for l, vs in rec["fields"]} == model


def test_br_to_newline_and_trim_parity():
    html_doc = (
        "<html><body><h1 class='title'>  T </h1><table>"
        "<tr class='field'><td class='label'>D</td>"
        "<td class='value'>  a <b>b</b><br>c  </td></tr>"
        "</table></body></html>"
    )
    rec = extract_detail(html_doc, "http://x.test/r/1", SYNTH)
    # cheerio text(): concat of text nodes verbatim ("a b" keeps inner
    # spacing), <br> becomes \n BEFORE trim (les-arts-decoratifs.js:122)
    assert rec["fields"] == [("D", ["a b\nc"])]
