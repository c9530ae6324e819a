"""Differential tests: the fast-path tokenizer must build the EXACT tree
the stdlib ``HTMLParser(convert_charrefs=True)`` path builds — including its
no-``close()`` quirks (truncated constructs and split trailing charrefs stay
buffered, i.e. dropped) — or bail to it.  The per-row invariant of the whole
engine (byte-identical extracted text per url, BASELINE input_hint) rides on
this equivalence, so it is pinned three ways: hand-written adversarial
cases, sitegen's full generated corpus, and hypothesis fuzz over random
fragment compositions and truncations."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from crawler_spark.operators.extract import (
    Node,
    _fast_parse,
    _TreeBuilder,
    parse_html,
)


def _stdlib_tree(html: str) -> Node:
    b = _TreeBuilder()
    b.feed(html)
    return b.root


def _ser(node: Node):
    """Full structural serialization: tag, attrs, and children with raw
    text-chunk boundaries (chunking is part of the equivalence claim — both
    paths emit one chunk per goahead data segment)."""
    kids = [c if isinstance(c, str) else _ser(c) for c in node.children]
    return (node.tag, sorted(node.attrs.items()), kids)


def _assert_equiv(html: str) -> None:
    ref = _ser(_stdlib_tree(html))
    fast = _fast_parse(html)
    if fast is not None:  # fast path claimed the document
        assert _ser(fast) == ref, html
    # the public entry must equal stdlib regardless of which path ran
    assert _ser(parse_html(html)) == ref, html


HAND_CASES = [
    # well-formed spine
    '<html><body><h1>rec </h1><a href="/record/7">a</a>'
    '<a href="/record/13">b</a></body></html>',
    '<div class="a b" id=x><p>hi &amp; bye</p><br/><img src=/i.png alt="">'
    "</div>",
    "<a href='/x' DATA-Foo = \"Y&lt;Z\" checked>t</a>",
    # CDATA content elements: raw text, case-insensitive close, '<' inside
    '<script>if (a<b && c>d) {x="</scr"+"ipt>"}</script><p>after</p>',
    '<SCRIPT TYPE="text/js">var x=1;</SCRIPT>ok',
    "<style>p>a{color:red}</style>tail",
    "<script/>not-cdata<p>x</p>",
    "<script>no close tag",
    # comments / doctype / pi / declarations (all no-op handlers)
    "<!-- comment <a href=x> --><p>z</p>",
    "<!-- unterminated",
    "<!---->empty<!-- -->",
    "<!DOCTYPE html><html><body>x</body></html>",
    "<?php echo 1 ?><p>q</p>",
    "<!weird decl><p>w</p>",
    # entity handling in text and attrs, with and without semicolons
    "text &aMp; more &#65; &#x42; &unknown; &lt",
    '<a href="/a?b=1&amp;c=2&param=3">q</a>',
    "<p>&nbsp;&NBSP;&nbsp</p>",
    # charref-split tail buffering quirk (goahead's rfind('&', n-34) rule)
    "<div>tail&am",
    "<div>tail&amp",
    "<div>safe tail ",
    "<div>&amp; done;",
    # malformed / tolerant territory (fast path bails, entry still equal)
    "< notag",
    "<123>num</123>",
    "<a b=c=d>x</a>",
    "<a b==c>x</a>",
    '<a href="unterminated',
    "<em>a</em",
    "<p>x</p >y",
    "<p>x</ p>y",
    "</>solo",
    "</ >space",
    "</tag attr=1>after",
    "<a/b>slash</a>",
    '<a href="x"id=y>nospace</a>',
    "<a href=b'c>quote</a>",
    # void elements, self-closing, empty values
    "<area><base><br><col><embed><hr>",
    "<input type=checkbox checked/>",
    "<a href=>empty</a>",
    "<a href= >sp</a>",
    '<a href="">q</a>',
    # structure edge cases
    "<p>unclosed <b>bold",
    "<p>a<p>b<p>c",
    "plain text no tags",
    "",
    "<",
    "&",
    "<p>x<</p>",
    "<b><i>cross</b></i>done",
    # unicode + non-ascii tag starts
    "<é>not a tag</é>",
    "<p>ünïcode &eacute;</p>",
    # non-ASCII whitespace: allowed INSIDE stdlib tag names (tagfind only
    # excludes \t\n\r\f />\x00) but matched by \s — boundary must bail
    "<a\xa0b=c>x</a>",
    "<a\vb=c>x</a>",
    "<a \xa0b=c>x</a>",
    "<a b=c\xa0d=e>y</a>",
    "<p\x1cq>z</p\x1cq>",
    # uppercase tags close case-insensitively on both paths
    "<A HREF=X>x</A >",
    # marked sections are _markupbase territory — fast path must bail
    "<![CDATA[raw]]>tail",
    "<![IGNORE[x]]>t",
    # HTMLParser's doctype rule is first-'>' (parse_html_declaration),
    # NOT markupbase's quote/subset-aware scan — equivalence by sharing it
    '<!DOCTYPE html PUBLIC "-//W3C//DTD//EN" "http://a/x>y.dtd"><p>hi</p>',
    "<!DOCTYPE html [ <!ENTITY f 'x'> ]><p>s</p>",
    # NUL: excluded from stdlib tag names (tagfind char class) but not \s
    "<p\x00q>z</p\x00q>",
    "<a href=\x00>n</a>",
    # attr value containing '=' (tolerant unquoted-value territory)
    "<v w=x=y>t</v>",
    # charrefs inside CDATA content stay raw
    "<script>a&amp;b</script>",
    # back-to-back CDATA elements re-enter and leave mode cleanly
    "<style>@import 'x.css';</style><style>p{}</style>",
]


def test_hand_cases():
    for html in HAND_CASES:
        _assert_equiv(html)


def test_hand_case_truncations():
    """Every prefix of every hand case — truncation mid-construct exercises
    the buffered-at-EOF branches on both paths."""
    for html in HAND_CASES:
        for cut in range(len(html)):
            _assert_equiv(html[:cut])


def test_fast_path_claims_wellformed():
    """The fast path must actually take the common case (else the speedup
    silently evaporates)."""
    for html in (
        HAND_CASES[0],
        HAND_CASES[1],
        '<script>var a=1;</script><a href="/x">y</a>',
        "<!DOCTYPE html><!-- c --><div id=a>t&amp;t</div>",
    ):
        assert _fast_parse(html) is not None


def test_sitegen_corpus():
    """Every page sitegen generates (search pages, details, traps) parses
    identically on both paths."""
    from crawler_spark.sources.sitegen import SiteSpec, generate_site

    site = generate_site(SiteSpec(n_hosts=3, details_per_host=40, limit=10))
    n = 0
    for body in site["pages"]["html"]:
        html = bytes(body).decode("utf-8", errors="replace")
        _assert_equiv(html)
        n += 1
    assert n > 50


_FRAGMENTS = [
    "<div>", "</div>", "<p class='c'>", "<a href=\"/x?a=1&amp;b=2\">",
    "</a>", "text ", "&amp;", "&#65;", "&bogus;", "&", "<", ">", "<br>",
    "<br/>", "<img src=x>", "<script>", "</script>", "var a<b>c;",
    "<!-- c -->", "<!--", "-->", "<!DOCTYPE html>", "<?pi?>", "</>",
    "<a b=c>", "<a b='c d'>", "<a b>", "<a b=>", '"', "'", "=", "/",
    "</ p>", "<style>", "</style>", "x{a>b}", " ", "\n", "\t&am", "&amp",
]


@settings(max_examples=300, deadline=None)
@given(
    st.lists(st.sampled_from(_FRAGMENTS), min_size=0, max_size=12),
    st.integers(min_value=0, max_value=400),
)
def test_fuzz_fragment_compositions(parts, cut):
    html = "".join(parts)[:cut]
    _assert_equiv(html)


@settings(max_examples=200, deadline=None)
@given(st.text(alphabet="<>&;/='\"abAB \n-!?#x\xa0\v\x1c\x85", max_size=80))
def test_fuzz_tag_soup(html):
    _assert_equiv(html)
