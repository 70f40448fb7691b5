"""Extraction heuristics unit tests (SURVEY.md A21–A25)."""

from xkit.extract import extract_html
from xkit.options import ExtractOptions


def texts(html, **kw):
    opts = ExtractOptions(**kw) if kw else ExtractOptions()
    return [t for k, t, m in extract_html(html, opts) if k == "text"]


def media(html, **kw):
    opts = ExtractOptions(**kw) if kw else ExtractOptions()
    return [m for k, t, m in extract_html(html, opts) if k == "media"]


def test_block_segmentation():
    assert texts("<div>alpha one<p>beta two</p>gamma three</div>") == [
        "alpha one",
        "beta two",
        "gamma three",
    ]


def test_inline_tags_join_block():
    assert texts("<p>alpha <b>bold</b> <i>ital</i> omega</p>") == [
        "alpha bold ital omega"
    ]


def test_whitespace_collapse_and_trim():
    assert texts("<p>  a   b \n\t c  </p>") == ["a b c"]


def test_drop_tags_subtrees():
    html = (
        "<head><title>T</title><style>p{}</style></head>"
        "<nav>menu menu menu</nav><p>kept body paragraph</p>"
        "<footer>foot foot</footer><aside>side side</aside>"
    )
    assert texts(html) == ["kept body paragraph"]


def test_hidden_attribute_drops_subtree():
    assert texts('<div hidden><p>gone text here</p></div><p>kept text here</p>') == [
        "kept text here"
    ]
    assert texts('<p aria-hidden="true">gone gone</p><p>kept here now</p>') == [
        "kept here now"
    ]


def test_link_density_drops_linkfarm():
    html = '<div><a href=a>one</a> <a href=b>two</a> <a href=c>three</a></div>'
    assert texts(html) == []


def test_link_density_keeps_prose_with_link():
    html = (
        "<p>Plenty of prose around a <a href=x>small link</a> keeps this "
        "paragraph well under the link density threshold.</p>"
    )
    assert len(texts(html)) == 1


def test_text_density_drops_tiny_tag_heavy():
    assert texts("<div><b>x</b></div>") == []
    assert texts("<p>ok length line</p>") == ["ok length line"]


def test_media_emission_and_order():
    spans = extract_html('<p>before img</p><img src="a.png"><p>after img</p>')
    assert [s[0] for s in spans] == ["text", "media", "text"]
    assert spans[1][2] == "a.png"


def test_media_flushes_block_midway():
    spans = extract_html('<p>left side text<img src="m.png">right side text</p>')
    assert [(s[0], s[1] or s[2]) for s in spans] == [
        ("text", "left side text"),
        ("media", "m.png"),
        ("text", "right side text"),
    ]


def test_media_inside_dropped_subtree_dropped():
    assert media('<nav><img src="logo.png"></nav>') == []


def test_base_url_absolutization():
    assert media('<img src="../i/x.png">', base_url="http://e.com/a/b/") == [
        "http://e.com/a/img/x.png".replace("img", "i")
    ]
    # absolute src unchanged
    assert media('<img src="http://o.com/y.png">', base_url="http://e.com/") == [
        "http://o.com/y.png"
    ]


def test_iframe_children_dropped_but_src_kept():
    spans = extract_html('<iframe src="f.html"><p>fallback text gone</p></iframe>')
    assert spans == [("media", None, "f.html")]


def test_empty_input():
    assert extract_html("") == []
    assert extract_html("   \n\t  ") == []


def test_threshold_overrides():
    # with a zero density floor even 1-char blocks survive
    assert texts("<div><b>x</b></div>", min_text_density=0.0) == ["x"]


def test_null_offset_spans_never_crash():
    from xkit.doc import extract_doc

    k, t, m, o = extract_doc(
        ["html", "html"],
        ["<p>first paragraph words here ok", "<p>second paragraph words here ok"],
        [None, None],
        [None, 0],
    )
    # null offsets sort last, stable; batch must not die on None<int
    assert k == ["text", "text"] and "second" in t[0] and "first" in t[1]


def test_fused_extractor_equals_token_reference_on_corpus():
    """The fused production extract_html must be span-for-span equal to
    the token-driven reference (_extract_html_tokens) on adversarial
    markup, every golden case, and both option modes."""
    import json
    import os

    from xkit.extract import _extract_html_tokens

    cases = [
        "",
        "plain text no markup at all",
        "ent &amp; ities &lt;kept&gt; flat",
        "<p>one<p>two<div hidden><p>gone</div><p>three",
        "<script>a < b && c</script><p>after</p>",
        "<title>rc &amp; data</title><p>body</p>",
        "<ul><li>a<li>b<li>c</ul>",
        "<a href=x>link</a> prose around the anchor goes here ok",
        "<img src=a.png><p>between</p><video src='v.mp4'>fallback</video>",
        "<iframe src=f.html><p>never shown</p></iframe><p>shown</p>",
        "< not a tag <1 also not <p>real</p> trailing <",
        "</stray></p><p>recover</p></html>",
        "<textarea>dropped &amp; raw</textarea><p>kept</p>",
        "<table><tr><td>a<td>b<tr><td>c</table>",
        "<!-- comment --><!DOCTYPE html><![CDATA[x]]><?pi?><p>doc</p>",
        "<p>unterminated <b attr='",
        "<script>never closed raw",
        "<SELECT><OPTION>x</SELECT><p>after select</p>",
        "<head><meta x><p>body starts</head><p>more",
        "<x123 9=>< p>odd</ p>",
        "\x00<p>nul</p>\x00",
        "<p>" + "word " * 50 + "<br>" + "tail " * 30,
    ]
    golden_dir = os.path.join(os.path.dirname(__file__), "golden")
    for fn in sorted(os.listdir(golden_dir)):
        if fn.endswith(".json"):
            for case in json.load(open(os.path.join(golden_dir, fn))).get("cases", []):
                h = case.get("html")
                if isinstance(h, str):
                    cases.append(h)
    opts = [
        ExtractOptions(),
        ExtractOptions(fragment=True, base_url="http://e.x/a/"),
        ExtractOptions(min_block_chars=0, min_text_density=0.0, max_link_density=1.0),
    ]
    for h in cases:
        for o in opts:
            assert extract_html(h, o) == _extract_html_tokens(h, o), (h[:80], o)


def test_fused_extractor_equals_token_reference_fuzz():
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from xkit.extract import _extract_html_tokens

    soup = st.text(
        alphabet=st.sampled_from(
            list("<>/=\"' abcdef&#;!-?ptable srcimghdnul\t\n123")
        ),
        max_size=120,
    )

    @given(soup)
    @settings(max_examples=300, deadline=None)
    def check(s):
        assert extract_html(s) == _extract_html_tokens(s)

    check()
