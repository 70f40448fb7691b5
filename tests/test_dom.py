"""Repair-rule unit tests (SURVEY.md A14–A19), golden-string style like
the reference's [P: XHtmlKit.Tests/HtmlParserTests.cs] OuterXml asserts.
"""

from xkit.dom import repair, serialize
from xkit.tokenizer import tokenize


def roundtrip(html: str) -> str:
    return serialize(repair(tokenize(html)))


def test_p_closed_by_p():
    assert roundtrip("<p>one<p>two") == "<p>one</p><p>two</p>"


def test_p_closed_by_block():
    assert roundtrip("<p>a<div>b</div>") == "<p>a</p><div>b</div>"


def test_li_closed_by_li():
    assert roundtrip("<ul><li>a<li>b</ul>") == "<ul><li>a</li><li>b</li></ul>"


def test_nested_list_not_overclosed():
    assert (
        roundtrip("<ul><li>a<ul><li>b</ul></ul>")
        == "<ul><li>a<ul><li>b</li></ul></li></ul>"
    )


def test_table_soup():
    assert (
        roundtrip("<table><tr><td>x<td>y<tr><td>z</table>")
        == "<table><tr><td>x</td><td>y</td></tr><tr><td>z</td></tr></table>"
    )


def test_dt_dd_pairs():
    assert (
        roundtrip("<dl><dt>t<dd>d<dt>t2</dl>")
        == "<dl><dt>t</dt><dd>d</dd><dt>t2</dt></dl>"
    )


def test_option_closed_by_option():
    assert (
        roundtrip("<select><option>a<option>b</select>")
        == "<select><option>a</option><option>b</option></select>"
    )


def test_void_elements_never_nest():
    assert roundtrip("<br>x") == "<br></br>x"
    assert roundtrip("<img src=a><p>t") == '<img src="a"></img><p>t</p>'


def test_explicit_self_close_any_tag():
    assert roundtrip("<div/>x") == "<div></div>x"


def test_stray_close_dropped():
    assert roundtrip("a</div>b") == "ab"
    assert roundtrip("</p>x") == "x"


def test_close_pops_to_ancestor():
    assert roundtrip("<div><b>x</div>y") == "<div><b>x</b></div>y"


def test_close_void_tag_ignored():
    assert roundtrip("a</br>b") == "ab"


def test_eof_closes_stack():
    assert roundtrip("<div><p><b>x") == "<div><p><b>x</b></p></div>"


def test_head_closed_by_content():
    assert (
        roundtrip("<head><meta charset=x><p>body")
        == '<head><meta charset="x"></meta></head><p>body</p>'
    )


def test_head_only_tags_stay_in_head():
    assert (
        roundtrip("<head><title>t</title><link href=x><p>b")
        == '<head><title>t</title><link href="x"></link></head><p>b</p>'
    )


def test_hr_closes_p():
    assert roundtrip("<p>a<hr>b") == "<p>a</p><hr></hr>b"


def test_sanitize_xml_name():
    from xkit.dom import sanitize_xml_name

    assert sanitize_xml_name("div") == "div"
    assert sanitize_xml_name("data-x") == "data-x"
    assert sanitize_xml_name("foo@bar") == "foo_bar"
    assert sanitize_xml_name("3d") == "_3d"
    assert sanitize_xml_name("-lead") == "_-lead"
    assert sanitize_xml_name("") == "_"
    assert sanitize_xml_name("a:b") == "a_b"  # no namespace colons


def test_serialize_xml_safe_names_and_comments():
    import xml.etree.ElementTree as ET

    from xkit.dom import repair, serialize
    from xkit.tokenizer import tokenize

    soup = '<p 1bad=x foo@bar=y foo_bar=z>text</p><!-- a -- b --->'
    default = serialize(repair(tokenize(soup)))
    safe = serialize(repair(tokenize(soup)), xml_safe=True)
    # default form unchanged (frozen golden style), safe form parses
    assert '1bad="x"' in default
    assert '_1bad="x"' in safe
    # foo@bar sanitizes onto existing foo_bar -> first wins, no dup attr
    assert safe.count("foo_bar=") == 1
    ET.fromstring("<root>" + safe + "</root>")  # must be well-formed


def test_normalize_doc_emits_xml_safe_names():
    from xhtmlkit_spark.operators.normalize_stage import normalize_doc

    out = normalize_doc(["html"], ['<p data@weird="v">t</p>'], [0])
    assert 'data_weird="v"' in out


def test_xml_safe_strips_invalid_chars():
    """Control characters in text/attr/comment content make XML
    unparseable no matter how they're escaped — xml_safe strips them
    (review finding)."""
    import xml.etree.ElementTree as ET

    from xkit.dom import repair, serialize
    from xkit.tokenizer import tokenize

    soup = '<p a="v\x01v">a\x0cb\x00c keep\ttab\nnl</p><!--\x01c-->'
    safe = serialize(repair(tokenize(soup)), xml_safe=True)
    root = ET.fromstring("<root>" + safe + "</root>")
    assert root.find("p").text == "abc keep\ttab\nnl"
    assert root.find("p").get("a") == "vv"


def test_repair_fragment_mode_keeps_head_content_nesting():
    """fragment=True disables the full-page head auto-close: a snippet
    whose first tag is <title> must keep subsequent content INSIDE the
    enclosing structure rather than force-closing a presumed head."""
    from xkit.dom import repair, serialize
    from xkit.tokenizer import tokenize

    s = "<head><title>t</title><p>body text</p>"
    full = serialize(repair(tokenize(s)))
    frag = serialize(repair(tokenize(s), fragment=True))
    # full-page rule: <p> closes the head; fragment keeps it nested
    assert "</head><p>" in full
    assert "<p>body text</p></head>" in frag
