"""Tokenizer-level unit tests (SURVEY.md A5–A13).

Mirrors the reference's tokenizer tests
([P: XHtmlKit.Tests/HtmlTextReaderTests.cs]) at token granularity.
"""

from xkit.tokenizer import tokenize


def test_text_and_open_close():
    assert tokenize("a<b>c</b>d") == [
        ("text", "a"),
        ("open", "b", {}, False),
        ("text", "c"),
        ("close", "b"),
        ("text", "d"),
    ]


def test_tag_name_case_normalized():
    assert tokenize("<DiV><P>")[0] == ("open", "div", {}, False)
    assert tokenize("</SPAN>") == [("close", "span")]


def test_attr_forms():
    toks = tokenize("<a x=1 y='two' z=\"three\" w v = unq>")
    assert toks == [
        ("open", "a", {"x": "1", "y": "two", "z": "three", "w": "", "v": "unq"}, False)
    ]


def test_attr_duplicate_first_wins():
    assert tokenize('<a href="x" HREF="y">')[0][2] == {"href": "x"}


def test_attr_entities_decoded():
    assert tokenize('<a href="a&amp;b">')[0][2]["href"] == "a&b"


def test_self_closing_flag():
    assert tokenize("<br/>") == [("open", "br", {}, True)]
    assert tokenize("<div />") == [("open", "div", {}, True)]


def test_unquoted_value_takes_slash():
    # HTML5: <img src=x.png/> → value "x.png/", NOT self-closing
    assert tokenize("<img src=x.png/>") == [("open", "img", {"src": "x.png/"}, False)]


def test_close_tag_junk_discarded():
    assert tokenize("</div class=x>") == [("close", "div")]


def test_lone_lt_is_text():
    assert tokenize("a < b") == [("text", "a "), ("text", "<"), ("text", " b")]
    assert tokenize("c<3") == [("text", "c"), ("text", "<"), ("text", "3")]


def test_trailing_lt_eof():
    assert tokenize("x<") == [("text", "x"), ("text", "<")]


def test_comment_and_doctype():
    assert tokenize("<!-- c --><!DOCTYPE html><![CDATA[z]]><?pi?>") == [
        ("comment", " c "),
        ("doctype", "<!DOCTYPE html>"),
        ("comment", "z"),
        ("comment", "<?pi?>"),
    ]


def test_unterminated_comment_to_eof():
    assert tokenize("a<!-- never closed <p>") == [
        ("text", "a"),
        ("comment", " never closed <p>"),
    ]


def test_entities_decoded_in_text_only():
    assert tokenize("x &amp; y") == [("text", "x & y")]
    toks = tokenize("<script>a &amp; b</script>")
    assert ("text", "a &amp; b") in toks  # RAWTEXT: not decoded


def test_rcdata_title_decoded_no_markup():
    toks = tokenize("<title>a &amp; <b>not a tag</title>")
    assert toks == [
        ("open", "title", {}, False),
        ("text", "a & <b>not a tag"),
        ("close", "title"),
    ]


def test_script_scan_case_insensitive():
    toks = tokenize("<script>if(a<b){}</SCRIPT>after")
    assert toks == [
        ("open", "script", {}, False),
        ("text", "if(a<b){}"),
        ("close", "script"),
        ("text", "after"),
    ]


def test_script_unterminated():
    toks = tokenize("<script>x=1")
    assert toks == [("open", "script", {}, False), ("text", "x=1")]


def test_unterminated_open_tag_at_eof():
    assert tokenize('<a href="x') == [("open", "a", {"href": "x"}, False)]
    assert tokenize("<a href=") == [("open", "a", {"href": ""}, False)]


def test_never_raises_on_garbage():
    for s in ["<", "<>", "< >", "</", "</>", "<!", "<!-", "<a<b>", "&", "&#;", "&#x;"]:
        tokenize(s)  # must not raise (A17)


def test_pi_doctype_lookalike_is_comment():
    from xkit.tokenizer import tokenize

    assert tokenize("<?doctype html?>x")[0][0] == "comment"
