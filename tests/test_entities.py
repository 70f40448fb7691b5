"""Entity decoding unit tests (SURVEY.md A10–A12), WHATWG semantics."""

from xkit.entities import decode_entities as d


def test_named():
    assert d("&amp; &lt; &gt; &quot;") == '& < > "'
    assert d("caf&eacute;") == "café"
    assert d("&nbsp;") == "\xa0"


def test_numeric():
    assert d("&#120;") == "x"
    assert d("&#x41;&#X42;") == "AB"
    assert d("&#x1F600;") == "😀"


def test_c1_windows_remap():
    assert d("&#151;") == "—"  # WHATWG maps C1 via cp1252
    assert d("&#x80;") == "€"


def test_invalid_numeric_to_replacement():
    assert d("&#0;") == "�"
    assert d("&#xD800;") == "�"  # surrogate
    assert d("&#x110000;") == "�"  # out of range


def test_unknown_named_literal():
    assert d("&foo;") == "&foo;"
    assert d("&fooooo") == "&fooooo"


def test_legacy_without_semicolon():
    assert d("&amp x") == "& x"
    assert d("&not x") == "\xacx".replace("\xac", "\xac ").replace("  ", " ")
    assert d("&notin;") == "∉"  # longest match with semicolon


def test_bare_ampersand():
    assert d("a & b") == "a & b"
    assert d("&") == "&"
    assert d("&#;") == "&#;"


def test_no_amp_fast_path_identity():
    s = "plain text"
    assert d(s) is s
