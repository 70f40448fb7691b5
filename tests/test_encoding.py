"""Encoding sniff unit tests (SURVEY.md A3–A4)."""

from xkit.encoding import decode_html_bytes, sniff


def test_bom_utf8():
    assert sniff(b"\xef\xbb\xbf<p>") == ("utf-8", 3)


def test_bom_utf16():
    assert sniff(b"\xff\xfex\x00") == ("utf-16-le", 2)
    assert sniff(b"\xfe\xff\x00x") == ("utf-16-be", 2)


def test_bom_utf32_before_utf16():
    assert sniff(b"\xff\xfe\x00\x00x\x00\x00\x00") == ("utf-32-le", 4)


def test_meta_charset():
    assert sniff(b"<meta charset=windows-1252>") == ("cp1252", 0)
    assert sniff(b"<meta charset='ISO-8859-1'>") == ("iso8859-1", 0)


def test_meta_content_type():
    raw = b'<meta http-equiv="Content-Type" content="text/html; charset=koi8-r">'
    assert sniff(raw)[0] == "koi8-r"


def test_meta_outside_window_ignored():
    raw = b"x" * 5000 + b"<meta charset=windows-1252>"
    assert sniff(raw) == ("utf-8", 0)


def test_http_header_wins_over_meta():
    raw = b"<meta charset=windows-1252>"
    assert sniff(raw, http_charset="utf-8") == ("utf-8", 0)


def test_bom_wins_over_meta():
    raw = b"\xef\xbb\xbf<meta charset=windows-1252>"
    assert sniff(raw) == ("utf-8", 3)


def test_unknown_labels_fall_back():
    assert sniff(b"<meta charset=bogus-enc>") == ("utf-8", 0)
    assert sniff(b"abc", http_charset="nope")[0] == "utf-8"


def test_utf16_meta_lie_ignored():
    # an ASCII-readable doc claiming utf-16 can't be utf-16; frozen rule
    assert sniff(b"<meta charset=utf-16>") == ("utf-8", 0)


def test_decode_never_raises():
    assert decode_html_bytes(b"\xff\xff\xfa garbage") != ""
    assert decode_html_bytes(b"") == ""


def test_decode_1252():
    raw = "<p>caf\xe9</p>".encode("cp1252")
    assert "café" in decode_html_bytes(b"<meta charset=windows-1252>" + raw)


def test_endianness_agnostic_header_pins_codec_from_bom():
    import codecs

    from xkit.encoding import sniff

    # stripping the BOM while keeping plain 'utf-16' would decode the
    # whole document little-endian
    assert sniff(codecs.BOM_UTF16_BE + "hello".encode("utf-16-be"),
                 http_charset="utf-16") == ("utf-16-be", 2)
    assert sniff(codecs.BOM_UTF16_LE + "hello".encode("utf-16-le"),
                 http_charset="utf-16") == ("utf-16-le", 2)


def test_non_pragma_meta_content_cannot_hijack_charset():
    from xkit.encoding import sniff

    data = b'<meta name="description" content="set charset=koi8-r here"><meta charset="utf-8">'
    assert sniff(data) == ("utf-8", 0)
