"""RTF extraction (functions/rtftext.py): control words, groups,
destination skipping, hex/unicode escapes with the \\ucN convention,
builder roundtrip, ingest dispatch, and the error contract."""

from __future__ import annotations

import pytest

from articulation_vector_db_api_spark.functions.rtftext import (
    build_rtf,
    extract_rtf_text,
)


def test_build_extract_roundtrip():
    paras = [
        "Hello world",
        "Ünïcode — test ’quotes’",
        "braces {and} \\backslash",
    ]
    got = extract_rtf_text(build_rtf(paras))
    assert got == "\n".join(paras)


def test_real_world_document_shape():
    doc = (
        b"{\\rtf1\\ansi\\ansicpg1252\\deff0\n"
        b"{\\fonttbl{\\f0\\fswiss Arial;}}\n"
        b"{\\colortbl ;\\red0\\green0\\blue0;}\n"
        b"{\\*\\generator LibreOffice}\n"
        b"{\\info{\\title Secret Title}}\n"
        b"\\f0\\fs24 First \\b bold\\b0  para.\\par\n"
        b"Second with \\'e9 accent and \\u8212? dash.\\par\n"
        b"Tab\\tab separated.}"
    )
    got = extract_rtf_text(doc)
    assert got == (
        "First bold para.\n"
        "Second with é accent and — dash.\n"
        "Tab\tseparated."
    )
    # destination payload must NOT leak
    assert "Secret" not in got and "LibreOffice" not in got


def test_unicode_uc_skip_convention():
    # \uc2: two fallback chars follow each \uN and must be skipped
    assert extract_rtf_text(b"{\\rtf1\\uc2\\u26085??after}") == (
        "日after"
    )
    # negative \uN wraps mod 65536 per the spec
    assert extract_rtf_text(b"{\\rtf1\\uc1\\u-3825?x}") == "x"
    # group pop restores the outer \uc value: inside, \uc3 skips
    # "?ab" of "?abc" leaving "c"; outside, \uc1 skips only "?"
    assert extract_rtf_text(
        b"{\\rtf1\\uc1{\\uc3\\u65?abc}\\u66?B}"
    ) == "AcBB"


def test_control_symbols_and_specials():
    assert extract_rtf_text(
        b"{\\rtf1 a\\~b\\{c\\}d\\\\e\\emdash f\\bullet g}"
    ) == "a b{c}d\\e—f•g"
    # \line and \par both newline; raw CR/LF are insignificant
    assert extract_rtf_text(
        b"{\\rtf1 one\\line two\r\nstill two\\par three}"
    ) == "one\ntwo still two\nthree".replace("two still", "twostill")


def test_error_contract():
    with pytest.raises(ValueError, match="not an RTF"):
        extract_rtf_text(b"plain text")
    with pytest.raises(ValueError, match="not closed"):
        extract_rtf_text(b"{\\rtf1 unclosed")
    with pytest.raises(ValueError, match="underflow"):
        extract_rtf_text(b"{\\rtf1 }}")


def test_ingest_dispatch_rtf_and_html():
    from articulation_vector_db_api_spark.operators.ingest import (
        _extract_one,
    )

    text, err = _extract_one("legacy.rtf", build_rtf(["dispatched"]))
    assert (text, err) == ("dispatched", None)
    html = (
        b"<html><head><title>T</title><script>var x=1;</script></head>"
        b"<body><p>real text</p></body></html>"
    )
    text, err = _extract_one("page.html", html)
    assert err is None and "real text" in text and "var x" not in text
    text, err = _extract_one("bad.rtf", b"garbage")
    assert text is None and "ValueError" in err


def test_bin_raw_run_skipped():
    """r14 close-out seam: \\binN is followed by N RAW bytes that are
    not RTF text — walking them as markup desyncs the group parse."""
    doc = b"{\\rtf1 before{\\pict\\bin5 AB}CD} after}"
    # \bin5 swallows 'AB}CD' verbatim — the '}' inside the run must
    # NOT close the pict group; without the skip the trailing brace
    # underflows
    assert extract_rtf_text(doc) == "before after"
    with pytest.raises(ValueError, match="bin run beyond"):
        extract_rtf_text(b"{\\rtf1\\bin99 short}")


def test_upr_ud_prefers_unicode_version():
    """r14 close-out: \\upr pairs an ANSI fallback with a {\\*\\ud}
    Unicode version — the Unicode side must win, once."""
    doc = (
        b"{\\rtf1\\uc1 before "
        b"{\\upr{ansi-lossy}{\\*\\ud{\\u26085?\\u26412?}}}"
        b" after}"
    )
    assert extract_rtf_text(doc) == "before 日本 after"
    # a bare {\*\ud ...} outside \upr also emits
    assert extract_rtf_text(
        b"{\\rtf1 a{\\*\\ud{X}}b}"
    ) == "aXb"
    # other \* destinations still skip
    assert extract_rtf_text(
        b"{\\rtf1 a{\\*\\generator Z}b}"
    ) == "ab"


def test_ud_inside_skipped_destination_stays_dark():
    """ADVICE r14: a \\upr pair nested inside an already-skipped
    destination (\\stylesheet, \\info) must NOT leak its {\\*\\ud}
    body into the document text — the enclosing destination's skip
    outranks the \\upr re-enable."""
    doc = (
        b"{\\rtf1\\uc1 body "
        b"{\\stylesheet{\\upr{style-ansi}{\\*\\ud{\\u26085?STYLE}}}}"
        b"tail}"
    )
    assert extract_rtf_text(doc) == "body tail"
    # \info variant of the same seam
    doc2 = (
        b"{\\rtf1 a"
        b"{\\info{\\upr{meta}{\\*\\ud{META}}}}"
        b"b}"
    )
    assert extract_rtf_text(doc2) == "ab"
    # and the legitimate \upr+ud pair in BODY text is unaffected
    doc3 = (
        b"{\\rtf1\\uc1 x{\\upr{lossy}{\\*\\ud{\\u26412?}}}y}"
    )
    assert extract_rtf_text(doc3) == "x本y"


def test_surrogate_pairs_roundtrip():
    """r14 review: Word encodes non-BMP chars as a \\uN surrogate
    PAIR; the halves must combine — and no output string may carry an
    unpaired surrogate (it would crash Arrow serialization, escaping
    the fault boundary)."""
    s = "smile \U0001F600 end"
    got = extract_rtf_text(build_rtf([s]))
    assert got == s
    got.encode("utf-8")  # must not raise
    # raw Word-style escapes
    assert extract_rtf_text(
        b"{\\rtf1\\uc1 hi \\u-10179?\\u-8704? there}"
    ) == "hi \U0001F600 there"
    # unpaired high/low surrogates degrade to U+FFFD, never leak
    for doc in (
        b"{\\rtf1\\uc1 x\\u-10179?y}",
        b"{\\rtf1\\uc1 x\\u-8704?y}",
        b"{\\rtf1\\uc1 x\\u-10179?}",
    ):
        t = extract_rtf_text(doc)
        t.encode("utf-8")
        assert "�" in t
