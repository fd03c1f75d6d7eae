"""Office-document extraction (functions/officetext.py): DOCX/ODT/
PPTX witness build + lossless paragraph extraction, special-content
handling (tabs, breaks, ODT space runs, XML escapes), malformed-
container errors, and the ingest-dispatch integration."""

from __future__ import annotations

import io
import zipfile

import pytest

from articulation_vector_db_api_spark.functions.officetext import (
    build_docx,
    build_odt,
    build_pptx,
    extract_docx_text,
    extract_odt_text,
    extract_pptx_text,
)

PARAS = [
    "Transfer credits apply after review.",
    "",  # empty paragraph survives
    "Fees & deadlines: <see below>",  # XML-escaped content
    "  leading and trailing spaces  ",
]


def test_docx_roundtrip_lossless():
    assert extract_docx_text(build_docx(PARAS)) == "\n".join(PARAS)


def test_odt_roundtrip_lossless():
    assert extract_odt_text(build_odt(PARAS)) == "\n".join(PARAS)


def test_pptx_roundtrip_lossless():
    slides = [PARAS[:2], PARAS[2:]]
    want = "\n".join(PARAS[:2]) + "\n\n" + "\n".join(PARAS[2:])
    assert extract_pptx_text(build_pptx(slides)) == want


def test_docx_tabs_and_breaks():
    ns = "http://schemas.openxmlformats.org/wordprocessingml/2006/main"
    doc = (
        f'<w:document xmlns:w="{ns}"><w:body><w:p><w:r>'
        "<w:t>a</w:t><w:tab/><w:t>b</w:t><w:br/><w:t>c</w:t>"
        "</w:r></w:p></w:body></w:document>"
    )
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as z:
        z.writestr("word/document.xml", doc)
    assert extract_docx_text(buf.getvalue()) == "a\tb\nc"


def test_odt_space_runs_and_tabs():
    tns = "urn:oasis:names:tc:opendocument:xmlns:text:1.0"
    ons = "urn:oasis:names:tc:opendocument:xmlns:office:1.0"
    content = (
        f'<office:document-content xmlns:office="{ons}" '
        f'xmlns:text="{tns}"><office:body><office:text>'
        "<text:p>a<text:s text:c=\"3\"/>b<text:tab/>c"
        "<text:line-break/>d</text:p>"
        "</office:text></office:body></office:document-content>"
    )
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as z:
        z.writestr("content.xml", content)
    assert extract_odt_text(buf.getvalue()) == "a   b\tc\nd"


def test_malformed_containers_raise_valueerror():
    with pytest.raises(ValueError, match="ZIP"):
        extract_docx_text(b"not a zip at all")
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as z:
        z.writestr("word/document.xml", "<w:document>broken")
    with pytest.raises(ValueError, match="malformed office XML"):
        extract_docx_text(buf.getvalue())
    buf2 = io.BytesIO()
    with zipfile.ZipFile(buf2, "w") as z:
        z.writestr("something_else.xml", "<a/>")
    with pytest.raises(ValueError, match="member missing"):
        extract_docx_text(buf2.getvalue())
    with pytest.raises(ValueError, match="no slides"):
        extract_pptx_text(buf2.getvalue())


def test_ingest_dispatch_extracts_office_files():
    """operators/ingest._extract_one routes .docx/.odt/.pptx to the
    office extractors with the same per-file fault isolation as PDF."""
    from articulation_vector_db_api_spark.operators.ingest import (
        _extract_one,
    )

    text, err = _extract_one("a/tuition.docx", build_docx(PARAS))
    assert err is None and text == "\n".join(PARAS)
    text, err = _extract_one("b/housing.odt", build_odt(PARAS))
    assert err is None and text == "\n".join(PARAS)
    text, err = _extract_one("c/deck.pptx", build_pptx([PARAS]))
    assert err is None and text == "\n".join(PARAS)
    text, err = _extract_one("d/broken.docx", b"garbage")
    assert text is None and "ValueError" in err


def test_zip_bomb_guard():
    """A member whose DECLARED inflated size exceeds the cap raises
    before decompression (100 TB crawls contain hostile ZIPs)."""
    import zipfile as zf

    from articulation_vector_db_api_spark.functions import officetext

    buf = io.BytesIO()
    with zf.ZipFile(buf, "w", zf.ZIP_DEFLATED) as z:
        z.writestr("word/document.xml", b"<w:document/>")
    blob = bytearray(buf.getvalue())
    old = officetext._MAX_XML_MEMBER
    officetext._MAX_XML_MEMBER = 4  # tiny cap to trigger the guard
    try:
        with pytest.raises(ValueError, match="too large"):
            extract_docx_text(bytes(blob))
    finally:
        officetext._MAX_XML_MEMBER = old


def test_nested_paragraphs_extract_once():
    """r14 self-review F9: a paragraph nested inside another (DOCX
    textbox content, ODT frames) must be extracted exactly once —
    the old subtree walk emitted its text twice."""
    import io
    import zipfile

    from articulation_vector_db_api_spark.functions.officetext import (
        _DOCX_NS,
        _ODT_OFFICE_NS,
        _ODT_TEXT_NS,
        extract_docx_text,
        extract_odt_text,
    )

    doc = (
        '<?xml version="1.0"?>'
        f'<w:document xmlns:w="{_DOCX_NS}"><w:body>'
        "<w:p><w:r><w:t>outer before</w:t></w:r>"
        "<w:r><w:txbxContent><w:p><w:r><w:t>boxed</w:t></w:r></w:p>"
        "</w:txbxContent></w:r>"
        "<w:r><w:t> outer after</w:t></w:r></w:p>"
        "</w:body></w:document>"
    )
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as z:
        z.writestr("word/document.xml", doc)
    text = extract_docx_text(buf.getvalue())
    assert text.count("boxed") == 1
    assert text.splitlines() == ["outer before outer after", "boxed"]

    content = (
        '<?xml version="1.0"?>'
        f'<office:document-content xmlns:office="{_ODT_OFFICE_NS}" '
        f'xmlns:text="{_ODT_TEXT_NS}"><office:body><office:text>'
        "<text:p>outer<draw:frame xmlns:draw=\"urn:d\">"
        "<text:p>framed</text:p></draw:frame> tail</text:p>"
        "</office:text></office:body></office:document-content>"
    )
    buf2 = io.BytesIO()
    with zipfile.ZipFile(buf2, "w") as z:
        z.writestr("content.xml", content)
    text2 = extract_odt_text(buf2.getvalue())
    assert text2.count("framed") == 1
    assert text2.splitlines() == ["outer tail", "framed"]
