"""Office-document text extraction — DOCX (OOXML WordprocessingML,
ECMA-376), ODT (OpenDocument, OASIS), PPTX (OOXML DrawingML) — all
three are ZIP containers of XML, so stdlib zipfile + ElementTree
cover them with no dependencies. This extends the reference's
document-ingestion domain (PDF-only, /root/reference/main.py:106-115)
to the formats institutional corpora actually mix in.

Extraction is structure-preserving at paragraph granularity:
- DOCX: every w:p in word/document.xml becomes one line; w:t runs
  concatenate, w:tab -> TAB, w:br / w:cr -> newline.
- ODT: text:p / text:h in content.xml; text:s expands its c= count
  of spaces, text:tab -> TAB, text:line-break -> newline.
- PPTX: every a:t run in ppt/slides/slide*.xml (slides in numeric
  order), one line per a:p paragraph, a blank line between slides.

ValueError for malformed containers (fault-isolation boundary in
operators/ingest.py catches it per file).
"""

from __future__ import annotations

import io
import re
import xml.etree.ElementTree as ET
import zipfile
import zlib

__all__ = ["extract_docx_text", "extract_odt_text", "extract_pptx_text"]


def _local(tag: str) -> str:
    return tag.rsplit("}", 1)[-1]


_MAX_XML_MEMBER = 1 << 28  # 256 MB: decompression-bomb guard


def _read_zip_member(data: bytes, name: str) -> bytes:
    try:
        with zipfile.ZipFile(io.BytesIO(data)) as z:
            if z.getinfo(name).file_size > _MAX_XML_MEMBER:
                raise ValueError(
                    f"office XML member too large: {name}"
                )
            return z.read(name)
    except (zipfile.BadZipFile, zlib.error) as exc:
        # BadZipFile/zlib.error surface at member-READ time on CRC or
        # deflate corruption (r14 mutation fuzz) — same contract
        raise ValueError(f"unreadable ZIP container: {exc}") from exc
    except KeyError as exc:
        raise ValueError(f"ZIP member missing: {name}") from exc


def _parse_xml(blob: bytes) -> ET.Element:
    try:
        return ET.fromstring(blob)
    except ET.ParseError as exc:
        raise ValueError(f"malformed office XML: {exc}") from exc


def _docx_paragraph(p: ET.Element) -> str:
    """One w:p -> its run text. Nested w:p subtrees (textbox content,
    w:txbxContent) are SKIPPED: the extractor emits every w:p as its
    own line, so descending into them here duplicated their text
    (r14 self-review F9)."""
    parts: list[str] = []

    def walk(el: ET.Element) -> None:
        for child in el:
            tag = _local(child.tag)
            if tag == "p":
                continue  # nested paragraph: its own output line
            if tag == "t":
                parts.append(child.text or "")
            elif tag == "tab":
                parts.append("\t")
            elif tag in ("br", "cr"):
                parts.append("\n")
            else:
                walk(child)

    walk(p)
    return "".join(parts)


def extract_docx_text(data: bytes) -> str:
    """DOCX bytes -> text, one line per w:p paragraph."""
    root = _parse_xml(_read_zip_member(bytes(data), "word/document.xml"))
    out = [
        _docx_paragraph(p)
        for p in root.iter()
        if _local(p.tag) == "p"
    ]
    return "\n".join(out)


def _odt_paragraph(p: ET.Element) -> str:
    parts: list[str] = []

    def walk(el: ET.Element) -> None:
        if el.text:
            parts.append(el.text)
        for child in el:
            tag = _local(child.tag)
            if tag in ("p", "h"):
                # nested paragraph (frames/annotations): its own
                # output line in extract_odt_text — descending here
                # duplicated it (r14 self-review F9)
                if child.tail:
                    parts.append(child.tail)
                continue
            if tag == "s":
                parts.append(" " * int(child.get(
                    "{urn:oasis:names:tc:opendocument:xmlns:text:1.0}c",
                    child.get("c", "1"),
                )))
            elif tag == "tab":
                parts.append("\t")
            elif tag == "line-break":
                parts.append("\n")
            else:
                walk(child)
            if child.tail:
                parts.append(child.tail)

    walk(p)
    return "".join(parts)


def extract_odt_text(data: bytes) -> str:
    """ODT bytes -> text, one line per text:p / text:h paragraph."""
    root = _parse_xml(_read_zip_member(bytes(data), "content.xml"))
    out: list[str] = []
    for el in root.iter():
        if _local(el.tag) in ("p", "h"):
            out.append(_odt_paragraph(el))
    return "\n".join(out)


def extract_pptx_text(data: bytes) -> str:
    """PPTX bytes -> text: slides in numeric order, one line per a:p
    paragraph, a blank line between slides."""
    data = bytes(data)
    try:
        with zipfile.ZipFile(io.BytesIO(data)) as z:
            names = [
                n for n in z.namelist()
                if re.fullmatch(r"ppt/slides/slide\d+\.xml", n)
            ]
            if not names:
                raise ValueError("PPTX with no slides")
            names.sort(key=lambda n: int(re.search(r"(\d+)", n).group(1)))
            for n in names:
                if z.getinfo(n).file_size > _MAX_XML_MEMBER:
                    raise ValueError(
                        f"office XML member too large: {n}"
                    )
            slides = [z.read(n) for n in names]
    except (zipfile.BadZipFile, zlib.error) as exc:
        raise ValueError(f"unreadable ZIP container: {exc}") from exc
    out: list[str] = []
    for blob in slides:
        root = _parse_xml(blob)
        lines: list[str] = []
        for p in root.iter():
            if _local(p.tag) != "p":
                continue
            runs = [
                el.text or ""
                for el in p.iter()
                if _local(el.tag) == "t"
            ]
            lines.append("".join(runs))
        out.append("\n".join(lines))
    return "\n\n".join(out)


# ---------------------------------------------------------- witnesses
# Minimal-but-conformant builders for tests and oracle-backed queries:
# the same role the media witness encoders play.

_DOCX_NS = (
    "http://schemas.openxmlformats.org/wordprocessingml/2006/main"
)
_ODT_TEXT_NS = "urn:oasis:names:tc:opendocument:xmlns:text:1.0"
_ODT_OFFICE_NS = "urn:oasis:names:tc:opendocument:xmlns:office:1.0"
_PPTX_A_NS = "http://schemas.openxmlformats.org/drawingml/2006/main"


def _xml_escape(s: str) -> str:
    return (
        s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
    )


def build_docx(paragraphs: list[str]) -> bytes:
    """Paragraph list -> a minimal DOCX (document.xml +
    [Content_Types].xml + rels), spaces preserved via xml:space."""
    body = "".join(
        f'<w:p><w:r><w:t xml:space="preserve">{_xml_escape(p)}</w:t>'
        "</w:r></w:p>"
        for p in paragraphs
    )
    doc = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        f'<w:document xmlns:w="{_DOCX_NS}"><w:body>{body}</w:body>'
        "</w:document>"
    )
    ctypes = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<Types xmlns="http://schemas.openxmlformats.org/package/2006/'
        'content-types">'
        '<Default Extension="rels" ContentType="application/vnd.'
        'openxmlformats-package.relationships+xml"/>'
        '<Default Extension="xml" ContentType="application/xml"/>'
        '<Override PartName="/word/document.xml" ContentType='
        '"application/vnd.openxmlformats-officedocument.'
        'wordprocessingml.document.main+xml"/></Types>'
    )
    rels = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<Relationships xmlns="http://schemas.openxmlformats.org/'
        'package/2006/relationships">'
        '<Relationship Id="rId1" Type="http://schemas.openxmlformats'
        '.org/officeDocument/2006/relationships/officeDocument" '
        'Target="word/document.xml"/></Relationships>'
    )
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as z:
        z.writestr("[Content_Types].xml", ctypes)
        z.writestr("_rels/.rels", rels)
        z.writestr("word/document.xml", doc)
    return buf.getvalue()


def build_odt(paragraphs: list[str]) -> bytes:
    body = "".join(
        f"<text:p>{_xml_escape(p)}</text:p>" for p in paragraphs
    )
    content = (
        '<?xml version="1.0" encoding="UTF-8"?>'
        f'<office:document-content xmlns:office="{_ODT_OFFICE_NS}" '
        f'xmlns:text="{_ODT_TEXT_NS}"><office:body><office:text>'
        f"{body}</office:text></office:body>"
        "</office:document-content>"
    )
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as z:
        z.writestr(
            "mimetype", "application/vnd.oasis.opendocument.text",
            compress_type=zipfile.ZIP_STORED,
        )
        z.writestr("content.xml", content)
    return buf.getvalue()


def build_pptx(slides: list[list[str]]) -> bytes:
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as z:
        for i, paras in enumerate(slides, 1):
            body = "".join(
                "<a:p><a:r>"
                f'<a:t>{_xml_escape(p)}</a:t></a:r></a:p>'
                for p in paras
            )
            z.writestr(
                f"ppt/slides/slide{i}.xml",
                '<?xml version="1.0" encoding="UTF-8"?>'
                f'<p:sld xmlns:a="{_PPTX_A_NS}" xmlns:p="http://schemas'
                '.openxmlformats.org/presentationml/2006/main">'
                f"<p:cSld><p:spTree>{body}</p:spTree></p:cSld></p:sld>",
            )
    return buf.getvalue()
