"""EPUB e-book text extraction — an EPUB (IDPF/W3C spec) is a ZIP
with a fixed entry map: `mimetype` (stored first), `META-INF/
container.xml` pointing at an OPF package document, whose <manifest>
maps ids to hrefs and whose <spine> lists the reading order. Content
documents are XHTML, so stdlib zipfile + ElementTree cover the whole
format with no dependencies — the same posture as officetext.py.

Extraction is paragraph-granular: one line per <p>/<h1..h6>/<li> in
spine order, chapters separated by a blank line. Nested paragraphs
extract once (same rule the r14 officetext self-review pinned).

ValueError for malformed containers (fault-isolation boundary in
operators/ingest.py catches it per file).

Reference behavior parity: extends the reference's PDF-only ingestion
domain (/root/reference/main.py:106-115) the way officetext.py does.
"""

from __future__ import annotations

import io
import posixpath
import xml.etree.ElementTree as ET
import zipfile
import zlib

__all__ = ["build_epub", "extract_epub_text"]

_CONTAINER_NS = "urn:oasis:names:tc:opendocument:xmlns:container"
_OPF_NS = "http://www.idpf.org/2007/opf"
_XHTML_NS = "http://www.w3.org/1999/xhtml"
_DC_NS = "http://purl.org/dc/elements/1.1/"

_BLOCK_TAGS = {"p", "h1", "h2", "h3", "h4", "h5", "h6", "li"}


def _local(tag: str) -> str:
    return tag.rsplit("}", 1)[-1]


def _parse_xml(blob: bytes, what: str) -> ET.Element:
    try:
        return ET.fromstring(blob)
    except ET.ParseError as exc:
        raise ValueError(f"malformed EPUB {what}: {exc}") from exc


def _content_lines(blob: bytes, what: str) -> list[str]:
    """Spine item -> block lines; real-world EPUBs occasionally carry
    HTML-but-not-XHTML content documents (unclosed <br>, bare &nbsp;)
    that ET rejects — those fall back to the tolerant HTML parser
    (r14 close-out seam, pinned)."""
    try:
        return _xhtml_lines(_parse_xml(blob, what))
    except ValueError:
        if b"<" not in blob[:1024]:
            raise  # not markup at all — keep the XML error
        from .htmltext import extract_main_text

        out = extract_main_text(blob.decode("utf-8", "replace"))
        if not out["text"]:
            raise
        return out["text"].split("\n")


def _block_text(el: ET.Element) -> str:
    """One block element -> its inline text; nested BLOCK subtrees are
    skipped (they are their own output lines), <br/> -> newline."""
    parts: list[str] = []
    if el.text:
        parts.append(el.text)

    def walk(e: ET.Element) -> None:
        for child in e:
            tag = _local(child.tag)
            if tag in _BLOCK_TAGS:
                if child.tail:
                    parts.append(child.tail)
                continue
            if tag == "br":
                parts.append("\n")
            else:
                if child.text:
                    parts.append(child.text)
                walk(child)
            if child.tail:
                parts.append(child.tail)

    walk(el)
    return "".join(parts)


def _xhtml_lines(root: ET.Element) -> list[str]:
    body = next(
        (el for el in root.iter() if _local(el.tag) == "body"), None
    )
    if body is None:
        raise ValueError("EPUB content document without <body>")
    return [
        _block_text(el)
        for el in body.iter()
        if _local(el.tag) in _BLOCK_TAGS
    ]


def extract_epub_text(data: bytes) -> str:
    """EPUB bytes -> text: spine-ordered chapters, one line per block
    element, a blank line between chapters."""
    try:
        z = zipfile.ZipFile(io.BytesIO(bytes(data)))
    except zipfile.BadZipFile as exc:
        raise ValueError(f"not a ZIP container: {exc}") from exc
    try:
        return _extract_from_zip(z)
    except (zipfile.BadZipFile, zlib.error) as exc:
        # CRC/deflate failures surface at member-READ time, not open
        # (found by the r14 mutation fuzz) — same ValueError contract
        raise ValueError(f"corrupt ZIP member: {exc}") from exc
    finally:
        z.close()


def _extract_from_zip(z: zipfile.ZipFile) -> str:
    with z:
        try:
            container = z.read("META-INF/container.xml")
        except KeyError as exc:
            raise ValueError("EPUB without META-INF/container.xml") from exc
        croot = _parse_xml(container, "container.xml")
        opf_path = next(
            (
                el.get("full-path")
                for el in croot.iter()
                if _local(el.tag) == "rootfile"
                and el.get("full-path")
            ),
            None,
        )
        if opf_path is None:
            raise ValueError("EPUB container.xml without a rootfile")
        try:
            opf = z.read(opf_path)
        except KeyError as exc:
            raise ValueError(f"EPUB rootfile missing: {opf_path}") from exc
        oroot = _parse_xml(opf, "package document")
        hrefs: dict[str, str] = {}
        mtypes: dict[str, str] = {}
        for el in oroot.iter():
            if _local(el.tag) == "item" and el.get("id") and el.get("href"):
                hrefs[el.get("id")] = el.get("href")
                mtypes[el.get("id")] = el.get("media-type") or ""
        spine = [
            el.get("idref")
            for el in oroot.iter()
            if _local(el.tag) == "itemref" and el.get("idref")
        ]
        if not spine:
            raise ValueError("EPUB spine with no itemrefs")
        base = posixpath.dirname(opf_path)
        # DRM gate (r15 review): META-INF/encryption.xml covering a
        # CONTENT document means the chapter bytes are ciphertext —
        # extracting would emit garbage. Font obfuscation (the common
        # benign use of encryption.xml) never references spine items.
        encrypted: set[str] = set()
        try:
            enc = z.read("META-INF/encryption.xml")
        except KeyError:
            enc = b""
        if enc:
            from urllib.parse import unquote

            eroot = _parse_xml(enc, "encryption.xml")
            for el in eroot.iter():
                if _local(el.tag) == "CipherReference" and el.get("URI"):
                    # URIs are percent-encoded; zip paths are not —
                    # without unquote an encrypted 'my chapter.xhtml'
                    # evades the gate (r15 review)
                    encrypted.add(
                        posixpath.normpath(unquote(el.get("URI")))
                    )
        chapters: list[str] = []
        for idref in spine:
            href = hrefs.get(idref)
            if href is None:
                raise ValueError(
                    f"EPUB spine idref {idref!r} not in manifest"
                )
            mtype = mtypes.get(idref, "")
            if mtype and "html" not in mtype:
                # EPUB 2 files commonly (and invalidly) list the NCX
                # in the spine; without this skip its navLabel text
                # leaks into the corpus through the HTML fallback
                # (r15 review, VERDICT r14 item 2 named seam). Image/
                # SVG spine items carry no extractable paragraphs
                # either — skip, don't fail the book.
                continue
            path = posixpath.normpath(posixpath.join(base, href))
            if path in encrypted:
                raise ValueError(
                    f"EPUB content is DRM-encrypted: {path}"
                )
            try:
                blob = z.read(path)
            except KeyError as exc:
                raise ValueError(
                    f"EPUB spine item missing: {path}"
                ) from exc
            chapters.append("\n".join(_content_lines(blob, path)))
        if not chapters:
            raise ValueError("EPUB spine with no content documents")
    return "\n\n".join(chapters)


def _xml_escape(s: str) -> str:
    return (
        s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
    )


def build_epub(
    chapters: list[list[str]], title: str = "witness"
) -> bytes:
    """[[paragraph, ...] per chapter] -> a minimal conformant EPUB 3
    (mimetype stored first, container.xml, OPF manifest + spine, one
    XHTML content document per chapter)."""
    if not chapters:
        raise ValueError("EPUB needs at least one chapter")
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as z:
        z.writestr(
            "mimetype", "application/epub+zip",
            compress_type=zipfile.ZIP_STORED,
        )
        z.writestr(
            "META-INF/container.xml",
            '<?xml version="1.0"?>'
            f'<container version="1.0" xmlns="{_CONTAINER_NS}">'
            '<rootfiles><rootfile full-path="OEBPS/content.opf" '
            'media-type="application/oebps-package+xml"/></rootfiles>'
            "</container>",
        )
        items = "".join(
            f'<item id="c{k}" href="ch{k}.xhtml" '
            'media-type="application/xhtml+xml"/>'
            for k in range(len(chapters))
        )
        refs = "".join(
            f'<itemref idref="c{k}"/>' for k in range(len(chapters))
        )
        z.writestr(
            "OEBPS/content.opf",
            '<?xml version="1.0"?>'
            f'<package xmlns="{_OPF_NS}" version="3.0" '
            'unique-identifier="uid">'
            f'<metadata xmlns:dc="{_DC_NS}">'
            f'<dc:identifier id="uid">urn:witness</dc:identifier>'
            f"<dc:title>{_xml_escape(title)}</dc:title>"
            "<dc:language>en</dc:language></metadata>"
            f"<manifest>{items}</manifest><spine>{refs}</spine>"
            "</package>",
        )
        for k, paras in enumerate(chapters):
            body = "".join(
                f"<p>{_xml_escape(p)}</p>" for p in paras
            )
            z.writestr(
                f"OEBPS/ch{k}.xhtml",
                '<?xml version="1.0" encoding="UTF-8"?>'
                f'<html xmlns="{_XHTML_NS}"><head>'
                f"<title>ch{k}</title></head>"
                f"<body>{body}</body></html>",
            )
    return buf.getvalue()
