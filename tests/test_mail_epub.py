"""EPUB (functions/epub.py) and EML/mbox (functions/mailtext.py)
ingestion: roundtrips, MIME part policy, mboxrd From-quoting, spine
ordering, nested-block extraction, and the error contracts."""

from __future__ import annotations

import io
import zipfile

import pytest

from articulation_vector_db_api_spark.functions.epub import (
    build_epub,
    extract_epub_text,
)
from articulation_vector_db_api_spark.functions.mailtext import (
    build_eml,
    build_mbox,
    extract_eml,
    extract_eml_text,
    extract_mbox_text,
    split_mbox,
)


def test_epub_roundtrip_and_spine_order():
    chapters = [["Alpha & <tag>.", "Beta line"], ["Gamma"]]
    blob = build_epub(chapters, title="T & T")
    assert blob[:2] == b"PK"
    with zipfile.ZipFile(io.BytesIO(blob)) as z:
        first = z.infolist()[0]
        assert first.filename == "mimetype"
        assert first.compress_type == zipfile.ZIP_STORED
    text = extract_epub_text(blob)
    assert text == "Alpha & <tag>.\nBeta line\n\nGamma"


def test_epub_nested_blocks_and_br():
    """Nested block elements extract once; <br/> becomes a newline;
    inline markup (<em>) contributes its text and tail."""
    xhtml = (
        '<?xml version="1.0"?>'
        '<html xmlns="http://www.w3.org/1999/xhtml"><body>'
        "<p>one <em>fine</em> day</p>"
        "<ul><li>item A<br/>wrapped</li><li>item B</li></ul>"
        "<div><p>nested para</p></div>"
        "</body></html>"
    )
    blob = build_epub([["placeholder"]])
    buf = io.BytesIO(blob)
    with zipfile.ZipFile(buf, "a") as z:
        z.writestr("OEBPS/ch0.xhtml", xhtml)
    text = extract_epub_text(buf.getvalue())
    assert text.splitlines() == [
        "one fine day", "item A", "wrapped", "item B", "nested para",
    ]


def test_epub_error_contract():
    with pytest.raises(ValueError, match="ZIP"):
        extract_epub_text(b"not a zip")
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as z:
        z.writestr("mimetype", "application/epub+zip")
    with pytest.raises(ValueError, match="container.xml"):
        extract_epub_text(buf.getvalue())
    # spine pointing at a missing manifest item
    blob = bytearray(build_epub([["x"]]))
    src = zipfile.ZipFile(io.BytesIO(bytes(blob)))
    out = io.BytesIO()
    with zipfile.ZipFile(out, "w") as z:
        for info in src.infolist():
            data = src.read(info.filename)
            if info.filename == "OEBPS/content.opf":
                data = data.replace(b'idref="c0"', b'idref="nope"')
            z.writestr(info, data)
    with pytest.raises(ValueError, match="not in manifest"):
        extract_epub_text(out.getvalue())
    with pytest.raises(ValueError, match="at least one"):
        build_epub([])


def test_eml_part_policy():
    # plain preferred over the html alternative
    e = build_eml("S", "plain body", html_alternative="<p>html</p>")
    m = extract_eml(e)
    assert m["body_source"] == "plain"
    assert m["text"].rstrip("\n") == "plain body"
    assert m["subject"] == "S" and m["n_attachments"] == 0
    # html-only falls back through the html extractor
    import email.policy
    from email.message import EmailMessage

    msg = EmailMessage(policy=email.policy.default)
    msg["Subject"] = "H"
    msg["From"] = "a@example.org"
    msg.set_content("<p>para one</p><p>two</p>", subtype="html")
    m2 = extract_eml(msg.as_bytes())
    assert m2["body_source"] == "html" and m2["text"] == "para one\ntwo"
    # attachments counted, not decoded
    msg.add_attachment(
        b"\x00\x01", maintype="application", subtype="octet-stream",
        filename="blob.bin",
    )
    assert extract_eml(msg.as_bytes())["n_attachments"] == 1
    # ADVICE r14: an attached message/rfc822 (forwarded email) counts
    # as ONE attachment — previously is_multipart()==True skipped it
    # and the count came back 0. Its inner text body stays uncounted.
    import email as _email

    outer = EmailMessage(policy=email.policy.default)
    outer["Subject"] = "Fwd"
    outer["From"] = "a@example.org"
    outer.set_content("see attached")
    inner = _email.message_from_bytes(
        build_eml("inner subject", "inner body"),
        policy=email.policy.default,
    )
    outer.add_attachment(inner)
    fwd = extract_eml(outer.as_bytes())
    assert fwd["n_attachments"] == 1
    assert fwd["text"].rstrip("\n") == "see attached"  # body not hijacked
    # RFC 2047 encoded-word subject decodes
    raw = (
        b"Subject: =?utf-8?b?w6luY29kw6k=?=\r\n"
        b"From: x@example.org\r\n\r\nbody\r\n"
    )
    assert extract_eml(raw)["subject"] == "éncodé"
    with pytest.raises(ValueError, match="no headers"):
        extract_eml(b"")
    with pytest.raises(ValueError, match="no text body"):
        extract_eml(
            b"Subject: s\r\nContent-Type: application/octet-stream\r\n"
            b"\r\n\x00\x01"
        )


def test_mbox_roundtrip_with_from_quoting():
    msgs = [
        build_eml("m1", "body1\nFrom here\n>From already\n>>From deep"),
        build_eml("m2", "body2"),
    ]
    mb = build_mbox(msgs)
    # the archive quotes every ^>*From by one more level
    assert b"\n>From here" in mb and b">>>From deep" in mb
    back = split_mbox(mb)
    assert len(back) == 2
    t0 = extract_eml(back[0])["text"]
    assert "From here" in t0 and ">From already" in t0 \
        and ">>From deep" in t0 and ">>>From" not in t0
    combined = extract_mbox_text(mb)
    assert combined.count("Subject: m") == 2
    with pytest.raises(ValueError, match="leading From"):
        split_mbox(b"not an mbox")
    with pytest.raises(ValueError, match="at least one"):
        build_mbox([])


def test_ingest_dispatch_routes_new_formats():
    from articulation_vector_db_api_spark.operators.ingest import (
        _extract_one,
    )

    text, err = _extract_one("book.epub", build_epub([["hello epub"]]))
    assert err is None and text == "hello epub"
    text, err = _extract_one("mail.eml", build_eml("Sub", "eml body"))
    assert err is None and text == "Subject: Sub\n\neml body\n"
    mb = build_mbox([build_eml("A", "a"), build_eml("B", "b")])
    text, err = _extract_one("archive.mbox", mb)
    assert err is None and text.count("Subject:") == 2
    # fault isolation still catches malformed input
    text, err = _extract_one("bad.epub", b"garbage")
    assert text is None and "ValueError" in err


def test_mbox_without_blank_line_padding():
    """r14 self-review: writers that don't pad a blank line between
    messages must still split — in mboxrd every line-leading 'From '
    IS a separator (body From-lines are always quoted)."""
    m1 = build_eml("tight1", "body one")
    m2 = build_eml("tight2", "body two")
    t1 = m1.decode().rstrip("\n")
    t2 = m2.decode().rstrip("\n")
    tight = (
        f"From a@b Mon Jan  1 00:00:00 2024\n{t1}\n"
        f"From c@d Mon Jan  1 00:00:00 2024\n{t2}\n"
    ).encode()
    back = split_mbox(tight)
    assert len(back) == 2
    assert extract_eml(back[0])["subject"] == "tight1"
    assert extract_eml(back[1])["subject"] == "tight2"


def test_epub_html_not_xhtml_fallback():
    """r14 close-out seam: real EPUBs carry HTML-but-not-XHTML
    content docs (unclosed <br>, bare &nbsp;) — those fall back to
    the tolerant HTML parser instead of dying in ET."""
    blob = build_epub([["placeholder"]])
    buf = io.BytesIO(blob)
    import warnings

    with zipfile.ZipFile(buf, "a") as z, warnings.catch_warnings():
        warnings.simplefilter("ignore")
        z.writestr(
            "OEBPS/ch0.xhtml",
            "<html><body><p>sloppy&nbsp;markup<br><p>second"
            "</body></html>",
        )
    text = extract_epub_text(buf.getvalue())
    assert "sloppy" in text and "second" in text
    # pure garbage still raises
    buf2 = io.BytesIO(blob)
    with zipfile.ZipFile(buf2, "a") as z, warnings.catch_warnings():
        warnings.simplefilter("ignore")
        z.writestr("OEBPS/ch0.xhtml", "\x00\x01\x02")
    with pytest.raises(ValueError):
        extract_epub_text(buf2.getvalue())


def test_attached_message_cannot_hijack_body():
    """r14 close-out seam: a text/plain inside an ATTACHED
    message/rfc822 must not be selected as the body of an html-only
    outer message."""
    import email.policy
    from email.message import EmailMessage

    outer = EmailMessage(policy=email.policy.default)
    outer["Subject"] = "outer"
    outer["From"] = "a@example.org"
    outer.set_content("<p>outer html body</p>", subtype="html")
    inner = EmailMessage(policy=email.policy.default)
    inner["Subject"] = "inner"
    inner.set_content("inner plain body")
    outer.add_attachment(inner)
    m = extract_eml(outer.as_bytes())
    assert m["body_source"] == "html"
    assert "outer html body" in m["text"]
    assert "inner plain body" not in m["text"]


def test_epub_ncx_in_spine_skipped():
    """r15 review (VERDICT r14 item 2): EPUB 2 files commonly list
    the NCX in the spine; its navLabel text must NOT leak into the
    extraction (previously it rode in through the HTML fallback)."""
    import io
    import zipfile

    from articulation_vector_db_api_spark.functions.epub import (
        _CONTAINER_NS,
        _OPF_NS,
        _XHTML_NS,
        extract_epub_text,
    )

    def make(spine_extra: str, manifest_extra: str, encryption: str = "") -> bytes:
        buf = io.BytesIO()
        with zipfile.ZipFile(buf, "w") as z:
            z.writestr("mimetype", "application/epub+zip")
            z.writestr(
                "META-INF/container.xml",
                f'<container xmlns="{_CONTAINER_NS}"><rootfiles>'
                '<rootfile full-path="OEBPS/content.opf" '
                'media-type="application/oebps-package+xml"/>'
                "</rootfiles></container>",
            )
            z.writestr(
                "OEBPS/content.opf",
                f'<package xmlns="{_OPF_NS}" version="2.0"><manifest>'
                '<item id="c0" href="ch0.xhtml" '
                'media-type="application/xhtml+xml"/>'
                f"{manifest_extra}</manifest>"
                f'<spine toc="ncx">{spine_extra}'
                '<itemref idref="c0"/></spine></package>',
            )
            z.writestr(
                "OEBPS/toc.ncx",
                '<ncx xmlns="http://www.daisy.org/z3986/2005/ncx/">'
                "<navMap><navPoint><navLabel><text>Nav Label Leak"
                "</text></navLabel></navPoint></navMap></ncx>",
            )
            if encryption:
                z.writestr("META-INF/encryption.xml", encryption)
            z.writestr(
                "OEBPS/ch0.xhtml",
                f'<html xmlns="{_XHTML_NS}"><body>'
                "<p>real chapter text</p></body></html>",
            )
        return buf.getvalue()

    ncx_item = (
        '<item id="ncx" href="toc.ncx" '
        'media-type="application/x-dtbncx+xml"/>'
    )
    got = extract_epub_text(
        make('<itemref idref="ncx"/>', ncx_item)
    )
    assert got == "real chapter text"
    assert "Nav Label" not in got

    # DRM'd content document -> honest gate, not garbage
    enc = (
        '<encryption xmlns="urn:oasis:names:tc:opendocument:xmlns:'
        'container"><EncryptedData xmlns='
        '"http://www.w3.org/2001/04/xmlenc#"><CipherData>'
        '<CipherReference URI="OEBPS/ch0.xhtml"/></CipherData>'
        "</EncryptedData></encryption>"
    )
    with pytest.raises(ValueError, match="DRM"):
        extract_epub_text(make("", ncx_item, encryption=enc))

    # font-only obfuscation is benign and must NOT gate
    enc_font = enc.replace("OEBPS/ch0.xhtml", "OEBPS/fonts/a.otf")
    assert extract_epub_text(
        make("", ncx_item, encryption=enc_font)
    ) == "real chapter text"


def test_mboxo_unquoted_body_from_lines():
    """r15 review (VERDICT r14 item 2 named seam): mboxo archives do
    NOT quote body lines that merely start with 'From ' — the
    separator shape (sender + asctime) must disambiguate, keeping
    prose inside its message."""
    m1 = build_eml(
        "subject one",
        "first line\nFrom my point of view, fine.\nlast line",
    ).decode().rstrip("\n")
    m2 = build_eml("subject two", "body two").decode().rstrip("\n")
    mboxo = (
        f"From a@b Mon Jan  1 00:00:00 2024\n{m1}\n\n"
        f"From c@d Tue Jan  2 00:00:00 2024\n{m2}\n"
    ).encode()
    msgs = split_mbox(mboxo)
    assert len(msgs) == 2
    txt = extract_mbox_text(mboxo)
    assert "From my point of view" in txt
    assert txt.count("Subject: subject") == 2
    # a From line WITHOUT the separator shape cannot lead an archive
    with pytest.raises(ValueError, match="not a separator"):
        split_mbox(b"From here to there\nbody\n")


def test_archive_zip64_and_long_tar_names():
    """r15 review (VERDICT r14 item 2 named seams, REFUTED with
    evidence): zip64 members and GNU/PAX long (>100 char) + unicode
    tar names all explode correctly through the stdlib readers —
    pinned so a future exploder rewrite keeps them."""
    import io
    import tarfile
    import zipfile

    from articulation_vector_db_api_spark.operators.ingest import (
        _explode_one,
    )

    longname = "dir/" + "x" * 150 + ".txt"
    for fmt in (tarfile.GNU_FORMAT, tarfile.PAX_FORMAT):
        buf = io.BytesIO()
        with tarfile.open(fileobj=buf, mode="w:", format=fmt) as tf:
            info = tarfile.TarInfo(longname)
            data = b"long name payload"
            info.size = len(data)
            tf.addfile(info, io.BytesIO(data))
            uni = tarfile.TarInfo("ünïcode–name.txt")
            uni.size = 3
            tf.addfile(uni, io.BytesIO(b"abc"))
            link = tarfile.TarInfo("link")
            link.type = tarfile.SYMTYPE
            link.linkname = longname
            tf.addfile(link)
        rows = _explode_one("a.tar", buf.getvalue())
        names = [r[1] for r in rows]
        assert longname in names
        if fmt == tarfile.PAX_FORMAT:
            assert "ünïcode–name.txt" in names
        assert "link" not in names  # symlinks are not file members
        assert all(r[3] is None for r in rows)

    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", allowZip64=True) as z:
        with z.open(zipfile.ZipInfo("big.txt"), "w", force_zip64=True) as f:
            f.write(b"zip64 member payload")
    rows = _explode_one("a.zip", buf.getvalue())
    assert rows[0][1] == "big.txt"
    assert rows[0][2] == b"zip64 member payload"
    assert rows[0][3] is None


def test_mbox_timezone_separator_variant():
    """r15 code-review: Solaris mailx / old-BSD archives put a
    timezone between time and year in the From_ line."""
    m1 = build_eml("tz one", "body a").decode().rstrip("\n")
    m2 = build_eml("tz two", "body b").decode().rstrip("\n")
    mb = (
        f"From mark Mon Sep 17 12:04:27 PDT 2001\n{m1}\n\n"
        f"From sue Tue Sep 18 01:02:03 +0530 2001\n{m2}\n"
    ).encode()
    msgs = split_mbox(mb)
    assert len(msgs) == 2
    assert extract_eml(msgs[0])["subject"] == "tz one"
    assert extract_eml(msgs[1])["subject"] == "tz two"


def test_epub_drm_gate_percent_encoded_uri():
    """r15 code-review: encryption.xml URIs are percent-encoded;
    the DRM gate must unquote before matching zip paths."""
    import io
    import zipfile

    from articulation_vector_db_api_spark.functions.epub import (
        _CONTAINER_NS,
        _OPF_NS,
        _XHTML_NS,
        extract_epub_text,
    )

    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as z:
        z.writestr("mimetype", "application/epub+zip")
        z.writestr(
            "META-INF/container.xml",
            f'<container xmlns="{_CONTAINER_NS}"><rootfiles>'
            '<rootfile full-path="OEBPS/content.opf" '
            'media-type="application/oebps-package+xml"/>'
            "</rootfiles></container>",
        )
        z.writestr(
            "OEBPS/content.opf",
            f'<package xmlns="{_OPF_NS}" version="2.0"><manifest>'
            '<item id="c0" href="my chapter.xhtml" '
            'media-type="application/xhtml+xml"/></manifest>'
            '<spine><itemref idref="c0"/></spine></package>',
        )
        z.writestr(
            "META-INF/encryption.xml",
            '<encryption xmlns="urn:oasis:names:tc:opendocument:'
            'xmlns:container"><EncryptedData xmlns='
            '"http://www.w3.org/2001/04/xmlenc#"><CipherData>'
            '<CipherReference URI="OEBPS/my%20chapter.xhtml"/>'
            "</CipherData></EncryptedData></encryption>",
        )
        z.writestr(
            "OEBPS/my chapter.xhtml",
            f'<html xmlns="{_XHTML_NS}"><body>'
            "<p>ciphertext stand-in</p></body></html>",
        )
    with pytest.raises(ValueError, match="DRM"):
        extract_epub_text(buf.getvalue())


def test_eml_fast_path_matches_stdlib():
    """r16 optimization: the simple-message fast paths in build_eml /
    extract_eml must be byte- and field-identical to the stdlib
    EmailMessage/policy.default reference across the fast-path domain
    AND bail to the stdlib everywhere else (differential over
    representative + adversarial cases; the full 9.6k-case fuzz ran at
    review time with zero mismatches)."""
    import email
    import email.policy
    from email.message import EmailMessage

    import articulation_vector_db_api_spark.functions.mailtext as mt

    def build_ref(subject, body):
        msg = EmailMessage(policy=email.policy.default)
        msg["Subject"] = subject
        msg["From"] = "witness@example.org"
        msg["To"] = "corpus@example.org"
        msg["Date"] = "Mon, 01 Jan 2024 00:00:00 +0000"
        msg.set_content(body)
        return msg.as_bytes()

    def extract_ref(data):
        old = mt._extract_eml_fast
        mt._extract_eml_fast = lambda d: None
        try:
            return mt.extract_eml(data)
        finally:
            mt._extract_eml_fast = old

    bodies = [
        "", "\n", "x", "x\n", "x\n\n", "a\rb", "a\tb\n",
        "x" * 78 + "\n", "x" * 79 + "\n",  # the 7bit/qp boundary
        "é unicode\n",  # 8bit path
        ("word " * 40).strip() + "\n",  # qp via long line
        "=41 qp-looking literal\n", "From here\n", "trailing \n",
        ("é" * 120) + "\n",  # base64-vs-qp sniff territory
    ]
    subjects = ["doc 7", "", " s", "s ", "café", "x" * 69, "x" * 70,
                "a:b", "=?utf-8?q?x?=", "two  spaces"]
    raws = []
    for body in bodies:
        for subject in ("doc 7", "café"):
            ref = build_ref(subject, body)
            assert mt.build_eml(subject, body) == ref, (subject, body)
            raws.append(ref)
    for subject in subjects:
        ref = build_ref(subject, "body\n")
        assert mt.build_eml(subject, "body\n") == ref, subject
        raws.append(ref)
    adversarial = [
        b"Subject: x\n\n", b"Subject: x\nSubject: y\n\nb\n",
        b"subject: low\n\nb\n", b"Subject:  two\n\nb\n",
        b"Subject: sp \n\nb\n",
        b"Subject: a\nFrom: Alice <a@b.org>\n\nb\n",
        b"Subject: a\nDate: whenever\n\nb\n",
        b"Subject: a\nContent-Type: text/plain\n\nb\n",
        b"Subject: a\nContent-Transfer-Encoding: 8bit\n\n\xc3\xa9\n",
        b"Subject: a\n\n\xc3\xa9 raw\n",
        b"Subject: long\n continuation\n\nb\n",
        b'Subject: q\nContent-Type: text/plain; charset="utf-8"\n'
        b"Content-Transfer-Encoding: quoted-printable\n\n=C3=A9 ok =zz\n",
        b"Subject: q\nContent-Transfer-Encoding: quoted-printable\n\n"
        b"=C3=A9 no ct\n",
    ]
    for raw in raws + adversarial:
        try:
            ref = extract_ref(raw)
        except ValueError:
            with pytest.raises(ValueError):
                mt.extract_eml(raw)
            continue
        assert mt.extract_eml(raw) == ref, raw


def test_forwarded_message_attachments_counted_once():
    """ADVICE r15: walk() descends into a counted message/rfc822
    attachment, so a forwarded email carrying 2 attachments of its own
    reported n_attachments=3 — the subtree must be skipped."""
    import email as _email
    import email.policy
    from email.message import EmailMessage

    inner = EmailMessage(policy=email.policy.default)
    inner["Subject"] = "inner"
    inner["From"] = "b@example.org"
    inner.set_content("inner body")
    inner.add_attachment(
        b"\x00\x01", maintype="application", subtype="octet-stream",
        filename="one.bin",
    )
    inner.add_attachment(
        b"\x02\x03", maintype="image", subtype="png",
        filename="two.png",
    )
    outer = EmailMessage(policy=email.policy.default)
    outer["Subject"] = "Fwd"
    outer["From"] = "a@example.org"
    outer.set_content("see attached")
    outer.add_attachment(
        _email.message_from_bytes(
            inner.as_bytes(), policy=email.policy.default
        )
    )
    got = extract_eml(outer.as_bytes())
    assert got["n_attachments"] == 1  # the forwarded message, once
    assert got["text"].rstrip("\n") == "see attached"
