"""Email text extraction — RFC 5322 messages (.eml) and mbox
archives, via the stdlib `email` package (header decoding, MIME
multipart walking, content-transfer-encoding). Mail corpora are a
staple of institutional text collections; the extraction policy is
the curation-friendly one:

- prefer the text/plain body; fall back to text/html stripped
  through functions/htmltext.py; attachments are counted, not
  decoded.
- headers come back decoded (RFC 2047 encoded-words handled by the
  stdlib policy).
- mbox splitting follows the mboxrd convention: a message starts at
  a line matching ``From `` at column 0 (after a blank line or file
  start), and body lines matching ``^>*From `` are quoted with one
  more ``>`` on write / unquoted by one on read — the only reversible
  variant of the family.

ValueError for malformed input (fault-isolation boundary upstream).

Reference behavior parity: extends the reference's PDF-only ingestion
domain (/root/reference/main.py:106-115) alongside officetext/epub.
"""

from __future__ import annotations

import email
import email.policy
import re
from email.message import EmailMessage

__all__ = [
    "build_eml",
    "extract_eml",
    "extract_eml_text",
    "build_mbox",
    "split_mbox",
    "extract_mbox_text",
]

_FROM_LINE = re.compile(rb"^From ", re.M)
# A REAL mbox message separator: "From <sender> <asctime>" — e.g.
# "From alice@example.org Mon Jan  1 00:00:00 2024". mboxo archives
# (common in the wild) do NOT quote body lines that merely start with
# "From ", so splitting on the prefix alone fractures messages
# (r15 review, VERDICT r14 item 2 named seam); the full shape plus
# the blank-line-before rule disambiguates.
_FROM_SEP = re.compile(
    # no ^ anchor: matched via .match(b, pos) where pos is already a
    # line start ("^" would only match at pos 0 without re.M).
    # An optional timezone token between time and year covers the
    # Solaris mailx / old-BSD variant "... 12:04:27 PDT 2001"
    # (r15 review).
    rb"From \S+ +"
    rb"(?:\w{3} )?\w{3} [ \d]?\d [ \d]?\d:\d{2}(?::\d{2})?"
    rb"(?: [A-Za-z]{1,5}| [+-]\d{4})? \d{4}",
)
_QUOTED_FROM = re.compile(r"^(>*)From ", re.M)

# ---------------------------------------------------------------------------
# Fast paths (r16 optimization round). The stdlib email package with
# policy.default is the semantic reference, but its lazy structured-header
# registry costs ~2 ms per build+parse round trip — the dominant term of the
# archive-ingest bench (guide §1.2 step 2: per-task work). The simple-message
# shape (single-part text/plain, ASCII headers, no folding/encoded-words) is
# built and parsed directly; ANYTHING outside that shape falls back to the
# stdlib. Byte-for-byte / field-for-field equivalence with the stdlib on the
# fast-path domain is pinned by tests/test_mail_epub.py differential tests.
# ---------------------------------------------------------------------------

# header value the policy will neither fold, encode, nor re-serialize:
# printable ASCII, no leading/trailing space, fits on one 78-char line
def _plain_header(name: str, value: str) -> bool:
    return (
        0 < len(value) == len(value.strip())
        and all(32 <= ord(c) <= 126 for c in value)
        and "=?" not in value
        and len(name) + 2 + len(value) <= 78
    )


# an addr-spec the AddressHeader parser reserializes unchanged
_PLAIN_ADDR = re.compile(r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\Z")
# a Date value the DateHeader parser reserializes unchanged
_PLAIN_DATE = re.compile(
    r"[A-Z][a-z]{2}, \d{2} [A-Z][a-z]{2} \d{4} "
    r"\d{2}:\d{2}:\d{2} [+-]\d{4}\Z"
)


def build_eml(
    subject: str,
    body: str,
    sender: str = "witness@example.org",
    to: str = "corpus@example.org",
    date: str = "Mon, 01 Jan 2024 00:00:00 +0000",
    html_alternative: str | None = None,
) -> bytes:
    """Minimal RFC 5322 message; with ``html_alternative`` the body
    becomes multipart/alternative (plain first, HTML second — the
    shape real mailers emit)."""
    if (
        html_alternative is None
        and _plain_header("Subject", subject)
        and _PLAIN_ADDR.fullmatch(sender)
        and _PLAIN_ADDR.fullmatch(to)
        and _PLAIN_DATE.fullmatch(date)
    ):
        # byte-identical to the EmailMessage path for this shape
        # (differential-pinned): plain headers emitted directly; the
        # body runs through the stdlib's OWN CTE heuristic+encoder
        # (contentmanager._encode_text), so 7bit/8bit/quoted-printable/
        # base64 selection and payload bytes match exactly — only the
        # structured-header registry (the ~2 ms/message term) is skipped.
        # r17 (ADVICE r16): _encode_text is a private CPython helper —
        # if a stdlib upgrade renames it, degrade to the slow path
        # instead of crashing at runtime.
        try:
            from email.contentmanager import _encode_text
        except ImportError:
            _encode_text = None
        if _encode_text is not None:
            cte, payload = _encode_text(
                body, "utf-8", None, email.policy.default
            )
            return (
                f"Subject: {subject}\nFrom: {sender}\nTo: {to}\n"
                f"Date: {date}\n"
                'Content-Type: text/plain; charset="utf-8"\n'
                f"Content-Transfer-Encoding: {cte}\nMIME-Version: 1.0\n\n"
                f"{payload}"
            ).encode("ascii", "surrogateescape")
    msg = EmailMessage(policy=email.policy.default)
    msg["Subject"] = subject
    msg["From"] = sender
    msg["To"] = to
    msg["Date"] = date
    msg.set_content(body)
    if html_alternative is not None:
        msg.add_alternative(html_alternative, subtype="html")
    return msg.as_bytes()


_FAST_HDR = re.compile(rb"([!-9;-~]+): ?([ -~]*)\Z")


def _extract_eml_fast(data: bytes) -> dict | None:
    """Direct parse of the simple-message shape; None -> caller must
    take the stdlib path. Guards are conservative: any folding,
    encoded-word, non-ASCII header byte, CR, non-trivial
    Content-Type/CTE, or address/date form the structured-header
    registry might reserialize differently bails out."""
    sep = data.find(b"\n\n")
    if sep < 0 or b"\r" in data:
        return None
    head, body = data[:sep], data[sep + 2 :]
    if b"=?" in head:
        return None
    headers: dict[str, str] = {}
    for line in head.split(b"\n"):
        m = _FAST_HDR.match(line)
        if m is None:  # folded/malformed/non-ASCII header: stdlib path
            return None
        name = m.group(1).decode("ascii").lower()
        if name in ("content-disposition", "mime-version"):
            if name == "content-disposition":
                return None
            continue
        value = m.group(2).decode("ascii")
        if value != value.strip(" "):  # policy strips surrounding WS
            return None
        headers.setdefault(name, value)
    if not headers:
        return None
    cte = headers.get("content-transfer-encoding", "7bit")
    if cte == "quoted-printable":
        # what the stdlib itself runs underneath get_payload(decode=True)
        import quopri

        body = quopri.decodestring(body)
    elif cte not in ("7bit", "8bit"):
        return None
    ct = headers.get("content-type")
    if ct is None:
        # absent Content-Type defaults to text/plain charset=us-ascii
        if not body.isascii():
            return None
    elif ct != 'text/plain; charset="utf-8"':
        return None
    sender = headers.get("from", "")
    to = headers.get("to", "")
    date = headers.get("date", "")
    if sender and not _PLAIN_ADDR.fullmatch(sender):
        return None
    if to and not _PLAIN_ADDR.fullmatch(to):
        return None
    if date and not _PLAIN_DATE.fullmatch(date):
        return None
    try:
        text = body.decode("utf-8")
    except UnicodeDecodeError:
        return None
    return {
        "subject": headers.get("subject", ""),
        "sender": sender,
        "to": to,
        "date": date,
        "text": text,
        "body_source": "plain",
        "n_attachments": 0,
    }


def extract_eml(data: bytes) -> dict:
    """.eml bytes -> {subject, sender, to, date, text, body_source,
    n_attachments}. ``body_source`` records which part supplied the
    text ('plain' or 'html')."""
    fast = _extract_eml_fast(bytes(data))
    if fast is not None:
        return fast
    try:
        msg = email.message_from_bytes(
            bytes(data), policy=email.policy.default
        )
    except Exception as exc:  # the stdlib raises a mixed family here
        raise ValueError(f"malformed RFC 5322 message: {exc}") from exc
    if not msg.keys():
        raise ValueError("RFC 5322 message with no headers")
    plain = html = None
    n_attach = 0
    # body selection rides the stdlib get_body traversal: it walks
    # only the viewable-body tree, so a text/plain inside an ATTACHED
    # message/rfc822 cannot hijack the body (r14 close-out seam,
    # pinned) — the manual walk below only counts attachments.
    try:
        body = msg.get_body(preferencelist=("plain",))
        if body is not None:
            plain = body.get_content()
        else:
            body = msg.get_body(preferencelist=("html",))
            if body is not None:
                html = body.get_content()
    except Exception as exc:
        raise ValueError(f"undecodable MIME body: {exc}") from exc
    skip: set[int] = set()
    for part in msg.walk():
        if part is msg:
            continue
        if id(part) in skip:
            continue
        # disposition check BEFORE the multipart skip: an attached
        # message/rfc822 reports is_multipart()==True and was never
        # counted (ADVICE r14). A forwarded email counts as ONE
        # attachment; its inner text body (maintype 'text', no
        # disposition) stays uncounted as before.
        if (
            part.get_content_disposition() == "attachment"
            or part.get_content_type() == "message/rfc822"
        ):
            n_attach += 1  # inline-forwarded email is still an attachment
            # walk() still descends into the counted container; its
            # descendants are THIS attachment's internals, not more
            # attachments (ADVICE r15: a forwarded email with 2
            # attachments reported n_attachments=3) — skip the subtree
            for sub in part.walk():
                if sub is not part:
                    skip.add(id(sub))
            continue
        if part.is_multipart():
            continue
        if part.get_content_maintype() != "text":
            n_attach += 1
    if plain is not None:
        text, src = plain, "plain"
    elif html is not None:
        from .htmltext import extract_main_text

        text, src = extract_main_text(html)["text"], "html"
    else:
        raise ValueError("RFC 5322 message with no text body")
    def hdr(name: str) -> str:
        # policy.default parses structured headers LAZILY at access:
        # a malformed address header raises IndexError deep in the
        # stdlib parser (r14 mutation fuzz) — untrusted headers must
        # surface as the module's ValueError
        try:
            return str(msg.get(name, ""))
        except Exception as exc:  # stdlib raises a mixed family here
            raise ValueError(
                f"malformed {name} header: {exc}"
            ) from exc

    return {
        "subject": hdr("Subject"),
        "sender": hdr("From"),
        "to": hdr("To"),
        "date": hdr("Date"),
        "text": text,
        "body_source": src,
        "n_attachments": n_attach,
    }


def extract_eml_text(data: bytes) -> str:
    """Ingest-dispatch shape: 'Subject: ...' header line, blank line,
    body."""
    m = extract_eml(data)
    return f"Subject: {m['subject']}\n\n{m['text']}"


def build_mbox(messages: list[bytes]) -> bytes:
    """RFC 5322 messages -> one mboxrd archive."""
    if not messages:
        raise ValueError("mbox needs at least one message")
    out = []
    for raw in messages:
        text = bytes(raw).decode("utf-8", "surrogateescape")
        quoted = _QUOTED_FROM.sub(r">\1From ", text)
        out.append(
            "From witness@example.org Mon Jan  1 00:00:00 2024\n"
            + quoted.rstrip("\n")
            + "\n\n"
        )
    return "".join(out).encode("utf-8", "surrogateescape")


def split_mbox(data: bytes) -> list[bytes]:
    """mboxrd bytes -> per-message raw RFC 5322 bytes (separator
    lines removed, ``>*From `` quoting reversed by one level)."""
    b = bytes(data)
    if not b.startswith(b"From "):
        raise ValueError("not an mbox archive (no leading From line)")
    # A separator is a line-leading "From " that ALSO carries the
    # separator shape (sender + asctime). In mboxrd, body From-lines
    # are always quoted, so the shape test is redundant there; in
    # mboxo (no quoting — common in the wild) it keeps prose lines
    # like "From my point of view..." inside their message
    # (r15 review, VERDICT r14 item 2 named seam). No blank-line-
    # before condition: tightly-packed archives (no padding line
    # between messages) must still split, per the r14 pinned test.
    starts = [
        m.start()
        for m in _FROM_LINE.finditer(b)
        if _FROM_SEP.match(b, m.start())
    ]
    if not starts:
        raise ValueError("mbox leading From line is not a separator")
    msgs: list[bytes] = []
    for i, s in enumerate(starts):
        e = starts[i + 1] if i + 1 < len(starts) else len(b)
        block = b[s:e]
        nl = block.find(b"\n")
        if nl < 0:
            raise ValueError("mbox From line without a message")
        body = block[nl + 1 :].rstrip(b"\n") + b"\n"
        text = body.decode("utf-8", "surrogateescape")
        text = _QUOTED_FROM.sub(
            lambda m: m.group(1)[1:] + "From " if m.group(1) else "From ",
            text,
        )
        msgs.append(text.encode("utf-8", "surrogateescape"))
    return msgs


def extract_mbox_text(data: bytes) -> str:
    """Ingest-dispatch shape: every message through
    ``extract_eml_text``, separated by a blank line."""
    return "\n\n".join(
        extract_eml_text(m) for m in split_mbox(data)
    )
