"""RTF (Rich Text Format) text extraction — the Microsoft spec is a
public control-word stream: groups in `{}`, control words `\\word<N>`,
control symbols `\\x`, hex escapes `\\'hh`, and Unicode escapes
`\\uN` with a `\\ucN` skip convention. Legacy institutional corpora
(pre-OOXML Word exports, email attachments) still carry RTF; this
extractor reduces a document to its paragraph text the same way the
officetext extractors do.

Extraction policy:
- `\\par` / `\\line` -> newline, `\\tab` -> TAB, `\\~` -> NBSP,
  `\\{ \\} \\\\` -> literals.
- destination groups (`{\\*\\...}`, fonttbl, colortbl, stylesheet,
  info, pict, field instructions) are SKIPPED — their payload is
  markup, not document text.
- `\\uN` emits the code point and skips the following `\\ucN`
  fallback characters (default 1, inherited per group per the spec).
- `\\ansicpg`-declared code pages beyond latin-1/cp1252 fall back to
  latin-1 for `\\'hh` bytes (cp1252 is the overwhelming default).

ValueError for malformed input (unbalanced groups, not-RTF) — the
ingest fault-isolation boundary catches it per file.

Reference behavior parity: extends the reference's PDF-only ingestion
domain (/root/reference/main.py:106-115) alongside officetext/epub.
"""

from __future__ import annotations

import re

__all__ = ["extract_rtf_text", "build_rtf"]

_SKIP_DESTINATIONS = {
    "fonttbl", "colortbl", "stylesheet", "info", "pict", "object",
    "header", "footer", "headerl", "headerr", "footerl", "footerr",
    "footnote", "annotation", "xe", "tc", "fldinst", "themedata",
    "colorschememapping", "latentstyles", "datastore", "generator",
    "listtable", "listoverridetable", "rsidtbl", "filetbl",
}

_CTRL = re.compile(r"\\([a-z]{1,32})(-?\d{1,10})? ?|\\([^a-z])", re.S)


def extract_rtf_text(data: bytes | str) -> str:
    """RTF bytes/text -> extracted document text."""
    if isinstance(data, (bytes, bytearray, memoryview)):
        text = bytes(data).decode("latin1")
    else:
        text = data
    if not text.startswith("{\\rtf"):
        raise ValueError("not an RTF document (missing {\\rtf header)")
    out: list[str] = []
    # group state: (skipping, uc_count). ``skipping`` records the
    # REASON the group is suppressed — None (emitting), "dest"
    # (destination payload, never document text) or "upr" (the ANSI
    # fallback half of a \upr pair, whose {\*\ud} twin IS text) — so
    # the \*\ud lookahead can re-enable emission only for the \upr
    # case and not leak text out of an enclosing skipped destination
    # (ADVICE r14: a \upr pair inside \stylesheet leaked its ud body).
    stack: list[tuple[str | None, int]] = []
    skipping: str | None = None
    uc = 1
    i = 0
    n = len(text)
    pending_uc_skip = 0
    pending_high = 0  # stashed UTF-16 high surrogate from \uN

    def emit(s: str) -> None:
        nonlocal pending_uc_skip, pending_high
        if skipping:
            return
        if pending_uc_skip > 0:
            take = min(pending_uc_skip, len(s))
            pending_uc_skip -= take
            s = s[take:]
        if not s:
            return
        if pending_high:
            # an unpaired high surrogate followed by ordinary text:
            # it can never complete — degrade to U+FFFD (a surrogate
            # in the output string would crash Arrow serialization
            # downstream, escaping the fault boundary)
            out.append("�")
            pending_high = 0
        out.append(s)

    def emit_cp(cp: int) -> None:
        """\\uN code unit: combine UTF-16 surrogate PAIRS — Word
        encodes non-BMP chars as two \\uN escapes (r14 review)."""
        nonlocal pending_high
        if skipping:
            return
        if pending_high:
            if 0xDC00 <= cp <= 0xDFFF:
                full = 0x10000 + ((pending_high - 0xD800) << 10) + (
                    cp - 0xDC00
                )
                pending_high = 0
                emit(chr(full))
                return
            out.append("�")
            pending_high = 0
        if 0xD800 <= cp <= 0xDBFF:
            pending_high = cp
        elif 0xDC00 <= cp <= 0xDFFF:
            emit("�")  # unpaired low surrogate
        else:
            emit(chr(cp))

    while i < n:
        c = text[i]
        if c == "{":
            stack.append((skipping, uc))
            i += 1
            continue
        if c == "}":
            if not stack:
                raise ValueError("RTF group underflow")
            skipping, uc = stack.pop()
            i += 1
            continue
        if c == "\\":
            m = _CTRL.match(text, i)
            if not m:
                i += 1
                continue
            i = m.end()
            if m.group(3) is not None:  # control symbol
                sym = m.group(3)
                if sym == "*":
                    # {\* ...}: unknown destination — skip the group.
                    # EXCEPT {\*\ud ...}: inside a \upr pair the ud
                    # group carries the PREFERRED Unicode version of
                    # text whose ANSI fallback we skip below — emit it
                    # (r14 close-out: previously the lossy fallback won)
                    nxt = _CTRL.match(text, i)
                    if nxt and nxt.group(1) == "ud":
                        # only the \upr-established skip is lifted: a
                        # ud group nested inside a skipped destination
                        # (e.g. \upr inside \stylesheet) stays dark
                        if skipping in (None, "upr"):
                            skipping = None
                    else:
                        skipping = "dest"
                elif sym in "{}\\":
                    emit(sym)
                elif sym == "~":
                    emit("\u00a0")
                elif sym == "'":
                    if i + 2 <= n:
                        try:
                            emit(bytes([int(text[i : i + 2], 16)])
                                 .decode("cp1252", "replace"))
                        except ValueError as exc:
                            raise ValueError(
                                f"RTF bad hex escape at {i}"
                            ) from exc
                        i += 2
                continue
            word = m.group(1)
            param = int(m.group(2)) if m.group(2) else None
            if word == "bin":
                # \binN is followed by N RAW bytes (not RTF text) —
                # walking them as markup desyncs the group parse
                # (r14 close-out seam, pinned)
                skip = max(0, param or 0)
                if i + skip > n:
                    raise ValueError("RTF \\bin run beyond document")
                i += skip
            elif word in _SKIP_DESTINATIONS:
                skipping = "dest"
            elif word == "upr":
                # \upr pairs an ANSI fallback with a {\*\ud} Unicode
                # version: skip the fallback, the \*\ud lookahead
                # above re-enables emission for the ud group. If an
                # enclosing destination already suppresses this group,
                # keep THAT reason — its ud twin must stay dark too.
                if skipping is None:
                    skipping = "upr"
            elif word == "uc":
                uc = param if param is not None else 1
            elif word == "u" and param is not None:
                cp = param if param >= 0 else param + 65536
                if not 0 <= cp <= 0xFFFF:
                    raise ValueError(f"RTF \\u escape out of range: {param}")
                emit_cp(cp)
                if not skipping:
                    pending_uc_skip += uc
            elif word in ("par", "line", "sect", "page"):
                emit("\n")
            elif word == "tab":
                emit("\t")
            elif word in ("emdash",):
                emit("\u2014")
            elif word in ("endash",):
                emit("\u2013")
            elif word in ("lquote",):
                emit("\u2018")
            elif word in ("rquote",):
                emit("\u2019")
            elif word in ("ldblquote",):
                emit("\u201c")
            elif word in ("rdblquote",):
                emit("\u201d")
            elif word in ("bullet",):
                emit("\u2022")
            # every other control word is formatting — ignored
            continue
        if c in "\r\n":
            i += 1  # raw newlines are insignificant in RTF
            continue
        # plain text run up to the next significant character
        j = i
        while j < n and text[j] not in "\\{}\r\n":
            j += 1
        emit(text[i:j])
        i = j
    if stack:
        raise ValueError("RTF group not closed")
    if pending_high:
        out.append("\ufffd")
    return "".join(out).rstrip("\n")


def _escape(s: str) -> str:
    out = []
    for ch in s:
        if ch in "\\{}":
            out.append("\\" + ch)
        elif ord(ch) < 128:
            out.append(ch)
        elif ord(ch) <= 0xFFFF:
            cp = ord(ch)
            out.append(f"\\u{cp if cp < 32768 else cp - 65536}?")
        else:
            # non-BMP rides a UTF-16 surrogate PAIR of \uN escapes,
            # exactly as Word writes it (r14 review)
            v = ord(ch) - 0x10000
            for cu in (0xD800 + (v >> 10), 0xDC00 + (v & 0x3FF)):
                out.append(f"\\u{cu - 65536}?")
    return "".join(out)


def build_rtf(paragraphs: list[str]) -> bytes:
    """Paragraph list -> a minimal conformant RTF document (witness
    builder — non-ASCII rides \\uN? escapes with \\uc1)."""
    body = "\\par\n".join(_escape(p) for p in paragraphs)
    doc = (
        "{\\rtf1\\ansi\\ansicpg1252\\deff0\\uc1"
        "{\\fonttbl{\\f0 Times New Roman;}}"
        "\n" + body + "}"
    )
    return doc.encode("latin1", "replace")
