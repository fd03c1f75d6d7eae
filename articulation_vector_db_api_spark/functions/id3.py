"""ID3 tag METADATA extraction (ID3v2.2/2.3/2.4 + ID3v1) — the
public informal standards (id3.org) every tagged audio file follows.
The frame walks in functions/mp3.py SKIP these tags; this module
reads them, because tag metadata (title/artist/album/year/genre,
comments, language) is curation signal for audio corpora — the
audio twin of the HTML/PDF metadata the text pipeline keeps.

Surface: the three v2 layouts (v2.2: 3-char ids + 3-byte sizes;
v2.3: 4-char ids + big-endian sizes + frame flags; v2.4: syncsafe
frame sizes), whole-tag unsynchronisation (v2.2/2.3), the v2.3/2.4
extended header, all four text encodings (ISO-8859-1, UTF-16 with
BOM, UTF-16BE, UTF-8), T*** text frames (v2.4 multi-value on NUL),
COMM comment frames with their language code, APIC/PIC attached
pictures (r14: embedded cover art routes to the image decoders), and
the trailing 128-byte ID3v1 record as fallback. Compression/
encryption frame flags gate honestly.

ValueError for structurally broken tags (fault-isolation boundary).
"""

from __future__ import annotations

__all__ = ["parse_id3v2", "parse_id3v1", "id3_metadata"]

# common frame id -> canonical key, across v2.2 (3-char) and v2.3/4
_CANON = {
    "TIT2": "title", "TT2": "title",
    "TPE1": "artist", "TP1": "artist",
    "TALB": "album", "TAL": "album",
    "TYER": "year", "TYE": "year", "TDRC": "year",
    "TRCK": "track", "TRK": "track",
    "TCON": "genre", "TCO": "genre",
    "TLAN": "language", "TLA": "language",
}


def _syncsafe(b: bytes) -> int:
    n = 0
    for byte in b:
        if byte & 0x80:
            raise ValueError("ID3v2 size bytes must be syncsafe")
        n = (n << 7) | byte
    return n


def _de_unsync(b: bytes) -> bytes:
    return b.replace(b"\xff\x00", b"\xff")


def _split_utf16(raw: bytes) -> list[bytes]:
    """Split on the UTF-16 NUL terminator scanned at 2-byte code-unit
    boundaries. A byte-level split on b"\\x00\\x00" misparses any text
    where a low byte 0 follows an ASCII char (e.g. "a\\u0100" in LE is
    61 00 00 01) and chokes on the spec's NUL-terminated frames
    (ADVICE r13: 'AB'.encode('utf-16') + b'\\x00\\x00')."""
    parts: list[bytes] = []
    start = i = 0
    while i + 1 < len(raw):
        if raw[i] == 0 and raw[i + 1] == 0:
            parts.append(raw[start:i])
            start = i + 2
        i += 2
    parts.append(raw[start:])
    return parts


def _decode_text(enc: int, raw: bytes) -> list[str]:
    """Encoding byte + payload -> value list (v2.4 allows multiple
    NUL-separated strings in one text frame). Malformed payloads raise
    ValueError (the module contract), never UnicodeDecodeError."""
    try:
        if enc == 0:
            vals = [p.decode("latin1") for p in raw.split(b"\x00")]
        elif enc in (1, 2):
            codec = "utf-16" if enc == 1 else "utf-16-be"
            vals = [
                p.decode(codec) if p else "" for p in _split_utf16(raw)
            ]
        elif enc == 3:
            vals = [p.decode("utf-8") for p in raw.split(b"\x00")]
        else:
            raise ValueError(f"ID3v2 text encoding {enc}")
    except UnicodeDecodeError as exc:
        raise ValueError(f"ID3v2 text payload undecodable: {exc}") from exc
    return [v for v in vals if v]


def _split_comm(enc: int, raw: bytes) -> tuple[str, str]:
    """COMM payload after the language: (description, text), split at
    the FIRST terminator (alignment-aware for UTF-16); a payload with
    no terminator is all text (the common sloppy-tagger form)."""
    try:
        if enc in (1, 2):
            codec = "utf-16" if enc == 1 else "utf-16-be"
            parts = _split_utf16(raw)
            decoded = [p.decode(codec) if p else "" for p in parts]
        elif enc in (0, 3):
            codec = "latin1" if enc == 0 else "utf-8"
            decoded = [p.decode(codec) for p in raw.split(b"\x00")]
        else:
            raise ValueError(f"ID3v2 text encoding {enc}")
    except UnicodeDecodeError as exc:
        raise ValueError(f"ID3v2 text payload undecodable: {exc}") from exc
    if len(decoded) == 1:
        return "", decoded[0]
    # terminators inside the body are content (v1-converted comments)
    return decoded[0], "\x00".join(decoded[1:]).rstrip("\x00")


def _term_split(enc: int, raw: bytes) -> tuple[str, bytes]:
    """One encoding-terminated string prefix -> (text, remainder):
    NUL for latin1/utf-8, ALIGNED double-NUL for the UTF-16 forms
    (the same code-unit discipline as _split_utf16)."""
    try:
        if enc in (0, 3):
            idx = raw.find(b"\x00")
            if idx < 0:
                raise ValueError("ID3v2 unterminated string")
            codec = "latin1" if enc == 0 else "utf-8"
            return raw[:idx].decode(codec), raw[idx + 1 :]
        if enc in (1, 2):
            codec = "utf-16" if enc == 1 else "utf-16-be"
            i = 0
            while i + 1 < len(raw):
                if raw[i] == 0 and raw[i + 1] == 0:
                    head = raw[:i]
                    return (
                        head.decode(codec) if head else "",
                        raw[i + 2 :],
                    )
                i += 2
            raise ValueError("ID3v2 unterminated UTF-16 string")
    except UnicodeDecodeError as exc:
        raise ValueError(f"ID3v2 text payload undecodable: {exc}") from exc
    raise ValueError(f"ID3v2 text encoding {enc}")


_PIC_FORMATS = {"JPG": "image/jpeg", "PNG": "image/png"}


def _parse_picture(fid_s: str, payload: bytes) -> dict:
    """APIC (v2.3/2.4) / PIC (v2.2) attached-picture frame ->
    {mime, pic_type, description, data} — embedded cover art is a
    first-class multimodal payload (the bytes route to the image
    decoders downstream)."""
    if len(payload) < (6 if fid_s == "PIC" else 4):
        raise ValueError(f"ID3v2 {fid_s} frame truncated")
    enc = payload[0]
    if enc > 3:
        raise ValueError(f"ID3v2 text encoding {enc}")
    if fid_s == "PIC":
        fmt = payload[1:4].decode("latin1")
        mime = _PIC_FORMATS.get(
            fmt.upper(), f"image/{fmt.strip().lower()}"
        )
        pic_type = payload[4]
        rest = payload[5:]
    else:
        idx = payload.find(b"\x00", 1)
        if idx < 0 or idx + 2 > len(payload):
            raise ValueError("ID3v2 APIC mime unterminated")
        mime = payload[1:idx].decode("latin1")
        pic_type = payload[idx + 1]
        rest = payload[idx + 2 :]
    desc, data = _term_split(enc, rest)
    if not data:
        raise ValueError(f"ID3v2 {fid_s} frame with no image data")
    return {
        "mime": mime,
        "pic_type": pic_type,
        "description": desc,
        "data": data,
    }


def parse_id3v2(data: bytes) -> dict | None:
    """Leading ID3v2 tag -> {version, frames: {id: [values]},
    comments: [{lang, text}], pictures: [{mime, pic_type,
    description, data}]}; None when no tag is present."""
    b = bytes(data)
    if b[:3] != b"ID3" or len(b) < 10:
        return None
    ver = b[3]
    if ver not in (2, 3, 4):
        raise ValueError(f"ID3v2.{ver} is not a known layout")
    flags = b[5]
    size = _syncsafe(b[6:10])
    body = b[10 : 10 + size]
    if len(body) < size:
        raise ValueError("ID3v2 tag truncated")
    if flags & 0x80 and ver in (2, 3):
        body = _de_unsync(body)  # whole-tag unsynchronisation
    if flags & 0x40 and ver >= 3:  # extended header
        if len(body) < 4:
            raise ValueError("ID3v2 extended header truncated")
        if ver == 3:
            ext = int.from_bytes(body[0:4], "big") + 4
        else:
            ext = _syncsafe(body[0:4])
        body = body[ext:]
    id_len = 3 if ver == 2 else 4
    frames: dict[str, list[str]] = {}
    comments: list[dict] = []
    pictures: list[dict] = []
    i = 0
    while i + id_len * 2 <= len(body):
        fid = body[i : i + id_len]
        if fid == b"\x00" * id_len:
            break  # padding
        try:
            fid_s = fid.decode("ascii")
        except UnicodeDecodeError as exc:
            raise ValueError(f"ID3v2 frame id {fid!r}") from exc
        if not fid_s.isalnum() or not fid_s.isupper():
            raise ValueError(f"ID3v2 frame id {fid_s!r}")
        if ver == 2:
            fsize = int.from_bytes(body[i + 3 : i + 6], "big")
            hdr = 6
            fflags = 0
        else:
            raw_sz = body[i + 4 : i + 8]
            fsize = (
                _syncsafe(raw_sz) if ver == 4
                else int.from_bytes(raw_sz, "big")
            )
            fflags = int.from_bytes(body[i + 8 : i + 10], "big")
            hdr = 10
        payload = body[i + hdr : i + hdr + fsize]
        if len(payload) < fsize:
            raise ValueError(f"ID3v2 frame {fid_s} truncated")
        i += hdr + fsize
        if ver == 3 and fflags & 0x00C0:
            raise NotImplementedError(
                f"ID3v2.3 compressed/encrypted frame {fid_s}"
            )
        if ver == 4 and fflags & 0x000C:
            raise NotImplementedError(
                f"ID3v2.4 compressed/encrypted frame {fid_s}"
            )
        # r14 self-review F7: the grouping and data-length-indicator
        # format flags prepend bytes to the frame data — unhandled,
        # they were misparsed as the text encoding byte.
        if (ver == 3 and fflags & 0x0020) or (
            ver == 4 and fflags & 0x0040
        ):
            if not payload:
                raise ValueError(f"ID3v2 grouped frame {fid_s} empty")
            payload = payload[1:]  # group identity byte
        dli = None
        if ver == 4 and fflags & 0x0001:
            if len(payload) < 4:
                raise ValueError(
                    f"ID3v2.4 frame {fid_s} data length indicator "
                    "truncated"
                )
            dli = _syncsafe(payload[:4])
            payload = payload[4:]
        if ver == 4 and fflags & 0x0002:
            payload = _de_unsync(payload)  # per-frame unsync
        if dli is not None and len(payload) != dli:
            raise ValueError(
                f"ID3v2.4 frame {fid_s} data length indicator "
                f"{dli} != {len(payload)} actual"
            )
        if not payload:
            continue
        if fid_s.startswith("T") and fid_s not in ("TXX", "TXXX"):
            frames.setdefault(fid_s, []).extend(
                _decode_text(payload[0], payload[1:])
            )
        elif fid_s in ("COM", "COMM"):
            if len(payload) < 4:
                raise ValueError("ID3v2 COMM frame truncated")
            enc, lang = payload[0], payload[1:4]
            # the payload is <description>\x00<text>: split at the
            # FIRST terminator — r14 self-review F8: taking the last
            # non-empty value returned the description when the body
            # was empty
            _desc, text = _split_comm(enc, payload[4:])
            comments.append({
                "lang": lang.decode("latin1"),
                "text": text,
            })
        elif fid_s in ("PIC", "APIC"):
            pictures.append(_parse_picture(fid_s, bytes(payload)))
    return {
        "version": f"2.{ver}",
        "frames": frames,
        "comments": comments,
        "pictures": pictures,
    }


def parse_id3v1(data: bytes) -> dict | None:
    """Trailing 128-byte ID3v1 record -> {title, artist, album, year,
    comment, track, genre_code}; None when absent."""
    b = bytes(data)
    if len(b) < 128 or b[-128:-125] != b"TAG":
        return None
    t = b[-125:]

    def s(a: int, n: int) -> str:
        return t[a : a + n].split(b"\x00")[0].decode(
            "latin1"
        ).strip()

    track = None
    comment_len = 30
    # ID3v1.1: comment truncates to 28 bytes, byte 28 is 0 and byte
    # 29 carries the track number (field offsets from "TAG"+3:
    # comment spans 94..123, genre at 124)
    if t[122] == 0 and t[123] != 0:
        track = t[123]
        comment_len = 28
    return {
        "title": s(0, 30),
        "artist": s(30, 30),
        "album": s(60, 30),
        "year": s(90, 4),
        "comment": s(94, comment_len),
        "track": track,
        "genre_code": t[124],
    }


def id3_metadata(data: bytes) -> dict:
    """Best-of-both view for curation: canonical keys (title, artist,
    album, year, track, genre, language) from the v2 tag when
    present, falling back to v1 fields; plus the raw structures."""
    v2 = parse_id3v2(data)
    v1 = parse_id3v1(data)
    out: dict = {"id3v2": v2, "id3v1": v1}
    canon: dict[str, str] = {}
    if v1:
        for k in ("title", "artist", "album", "year"):
            if v1[k]:
                canon[k] = v1[k]
        if v1["track"] is not None:
            canon["track"] = str(v1["track"])
    if v2:
        for fid, vals in v2["frames"].items():
            key = _CANON.get(fid)
            if key and vals:
                canon[key] = vals[0]
    out.update(canon)
    return out
