"""ID3 metadata (functions/id3.py): v2.2/2.3/2.4 frame layouts, all
four text encodings, unsynchronisation, extended headers, COMM
language, v1/v1.1 fallback, canonical merge, gates, fuzz."""

from __future__ import annotations

import pytest

from articulation_vector_db_api_spark.functions.id3 import (
    id3_metadata,
    parse_id3v1,
    parse_id3v2,
)


def _syncsafe4(n: int) -> bytes:
    return bytes(
        [(n >> 21) & 0x7F, (n >> 14) & 0x7F, (n >> 7) & 0x7F, n & 0x7F]
    )


def _v23_frame(fid: bytes, payload: bytes, flags: int = 0) -> bytes:
    return (
        fid + len(payload).to_bytes(4, "big")
        + flags.to_bytes(2, "big") + payload
    )


def _v24_frame(fid: bytes, payload: bytes, flags: int = 0) -> bytes:
    return (
        fid + _syncsafe4(len(payload))
        + flags.to_bytes(2, "big") + payload
    )


def _tag(version: int, body: bytes, flags: int = 0) -> bytes:
    return (
        b"ID3" + bytes([version, 0, flags]) + _syncsafe4(len(body))
        + body
    )


def test_v23_text_frames_all_encodings():
    body = (
        _v23_frame(b"TIT2", b"\x00Latin title")
        + _v23_frame(b"TPE1", b"\x01" + "ütf16 çura".encode("utf-16"))
        + _v23_frame(b"TALB", b"\x02" + "be16".encode("utf-16-be"))
        + _v23_frame(b"TYER", b"\x03" + "1999".encode("utf-8"))
        + _v23_frame(
            b"COMM", b"\x00eng" + b"desc\x00the comment body"
        )
    )
    meta = parse_id3v2(_tag(3, body))
    assert meta["version"] == "2.3"
    assert meta["frames"]["TIT2"] == ["Latin title"]
    assert meta["frames"]["TPE1"] == ["ütf16 çura"]
    assert meta["frames"]["TALB"] == ["be16"]
    assert meta["frames"]["TYER"] == ["1999"]
    assert meta["comments"] == [
        {"lang": "eng", "text": "the comment body"}
    ]


def test_v24_syncsafe_and_multivalue():
    body = _v24_frame(
        b"TPE1", b"\x03" + "first\x00second".encode("utf-8")
    ) + _v24_frame(b"TDRC", b"\x00" + b"2008")
    meta = parse_id3v2(_tag(4, body))
    assert meta["frames"]["TPE1"] == ["first", "second"]
    assert id3_metadata(_tag(4, body))["year"] == "2008"


def test_v22_three_char_layout():
    body = (
        b"TT2" + (12).to_bytes(3, "big") + b"\x00old school!"
        + b"TP1" + (7).to_bytes(3, "big") + b"\x00artist"
    )
    meta = parse_id3v2(_tag(2, body))
    assert meta["frames"]["TT2"] == ["old school!"]
    assert id3_metadata(_tag(2, body))["title"] == "old school!"


def test_whole_tag_unsynchronisation():
    # payload byte 0xFF gets a 0x00 stuffed after it on write
    text = b"\x00a\xffb"
    raw = _v23_frame(b"TIT2", text)
    stuffed = raw.replace(b"\xff", b"\xff\x00")
    meta = parse_id3v2(_tag(3, stuffed, flags=0x80))
    assert meta["frames"]["TIT2"] == ["a\xffb"]


def test_extended_header_skip():
    ext = (6).to_bytes(4, "big") + b"\x00\x00" + b"\x00" * 4
    body = ext + _v23_frame(b"TIT2", b"\x00x")
    meta = parse_id3v2(_tag(3, body, flags=0x40))
    assert meta["frames"]["TIT2"] == ["x"]


def test_id3v1_and_v11_fallback_and_merge():
    v1 = (
        b"TAG"
        + b"Old Title".ljust(30, b"\x00")
        + b"Old Artist".ljust(30, b"\x00")
        + b"Old Album".ljust(30, b"\x00")
        + b"1977"
        + b"comment".ljust(28, b"\x00") + b"\x00\x07"  # v1.1 track 7
        + bytes([17])
    )
    assert len(v1) == 128
    meta = parse_id3v1(b"AUDIOFRAMES" + v1)
    assert meta["title"] == "Old Title" and meta["track"] == 7
    assert meta["genre_code"] == 17
    # v2 wins canonical keys; v1 fills the rest
    v2 = _tag(3, _v23_frame(b"TIT2", b"\x00New Title"))
    merged = id3_metadata(v2 + b"frames" + v1)
    assert merged["title"] == "New Title"
    assert merged["artist"] == "Old Artist"
    assert merged["track"] == "7"


def test_gates_and_malformed():
    assert parse_id3v2(b"no tag here") is None
    assert parse_id3v1(b"short") is None
    with pytest.raises(ValueError, match="syncsafe"):
        parse_id3v2(b"ID3\x03\x00\x00\x80\x00\x00\x00")
    with pytest.raises(ValueError, match="truncated"):
        parse_id3v2(_tag(3, _v23_frame(b"TIT2", b"\x00x"))[:-1])
    with pytest.raises(NotImplementedError, match="compressed"):
        parse_id3v2(_tag(3, _v23_frame(b"TIT2", b"\x00x", flags=0x80)))
    with pytest.raises(ValueError, match="encoding"):
        parse_id3v2(_tag(3, _v23_frame(b"TIT2", b"\x07x")))


def test_fuzz_contract():
    import random

    blob = _tag(3, (
        _v23_frame(b"TIT2", b"\x00title")
        + _v23_frame(b"COMM", b"\x00engd\x00body")
    ))
    rng = random.Random(11)
    for _ in range(300):
        bad = bytearray(blob)
        i = rng.randrange(len(bad))
        bad[i] ^= 1 << rng.randrange(8)
        try:
            meta = parse_id3v2(bytes(bad))
        except (ValueError, NotImplementedError, UnicodeDecodeError):
            continue
        assert meta is None or isinstance(meta["frames"], dict)


def test_utf16_nul_terminated_and_aligned_split():
    """ADVICE r13 (id3.py:58): UTF-16 payloads must be split on the
    terminator at 2-byte code-unit boundaries. Real v2.3 taggers
    NUL-terminate text frames ('AB'.encode('utf-16') + b'\\x00\\x00'),
    and 'a\\u0100' in LE is 61 00 00 01 — a byte-level b'\\x00\\x00'
    split corrupts both."""
    # NUL-terminated BOM'd frame: terminator must not raise and must
    # not leave a phantom empty value.
    term = b"\x01" + "AB".encode("utf-16") + b"\x00\x00"
    body = _v23_frame(b"TIT2", term)
    t = parse_id3v2(_tag(3, body))
    assert t["frames"]["TIT2"] == ["AB"]

    # Low-byte-0 code unit after an ASCII char: 'aĀ'.
    tricky = b"\x01" + "aĀ".encode("utf-16")
    t = parse_id3v2(_tag(3, _v23_frame(b"TIT2", tricky)))
    assert t["frames"]["TIT2"] == ["aĀ"]

    # Same for explicit UTF-16-BE (encoding 2): 'Āa' is 01 00 00 61.
    be = b"\x02" + "Āa".encode("utf-16-be")
    t = parse_id3v2(_tag(4, _v24_frame(b"TIT2", be)))
    assert t["frames"]["TIT2"] == ["Āa"]

    # v2.4 multi-value UTF-16: two strings separated by the aligned
    # terminator, second with its own BOM.
    multi = b"\x01" + "one".encode("utf-16") + b"\x00\x00" \
        + "two".encode("utf-16")
    t = parse_id3v2(_tag(4, _v24_frame(b"TIT2", multi)))
    assert t["frames"]["TIT2"] == ["one", "two"]


def test_undecodable_text_raises_valueerror():
    """Decode failures must surface as ValueError (the module
    contract), never UnicodeDecodeError."""
    # Odd-length UTF-16 payload (truncated code unit).
    bad16 = b"\x01" + "AB".encode("utf-16")[:-1]
    with pytest.raises(ValueError, match="undecodable"):
        parse_id3v2(_tag(3, _v23_frame(b"TIT2", bad16)))
    # Invalid UTF-8 continuation byte.
    bad8 = b"\x03\xc3\x28"
    with pytest.raises(ValueError, match="undecodable"):
        parse_id3v2(_tag(4, _v24_frame(b"TIT2", bad8)))


def test_grouping_and_data_length_indicator_flags():
    """r14 self-review F7: grouping (v2.3 0x20 / v2.4 0x40) prepends
    a group-id byte and v2.4 DLI (0x01) prepends a 4-byte syncsafe
    length — unhandled, they were misparsed as the encoding byte."""
    # v2.3 grouped TIT2: group byte 0x7A then latin1 text
    t = parse_id3v2(
        _tag(3, _v23_frame(b"TIT2", b"\x7a\x00Grouped", flags=0x0020))
    )
    assert t["frames"]["TIT2"] == ["Grouped"]
    # v2.4 grouped + DLI
    payload = b"\x00Sized"
    framed = b"\x7a" + len(payload).to_bytes(4, "big") + payload
    # syncsafe DLI: payload is 6 bytes -> 00 00 00 06
    t = parse_id3v2(
        _tag(4, _v24_frame(b"TIT2", framed, flags=0x0041))
    )
    assert t["frames"]["TIT2"] == ["Sized"]
    # DLI that disagrees with the actual length raises
    bad = b"\x00\x00\x00\x63" + b"\x00hi"
    with pytest.raises(ValueError, match="data length indicator"):
        parse_id3v2(_tag(4, _v24_frame(b"TIT2", bad, flags=0x0001)))


def test_comm_splits_at_first_terminator():
    """r14 self-review F8: COMM is <desc>\\x00<text>; an empty text
    must come back empty, not as the description."""
    body = b"\x00eng" + b"short desc\x00the actual comment"
    t = parse_id3v2(_tag(3, _v23_frame(b"COMM", body)))
    assert t["comments"] == [
        {"lang": "eng", "text": "the actual comment"}
    ]
    # empty body -> empty text (used to return the description)
    t = parse_id3v2(
        _tag(3, _v23_frame(b"COMM", b"\x00eng" + b"desc only\x00"))
    )
    assert t["comments"][0]["text"] == ""
    # no terminator at all: the whole payload is text
    t = parse_id3v2(
        _tag(3, _v23_frame(b"COMM", b"\x00engjust text"))
    )
    assert t["comments"][0]["text"] == "just text"
    # UTF-16 desc/text split stays code-unit aligned
    b16 = b"\x01" + "aĀ".encode("utf-16") + b"\x00\x00" \
        + "body".encode("utf-16")
    t = parse_id3v2(_tag(3, _v23_frame(b"COMM", b"\x01eng"[:1] + b"eng" + b16[1:])))
    assert t["comments"][0]["text"] == "body"


def test_apic_and_pic_picture_frames():
    """r14: APIC (v2.3/2.4) and PIC (v2.2) attached pictures parse to
    {mime, pic_type, description, data} with encoding-aware
    description terminators — cover art is multimodal payload."""
    img = b"\xff\xd8fakejpegbytes\xff\xd9"
    apic = (
        b"\x00" + b"image/jpeg\x00" + b"\x03"  # front cover
        + b"front\x00" + img
    )
    t = parse_id3v2(_tag(3, _v23_frame(b"APIC", apic)))
    [p] = t["pictures"]
    assert p == {
        "mime": "image/jpeg", "pic_type": 3,
        "description": "front", "data": img,
    }
    # UTF-16 description with the aligned terminator
    apic16 = (
        b"\x01" + b"image/png\x00" + b"\x04"
        + "aĀ".encode("utf-16") + b"\x00\x00" + b"PNGDATA"
    )
    t = parse_id3v2(_tag(4, _v24_frame(b"APIC", apic16)))
    [p] = t["pictures"]
    assert p["description"] == "aĀ" and p["data"] == b"PNGDATA"
    # v2.2 PIC with the 3-char format code
    pic = b"\x00" + b"JPG" + b"\x03" + b"\x00" + img
    t = parse_id3v2(
        _tag(2, b"PIC" + len(pic).to_bytes(3, "big") + pic)
    )
    [p] = t["pictures"]
    assert p["mime"] == "image/jpeg" and p["data"] == img
    # malformed: unterminated mime / description / no data
    with pytest.raises(ValueError, match="mime unterminated"):
        parse_id3v2(_tag(3, _v23_frame(b"APIC", b"\x00image/jpeg")))
    with pytest.raises(ValueError, match="unterminated"):
        parse_id3v2(_tag(3, _v23_frame(b"APIC", b"\x00m\x00\x03nodesc")))
    with pytest.raises(ValueError, match="no image data"):
        parse_id3v2(_tag(3, _v23_frame(b"APIC", b"\x00m\x00\x03d\x00")))
