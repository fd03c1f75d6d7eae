"""Fragmented MP4 (functions/fmp4.py): init/media segment roundtrip,
tfhd/trex default fallbacks, continuity contracts (mfhd sequence,
tfdt decode time), real-MJPEG decode through the fragment layer, and
the byte-flip fuzz contract."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from articulation_vector_db_api_spark.functions.fmp4 import (
    build_fmp4_mjpeg,
    demux_fmp4,
)


def test_roundtrip_samples_and_meta():
    segs = [
        [(3000, b"A" * 50), (3000, b"B" * 70), (1500, b"C" * 10)],
        [(3000, b"D" * 60)],
        [(750, b"E" * 90), (750, b"F" * 30)],
    ]
    init, media = build_fmp4_mjpeg(segs, 48, 32, timescale=90000)
    meta, samples = demux_fmp4(init, media)
    assert (meta["codec"], meta["width"], meta["height"]) == ("jpeg", 48, 32)
    assert meta["timescale"] == 90000
    assert meta["n_fragments"] == 3
    assert samples == [t for seg in segs for t in seg]
    assert meta["duration"] == sum(d for seg in segs for d, _ in seg)


def test_trex_and_tfhd_defaults():
    """A trun with NO per-sample fields falls back to tfhd's
    default-sample-duration/size; hand-built fragment."""
    from articulation_vector_db_api_spark.functions.fmp4 import (
        _box,
        _full,
    )

    init, _ = build_fmp4_mjpeg([[(1, b"x")]], 16, 16)
    payload = b"P" * 40 + b"Q" * 40
    mfhd = _full(b"mfhd", 0, struct.pack(">I", 1))
    tfhd = _box(
        b"tfhd",
        struct.pack(">I", 0x20000 | 0x08 | 0x10)  # moof-base + defaults
        + struct.pack(">I", 1)      # track_ID
        + struct.pack(">I", 3000)   # default_sample_duration
        + struct.pack(">I", 40),    # default_sample_size
    )
    tfdt = _box(b"tfdt", struct.pack(">I", 0) + struct.pack(">I", 0))
    trun = _box(
        b"trun",
        struct.pack(">I", 0x01)       # data-offset only
        + struct.pack(">I", 2)        # two samples, all defaults
        + struct.pack(">i", 0),       # patched below
    )
    traf = _box(b"traf", tfhd + tfdt + trun)
    moof = _box(b"moof", mfhd + traf)
    # patch trun data_offset = len(moof) + 8 (into mdat payload)
    moof = bytearray(moof)
    off = moof.find(b"trun") + 4 + 8
    struct.pack_into(">i", moof, off, len(moof) + 8)
    seg = bytes(moof) + _box(b"mdat", payload)
    meta, samples = demux_fmp4(init, [seg])
    assert samples == [(3000, b"P" * 40), (3000, b"Q" * 40)]
    assert meta["duration"] == 6000


def test_continuity_contracts():
    segs = [[(3000, b"A" * 20)], [(3000, b"B" * 20)]]
    init, media = build_fmp4_mjpeg(segs, 16, 16)
    # segment order swapped -> sequence gap
    with pytest.raises(ValueError, match="sequence"):
        demux_fmp4(init, [media[1], media[0]])
    # dropping segment 1 -> gap
    with pytest.raises(ValueError, match="sequence"):
        demux_fmp4(init, [media[1]])
    # corrupt tfdt of segment 2 -> decode-time discontinuity
    bad = bytearray(media[1])
    at = bad.find(b"tfdt") + 4 + 4
    struct.pack_into(">Q", bad, at, 999)
    with pytest.raises(ValueError, match="discontinuity"):
        demux_fmp4(init, [media[0], bytes(bad)])


def test_real_mjpeg_decode_through_fragments():
    from articulation_vector_db_api_spark.functions.jpeg import (
        decode_jpeg,
        encode_jpeg_baseline,
    )

    yy, xx = np.mgrid[0:16, 0:16]
    frames = [
        np.stack(
            [((xx * 9 + yy * 5 + t * 60) % 256).astype(np.uint8)] * 3,
            axis=-1,
        )
        for t in range(4)
    ]
    jp = [encode_jpeg_baseline(f, quality=90) for f in frames]
    init, media = build_fmp4_mjpeg(
        [[(3000, jp[0]), (3000, jp[1])], [(3000, jp[2]), (3000, jp[3])]],
        16, 16,
    )
    meta, samples = demux_fmp4(init, media)
    assert [s for _d, s in samples] == jp
    for (_d, s), f in zip(samples, frames):
        g = decode_jpeg(s)
        a, b = f.astype(np.float64), g.astype(np.float64)
        snr = 10 * np.log10((a**2).sum() / max(((a - b) ** 2).sum(), 1e-9))
        assert snr > 20


def test_gates_and_fuzz():
    import random

    with pytest.raises(NotImplementedError, match="codec"):
        build_fmp4_mjpeg([[(1, b"x")]], 16, 16, codec="avc1")
    with pytest.raises(ValueError, match="at least one"):
        build_fmp4_mjpeg([[]], 16, 16)
    init, media = build_fmp4_mjpeg(
        [[(3000, bytes(range(200)))], [(3000, bytes(200))]], 16, 16
    )
    rng = random.Random(5)
    blob = media[0]
    for _ in range(250):
        bad = bytearray(blob)
        i = rng.randrange(len(bad))
        bad[i] ^= 1 << rng.randrange(8)
        try:
            meta, samples = demux_fmp4(init, [bytes(bad), media[1]])
        except (ValueError, NotImplementedError):
            continue
        assert all(len(s) <= len(bad) for _d, s in samples)


def test_trun_version1_with_cts_offsets():
    """trun version 1 rows carrying signed composition-time offsets
    parse correctly (cts is skipped for sample extraction but must
    not desync the row walk)."""
    from articulation_vector_db_api_spark.functions.fmp4 import (
        _box,
        _full,
    )

    init, _ = build_fmp4_mjpeg([[(1, b"x")]], 16, 16)
    payload = b"R" * 30 + b"S" * 50
    mfhd = _full(b"mfhd", 0, struct.pack(">I", 1))
    tfhd = _box(
        b"tfhd", struct.pack(">I", 0x20000) + struct.pack(">I", 1)
    )
    tfdt = _box(b"tfdt", struct.pack(">I", 0) + struct.pack(">I", 0))
    rows = (
        struct.pack(">IIi", 3000, 30, -900)
        + struct.pack(">IIi", 3000, 50, 900)
    )
    trun = _box(
        b"trun",
        struct.pack(">I", (1 << 24) | 0x01 | 0x100 | 0x200 | 0x800)
        + struct.pack(">I", 2)
        + struct.pack(">i", 0)
        + rows,
    )
    traf = _box(b"traf", tfhd + tfdt + trun)
    moof = bytearray(_box(b"moof", mfhd + traf))
    off = moof.find(b"trun") + 4 + 8
    struct.pack_into(">i", moof, off, len(moof) + 8)
    seg = bytes(moof) + _box(b"mdat", payload)
    _meta, samples = demux_fmp4(init, [seg])
    assert samples == [(3000, b"R" * 30), (3000, b"S" * 50)]


def test_trun_count_validated_before_row_walk():
    """ADVICE r13 (fmp4.py:274): a malformed trun sample count must
    raise ValueError BEFORE the row loop — not iterate until
    struct.unpack_from runs off the segment (struct.error escapes the
    module contract, and a 2^32 count burns memory first)."""
    init, media = build_fmp4_mjpeg([[(3000, bytes(range(64)))]], 16, 16)
    seg = bytearray(media[0])
    off = seg.find(b"trun") + 4  # version+flags word
    count_off = off + 4
    orig = struct.unpack_from(">I", seg, count_off)[0]

    for bad_count in (orig + 1, 0xFFFFFFFF):
        mutated = bytearray(seg)
        struct.pack_into(">I", mutated, count_off, bad_count)
        with pytest.raises(ValueError, match="trun sample count"):
            demux_fmp4(init, [bytes(mutated)])


def test_trun_count_bound_with_no_per_sample_fields():
    """With zero per-sample fields the rows consume no trun bytes, so
    the count must still be bounded (by the segment size) instead of
    building an arbitrarily large rows list."""
    from articulation_vector_db_api_spark.functions.fmp4 import (
        _box,
        _full,
    )

    init, _ = build_fmp4_mjpeg([[(1, b"x")]], 16, 16)
    mfhd = _full(b"mfhd", 0, struct.pack(">I", 1))
    # tfhd carries default duration+size so trun rows need no fields.
    tfhd = _box(
        b"tfhd",
        struct.pack(">I", 0x20000 | 0x08 | 0x10)
        + struct.pack(">I", 1)
        + struct.pack(">I", 3000)
        + struct.pack(">I", 4),
    )
    tfdt = _box(b"tfdt", struct.pack(">I", 0) + struct.pack(">I", 0))
    trun = _box(
        b"trun",
        struct.pack(">I", 0x01)
        + struct.pack(">I", 0x7FFFFFFF)  # absurd count, zero row bytes
        + struct.pack(">i", 0),
    )
    traf = _box(b"traf", tfhd + tfdt + trun)
    moof = bytearray(_box(b"moof", mfhd + traf))
    off = moof.find(b"trun") + 4 + 8
    struct.pack_into(">i", moof, off, len(moof) + 8)
    seg = bytes(moof) + _box(b"mdat", b"abcd")
    with pytest.raises(ValueError, match="trun sample count"):
        demux_fmp4(init, [seg])


def test_trailing_moof_without_mdat_raises():
    """r14 self-review F3: a trailing moof with no mdat used to be
    silently dropped — its samples lost without an error."""
    init, media = build_fmp4_mjpeg(
        [[(3000, bytes(range(64)))], [(3000, bytes(64))]], 16, 16
    )
    # strip the mdat (last box) off segment 2
    seg2 = media[1]
    mdat_at = seg2.rfind(b"mdat") - 4
    truncated = seg2[:mdat_at]
    with pytest.raises(ValueError, match="moof without its mdat"):
        demux_fmp4(init, [media[0], truncated])


def test_negative_data_offset_raises():
    """r14 self-review F4: a negative trun data_offset must raise,
    not slice from the segment END via Python negative indexing."""
    init, media = build_fmp4_mjpeg([[(3000, bytes(range(64)))]], 16, 16)
    seg = bytearray(media[0])
    off = seg.find(b"trun") + 4 + 8  # version/flags + count
    struct.pack_into(">i", seg, off, -1000)
    with pytest.raises(ValueError, match="offset before segment"):
        demux_fmp4(init, [bytes(seg)])


def test_truncated_tfdt_raises_valueerror():
    """r14 self-review F5: a truncated tfdt/mfhd box must surface as
    ValueError (the module contract), not struct.error."""
    from articulation_vector_db_api_spark.functions.fmp4 import (
        _box,
        _full,
    )

    init, _ = build_fmp4_mjpeg([[(1, b"x")]], 16, 16)
    mfhd = _full(b"mfhd", 0, struct.pack(">I", 1))
    tfhd = _box(
        b"tfhd", struct.pack(">I", 0x20000) + struct.pack(">I", 1)
    )
    # version-1 tfdt declaring only 2 payload bytes
    bad_tfdt = _box(b"tfdt", struct.pack(">I", 1 << 24) + b"\x00\x00")
    traf = _box(b"traf", tfhd + bad_tfdt)
    seg = _box(b"moof", mfhd + traf) + _box(b"mdat", b"abcd")
    with pytest.raises(ValueError, match="truncated|beyond|without"):
        demux_fmp4(init, [seg])


def test_multiple_truns_per_fragment():
    """r14 second self-review pass: real packagers emit MULTIPLE trun
    boxes per traf (per-GOP runs) — trun 1's samples must be read at
    trun 1's offset, and an offset-less later run continues where the
    previous one ended (§8.8.8). The old single-offset field read
    every row at the LAST trun's position."""
    from articulation_vector_db_api_spark.functions.fmp4 import (
        _box,
        _full,
    )

    init, _ = build_fmp4_mjpeg([[(1, b"x")]], 16, 16)
    payload = b"A" * 10 + b"B" * 20 + b"C" * 30
    mfhd = _full(b"mfhd", 0, struct.pack(">I", 1))
    tfhd = _box(
        b"tfhd", struct.pack(">I", 0x20000) + struct.pack(">I", 1)
    )
    tfdt = _box(b"tfdt", struct.pack(">I", 0) + struct.pack(">I", 0))
    trun1 = _box(
        b"trun",
        struct.pack(">I", 0x01 | 0x100 | 0x200)
        + struct.pack(">I", 1)
        + struct.pack(">i", 0)  # patched below
        + struct.pack(">II", 3000, 10),
    )
    # second trun: NO data_offset — continues after trun 1's run
    trun2 = _box(
        b"trun",
        struct.pack(">I", 0x100 | 0x200)
        + struct.pack(">I", 2)
        + struct.pack(">II", 3000, 20)
        + struct.pack(">II", 3000, 30),
    )
    traf = _box(b"traf", tfhd + tfdt + trun1 + trun2)
    moof = bytearray(_box(b"moof", mfhd + traf))
    off = moof.find(b"trun") + 4 + 8
    struct.pack_into(">i", moof, off, len(moof) + 8)
    seg = bytes(moof) + _box(b"mdat", payload)
    _meta, samples = demux_fmp4(init, [seg])
    assert samples == [
        (3000, b"A" * 10), (3000, b"B" * 20), (3000, b"C" * 30),
    ]
