"""WARC (ISO 28500 / WARC/1.0) reader + writer — stdlib only.

WARC is how web-scraped training corpora actually arrive (Common
Crawl ships `.warc.gz`), so it is the FIRST format a 100 TB text
pipeline ingests. The layout implemented here is Common Crawl's own:
every record is its own gzip MEMBER, and a sidecar offset index (the
role CDX files play at CC) lets a reader split the archive at member
boundaries — which is exactly how `warc_pyds.py` plans one Spark
InputPartition per record without decompressing anything on the
driver.

Record grammar (ISO 28500 §4): a `WARC/1.0` version line, CRLF header
lines until a blank line, `Content-Length` octets of block, then two
CRLFs. Only the headers this pipeline needs are materialized
(WARC-Type, WARC-Target-URI, WARC-Record-ID); unknown headers are
preserved-but-ignored, per the spec's extensibility rule.
"""

from __future__ import annotations

import gzip
import io
import zlib


def write_warc(
    path: str,
    records: list[tuple[str, str, bytes]],
    per_record_gzip: bool = True,
) -> None:
    """Write (rec_type, target_uri, payload) records as `path` plus a
    sidecar `path + ".idx"` listing one `offset length` line per
    record — the member index a splitting reader plans from."""
    offsets: list[tuple[int, int]] = []
    with open(path, "wb") as f:
        for i, (rec_type, uri, payload) in enumerate(records):
            head = (
                "WARC/1.0\r\n"
                f"WARC-Type: {rec_type}\r\n"
                f"WARC-Record-ID: <urn:uuid:{i:032x}>\r\n"
                f"WARC-Target-URI: {uri}\r\n"
                f"Content-Length: {len(payload)}\r\n"
                "\r\n"
            ).encode("utf-8")
            record = head + payload + b"\r\n\r\n"
            if per_record_gzip:
                # mtime=0 keeps the member bytes deterministic
                buf = io.BytesIO()
                with gzip.GzipFile(fileobj=buf, mode="wb", mtime=0) as gz:
                    gz.write(record)
                record = buf.getvalue()
            offsets.append((f.tell(), len(record)))
            f.write(record)
    with open(path + ".idx", "w", encoding="ascii") as idx:
        for off, length in offsets:
            idx.write(f"{off} {length}\n")


def read_index(path: str) -> list[tuple[int, int]]:
    """The sidecar member index: [(offset, length), ...]."""
    out = []
    with open(path + ".idx", encoding="ascii") as idx:
        for line in idx:
            off, length = line.split()
            out.append((int(off), int(length)))
    return out


def _parse_record(record: bytes) -> dict:
    nl = record.find(b"\r\n")
    if nl < 0 or not record[:nl].startswith(b"WARC/"):
        raise ValueError("missing WARC version line")
    version = record[5:nl].decode("ascii")
    if version not in ("1.0", "1.1"):
        raise ValueError(f"unsupported WARC version {version}")
    head_end = record.find(b"\r\n\r\n", nl)
    if head_end < 0:
        raise ValueError("unterminated WARC header block")
    headers: dict[str, str] = {}
    # ISO 28500 §4 permits folded named fields: a line starting with
    # SP/HT continues the previous header value — join before splitting
    lines: list[bytes] = []
    for raw_line in record[nl + 2 : head_end].split(b"\r\n"):
        if raw_line[:1] in (b" ", b"\t"):
            if not lines:
                raise ValueError("WARC continuation line before any header")
            lines[-1] += b" " + raw_line.strip()
        else:
            lines.append(raw_line)
    for line in lines:
        k, _, v = line.partition(b":")
        if not _:
            raise ValueError(f"malformed WARC header line {line!r}")
        headers[k.strip().decode("ascii").lower()] = v.strip().decode(
            "utf-8"
        )
    try:
        length = int(headers["content-length"])
    except (KeyError, ValueError) as exc:
        raise ValueError("missing/bad WARC Content-Length") from exc
    body = record[head_end + 4 : head_end + 4 + length]
    if len(body) != length:
        raise ValueError("truncated WARC record block")
    if record[head_end + 4 + length : head_end + 4 + length + 4] != b"\r\n\r\n":
        raise ValueError("missing WARC record terminator")
    return {
        "rec_type": headers.get("warc-type", ""),
        "uri": headers.get("warc-target-uri", ""),
        "payload": body,
    }


def read_member(path: str, offset: int, length: int) -> dict:
    """Read ONE record: seek to its member, inflate exactly one gzip
    member (wbits=31 so trailing members are never consumed), parse."""
    with open(path, "rb") as f:
        f.seek(offset)
        raw = f.read(length)
    return _parse_record(_inflate_member(raw))


def _inflate_member(raw: bytes) -> bytes:
    if raw[:2] != b"\x1f\x8b":
        return raw
    d = zlib.decompressobj(wbits=31)
    try:
        record = d.decompress(raw)
    except zlib.error as exc:
        # corrupt member bytes are a malformed archive, not a crash
        raise ValueError(f"corrupt WARC gzip member: {exc}") from exc
    if not d.eof:
        raise ValueError("gzip member extends past its index entry")
    return record


def read_members_range(path: str, start: int, end: int, n_records: int):
    """Stream every record whose member lies in [start, end) — the
    per-partition read: one seek, sequential inflate-and-parse. The
    caller's index guarantees members are contiguous in the range."""
    with open(path, "rb") as f:
        f.seek(start)
        raw = f.read(end - start)
    pos = 0
    for _ in range(n_records):
        if raw[pos : pos + 2] == b"\x1f\x8b":
            d = zlib.decompressobj(wbits=31)
            try:
                record = d.decompress(raw[pos:])
            except zlib.error as exc:
                raise ValueError(
                    f"corrupt WARC gzip member: {exc}"
                ) from exc
            consumed = (end - start - pos) - len(d.unused_data)
        else:
            # uncompressed member: header length + block + terminator
            head_end = raw.find(b"\r\n\r\n", pos)
            if head_end < 0:
                raise ValueError("unterminated WARC header block")
            rec = _parse_record(raw[pos:])
            yield rec
            pos += (head_end + 4 - pos) + len(rec["payload"]) + 4
            continue
        yield _parse_record(record)
        pos += consumed
    if pos != end - start:
        raise ValueError("WARC range did not consume exactly its members")
