"""AES-128 from the FIPS-197 spec, plus CBC mode with PKCS#7 padding
— the exact cipher suite HLS segment encryption uses (RFC 8216
§4.3.2.4: METHOD=AES-128 is AES-128-CBC with PKCS7).

Everything here is derived from public mathematics: the S-box is
GENERATED at import (multiplicative inverse in GF(2^8) mod the
Rijndael polynomial x^8+x^4+x^3+x+1, then the §5.1.1 affine
transform), round constants come from the xtime chain, and the
MixColumns constants are the §5.1.3/§5.3.3 matrices — no literal
tables are transcribed from anywhere.

Decryption is the hot path (a crawler decrypts far more than it
encrypts), so ``aes128_cbc_decrypt`` is numpy-vectorized ACROSS
blocks: CBC decryption parallelizes (P_i = D(C_i) xor C_{i-1}), so a
whole segment decrypts as (n_blocks, 16) uint8 table lookups — the
same Arrow-batch-friendly shape every other codec in this package
uses inside mapInPandas. Encryption (witness building only) is
serial per block, as CBC chaining requires.

Reference behavior parity: the reference (/root/reference/main.py)
has no media path; this backs the HLS #EXT-X-KEY support.
"""

from __future__ import annotations

import numpy as np

__all__ = [
    "aes128_cbc_decrypt",
    "aes128_cbc_encrypt",
    "aes128_decrypt_block",
    "aes128_encrypt_block",
]


def _build_tables() -> tuple[np.ndarray, np.ndarray, dict[int, np.ndarray]]:
    """Generate the S-box, its inverse, and GF(2^8) multiply tables
    for every constant MixColumns / InvMixColumns needs."""

    def gmul(a: int, b: int) -> int:
        r = 0
        while b:
            if b & 1:
                r ^= a
            a <<= 1
            if a & 0x100:
                a ^= 0x11B  # x^8+x^4+x^3+x+1
            b >>= 1
        return r

    # log/antilog over the generator 0x03 -> multiplicative inverses
    alog = [1] * 255
    for i in range(1, 255):
        alog[i] = gmul(alog[i - 1], 3)
    log = [0] * 256
    for i, v in enumerate(alog):
        log[v] = i

    def inv(x: int) -> int:
        return 0 if x == 0 else alog[(255 - log[x]) % 255]

    def affine(b: int) -> int:
        s = 0x63
        for k in range(5):  # b ^ rotl(b,1..4) ^ 0x63
            s ^= ((b << k) | (b >> (8 - k))) & 0xFF
        return s

    sbox = np.array([affine(inv(x)) for x in range(256)], dtype=np.uint8)
    inv_sbox = np.zeros(256, dtype=np.uint8)
    inv_sbox[sbox] = np.arange(256, dtype=np.uint8)
    mul = {
        c: np.array([gmul(c, x) for x in range(256)], dtype=np.uint8)
        for c in (2, 3, 9, 11, 13, 14)
    }
    return sbox, inv_sbox, mul


_SBOX, _INV_SBOX, _MUL = _build_tables()

# Encryption T-tables (classic 32-bit-word formulation): Te0[x] packs
# SubBytes+MixColumns for one input byte as the big-endian column
# word {02,01,01,03}*S[x]; Te1..3 are its byte rotations. CBC
# encryption is serially chained so it can't vectorize across blocks
# — plain-int table lookups are ~10x faster per block than (1, 16)
# numpy round ops. Decryption keeps the numpy across-blocks path.
_TE0 = [
    (int(_MUL[2][s]) << 24)
    | (int(s) << 16)
    | (int(s) << 8)
    | int(_MUL[3][s])
    for s in _SBOX
]
_TE1 = [((w >> 8) | ((w & 0xFF) << 24)) & 0xFFFFFFFF for w in _TE0]
_TE2 = [((w >> 8) | ((w & 0xFF) << 24)) & 0xFFFFFFFF for w in _TE1]
_TE3 = [((w >> 8) | ((w & 0xFF) << 24)) & 0xFFFFFFFF for w in _TE2]
_SBOX_I = [int(x) for x in _SBOX]

# ShiftRows as a flat-index permutation: FIPS-197 state is
# column-major (byte i lives at row i%4, column i//4) and row r
# rotates LEFT by r, so out[r + 4c] = in[r + 4*((c + r) % 4)].
_SHIFT = np.array(
    [(r + 4 * ((c + r) % 4)) % 16 for c in range(4) for r in range(4)],
    dtype=np.intp,
)
_INV_SHIFT = np.zeros(16, dtype=np.intp)
_INV_SHIFT[_SHIFT] = np.arange(16, dtype=np.intp)


def _key_schedule(key: bytes) -> np.ndarray:
    """128-bit key -> (11, 16) uint8 round keys (FIPS-197 §5.2)."""
    if len(key) != 16:
        raise ValueError("AES-128 key must be 16 bytes")
    words = [list(key[4 * i : 4 * i + 4]) for i in range(4)]
    rcon = 1
    for i in range(4, 44):
        t = list(words[i - 1])
        if i % 4 == 0:
            t = t[1:] + t[:1]  # RotWord
            t = [int(_SBOX[b]) for b in t]  # SubWord
            t[0] ^= rcon
            rcon = (rcon << 1) ^ (0x11B if rcon & 0x80 else 0)
            rcon &= 0xFF
        words.append([a ^ b for a, b in zip(words[i - 4], t)])
    flat = np.array(
        [b for w in words for b in w], dtype=np.uint8
    ).reshape(11, 16)
    return flat


def _mix_columns(s: np.ndarray) -> np.ndarray:
    """(n, 16) -> (n, 16), §5.1.3 matrix per column."""
    c = s.reshape(-1, 4, 4)  # [block, column, row]
    a0, a1, a2, a3 = c[:, :, 0], c[:, :, 1], c[:, :, 2], c[:, :, 3]
    m2, m3 = _MUL[2], _MUL[3]
    out = np.empty_like(c)
    out[:, :, 0] = m2[a0] ^ m3[a1] ^ a2 ^ a3
    out[:, :, 1] = a0 ^ m2[a1] ^ m3[a2] ^ a3
    out[:, :, 2] = a0 ^ a1 ^ m2[a2] ^ m3[a3]
    out[:, :, 3] = m3[a0] ^ a1 ^ a2 ^ m2[a3]
    return out.reshape(-1, 16)


def _inv_mix_columns(s: np.ndarray) -> np.ndarray:
    """(n, 16) -> (n, 16), §5.3.3 matrix per column."""
    c = s.reshape(-1, 4, 4)
    a0, a1, a2, a3 = c[:, :, 0], c[:, :, 1], c[:, :, 2], c[:, :, 3]
    m9, mb, md, me = _MUL[9], _MUL[11], _MUL[13], _MUL[14]
    out = np.empty_like(c)
    out[:, :, 0] = me[a0] ^ mb[a1] ^ md[a2] ^ m9[a3]
    out[:, :, 1] = m9[a0] ^ me[a1] ^ mb[a2] ^ md[a3]
    out[:, :, 2] = md[a0] ^ m9[a1] ^ me[a2] ^ mb[a3]
    out[:, :, 3] = mb[a0] ^ md[a1] ^ m9[a2] ^ me[a3]
    return out.reshape(-1, 16)


def _encrypt_blocks(s: np.ndarray, rk: np.ndarray) -> np.ndarray:
    """ECB over (n, 16) blocks (the CBC encryptor chains outside)."""
    s = s ^ rk[0]
    for rnd in range(1, 10):
        s = _SBOX[s][:, _SHIFT]
        s = _mix_columns(s) ^ rk[rnd]
    s = _SBOX[s][:, _SHIFT]
    return s ^ rk[10]


def _decrypt_blocks(s: np.ndarray, rk: np.ndarray) -> np.ndarray:
    """Inverse cipher (FIPS-197 §5.3) over (n, 16) blocks at once."""
    s = s ^ rk[10]
    for rnd in range(9, 0, -1):
        s = _INV_SBOX[s[:, _INV_SHIFT]]
        s = _inv_mix_columns(s ^ rk[rnd])
    s = _INV_SBOX[s[:, _INV_SHIFT]]
    return s ^ rk[0]


def aes128_encrypt_block(block: bytes, key: bytes) -> bytes:
    if len(block) != 16:
        raise ValueError("AES block must be 16 bytes")
    s = np.frombuffer(block, dtype=np.uint8).reshape(1, 16)
    return _encrypt_blocks(s, _key_schedule(key)).tobytes()


def aes128_decrypt_block(block: bytes, key: bytes) -> bytes:
    if len(block) != 16:
        raise ValueError("AES block must be 16 bytes")
    s = np.frombuffer(block, dtype=np.uint8).reshape(1, 16)
    return _decrypt_blocks(s, _key_schedule(key)).tobytes()


def _encrypt_word_keys(rk: np.ndarray) -> list[int]:
    """(11, 16) round-key bytes -> 44 big-endian column words."""
    return [
        int.from_bytes(rk[r, 4 * c : 4 * c + 4].tobytes(), "big")
        for r in range(11)
        for c in range(4)
    ]


def _encrypt_block_words(
    s0: int, s1: int, s2: int, s3: int, wk: list[int]
) -> tuple[int, int, int, int]:
    """One block as 4 column words through the T-table rounds."""
    s0 ^= wk[0]
    s1 ^= wk[1]
    s2 ^= wk[2]
    s3 ^= wk[3]
    te0, te1, te2, te3 = _TE0, _TE1, _TE2, _TE3
    for rnd in range(1, 10):
        k = 4 * rnd
        t0 = (
            te0[s0 >> 24] ^ te1[(s1 >> 16) & 0xFF]
            ^ te2[(s2 >> 8) & 0xFF] ^ te3[s3 & 0xFF] ^ wk[k]
        )
        t1 = (
            te0[s1 >> 24] ^ te1[(s2 >> 16) & 0xFF]
            ^ te2[(s3 >> 8) & 0xFF] ^ te3[s0 & 0xFF] ^ wk[k + 1]
        )
        t2 = (
            te0[s2 >> 24] ^ te1[(s3 >> 16) & 0xFF]
            ^ te2[(s0 >> 8) & 0xFF] ^ te3[s1 & 0xFF] ^ wk[k + 2]
        )
        t3 = (
            te0[s3 >> 24] ^ te1[(s0 >> 16) & 0xFF]
            ^ te2[(s1 >> 8) & 0xFF] ^ te3[s2 & 0xFF] ^ wk[k + 3]
        )
        s0, s1, s2, s3 = t0, t1, t2, t3
    sb = _SBOX_I
    o0 = (
        (sb[s0 >> 24] << 24) | (sb[(s1 >> 16) & 0xFF] << 16)
        | (sb[(s2 >> 8) & 0xFF] << 8) | sb[s3 & 0xFF]
    ) ^ wk[40]
    o1 = (
        (sb[s1 >> 24] << 24) | (sb[(s2 >> 16) & 0xFF] << 16)
        | (sb[(s3 >> 8) & 0xFF] << 8) | sb[s0 & 0xFF]
    ) ^ wk[41]
    o2 = (
        (sb[s2 >> 24] << 24) | (sb[(s3 >> 16) & 0xFF] << 16)
        | (sb[(s0 >> 8) & 0xFF] << 8) | sb[s1 & 0xFF]
    ) ^ wk[42]
    o3 = (
        (sb[s3 >> 24] << 24) | (sb[(s0 >> 16) & 0xFF] << 16)
        | (sb[(s1 >> 8) & 0xFF] << 8) | sb[s2 & 0xFF]
    ) ^ wk[43]
    return o0, o1, o2, o3


def aes128_cbc_encrypt(data: bytes, key: bytes, iv: bytes) -> bytes:
    """PKCS#7-pad then CBC-encrypt. Serial per block (CBC chains)."""
    if len(iv) != 16:
        raise ValueError("AES-CBC IV must be 16 bytes")
    wk = _encrypt_word_keys(_key_schedule(key))
    pad = 16 - len(data) % 16
    buf = bytes(data) + bytes([pad]) * pad
    p0 = int.from_bytes(iv[0:4], "big")
    p1 = int.from_bytes(iv[4:8], "big")
    p2 = int.from_bytes(iv[8:12], "big")
    p3 = int.from_bytes(iv[12:16], "big")
    out = bytearray(len(buf))
    for at in range(0, len(buf), 16):
        p0, p1, p2, p3 = _encrypt_block_words(
            p0 ^ int.from_bytes(buf[at : at + 4], "big"),
            p1 ^ int.from_bytes(buf[at + 4 : at + 8], "big"),
            p2 ^ int.from_bytes(buf[at + 8 : at + 12], "big"),
            p3 ^ int.from_bytes(buf[at + 12 : at + 16], "big"),
            wk,
        )
        out[at : at + 4] = p0.to_bytes(4, "big")
        out[at + 4 : at + 8] = p1.to_bytes(4, "big")
        out[at + 8 : at + 12] = p2.to_bytes(4, "big")
        out[at + 12 : at + 16] = p3.to_bytes(4, "big")
    return bytes(out)


def aes128_cbc_decrypt(data: bytes, key: bytes, iv: bytes) -> bytes:
    """CBC-decrypt then strip validated PKCS#7 padding. Vectorized
    across blocks: P_i = D(C_i) xor C_{i-1} has no chain dependency."""
    if len(iv) != 16:
        raise ValueError("AES-CBC IV must be 16 bytes")
    if not data or len(data) % 16:
        raise ValueError("AES-CBC ciphertext length not a block multiple")
    ct = np.frombuffer(bytes(data), dtype=np.uint8).reshape(-1, 16)
    pt = _decrypt_blocks(ct, _key_schedule(key))
    # xor the chain in place (pt and ct are distinct arrays) — no
    # vstack copy, so peak memory stays ~2x the segment, not 3x
    pt[1:] ^= ct[:-1]
    pt[0] ^= np.frombuffer(iv, dtype=np.uint8)
    pt = pt.tobytes()
    pad = pt[-1]
    if not 1 <= pad <= 16 or pt[-pad:] != bytes([pad]) * pad:
        raise ValueError("AES-CBC PKCS#7 padding invalid (wrong key/IV?)")
    return pt[:-pad]
