"""AES-128 (functions/aes.py): FIPS-197 appendix vectors, NIST SP
800-38A CBC vectors, CBC+PKCS7 roundtrips, and the error contract.
The tables are generated from GF(2^8) math at import — these vectors
are the proof the generation is right."""

from __future__ import annotations

import pytest

from articulation_vector_db_api_spark.functions.aes import (
    aes128_cbc_decrypt,
    aes128_cbc_encrypt,
    aes128_decrypt_block,
    aes128_encrypt_block,
)


def test_fips197_appendix_c1():
    key = bytes.fromhex("000102030405060708090a0b0c0d0e0f")
    pt = bytes.fromhex("00112233445566778899aabbccddeeff")
    ct = aes128_encrypt_block(pt, key)
    assert ct.hex() == "69c4e0d86a7b0430d8cdb78070b4c55a"
    assert aes128_decrypt_block(ct, key) == pt


def test_fips197_appendix_b():
    key = bytes.fromhex("2b7e151628aed2a6abf7158809cf4f3c")
    pt = bytes.fromhex("3243f6a8885a308d313198a2e0370734")
    assert aes128_encrypt_block(pt, key).hex() == (
        "3925841d02dc09fbdc118597196a0b32"
    )


def test_sp800_38a_f21_cbc_chain():
    """NIST SP 800-38A F.2.1: 4-block CBC-AES128 encryption."""
    key = bytes.fromhex("2b7e151628aed2a6abf7158809cf4f3c")
    iv = bytes.fromhex("000102030405060708090a0b0c0d0e0f")
    pt = bytes.fromhex(
        "6bc1bee22e409f96e93d7e117393172a"
        "ae2d8a571e03ac9c9eb76fac45af8e51"
        "30c81c46a35ce411e5fbc1191a0a52ef"
        "f69f2445df4f9b17ad2b417be66c3710"
    )
    expect = (
        "7649abac8119b246cee98e9b12e9197d"
        "5086cb9b507219ee95db113a917678b2"
        "73bed6b8e3c1743b7116e69e22229516"
        "3ff1caa1681fac09120eca307586e1a7"
    )
    ct = aes128_cbc_encrypt(pt, key, iv)
    # our CBC appends a full PKCS7 pad block for block-aligned input
    assert ct[:64].hex() == expect
    assert len(ct) == 80
    assert aes128_cbc_decrypt(ct, key, iv) == pt


def test_cbc_roundtrip_all_tail_lengths():
    key = bytes.fromhex("8899aabbccddeeff0011223344556677")
    iv = bytes(range(16))
    for n in (0, 1, 15, 16, 17, 31, 32, 1000):
        data = bytes((i * 7 + 3) % 256 for i in range(n))
        enc = aes128_cbc_encrypt(data, key, iv)
        assert len(enc) % 16 == 0 and len(enc) == (n // 16 + 1) * 16
        assert aes128_cbc_decrypt(enc, key, iv) == data


def test_error_contract():
    key, iv = bytes(16), bytes(16)
    with pytest.raises(ValueError, match="16 bytes"):
        aes128_encrypt_block(bytes(15), key)
    with pytest.raises(ValueError, match="key"):
        aes128_cbc_encrypt(b"x", bytes(15), iv)
    with pytest.raises(ValueError, match="IV"):
        aes128_cbc_encrypt(b"x", key, bytes(15))
    with pytest.raises(ValueError, match="block multiple"):
        aes128_cbc_decrypt(bytes(17), key, iv)
    with pytest.raises(ValueError, match="block multiple"):
        aes128_cbc_decrypt(b"", key, iv)
    # wrong key -> padding validation failure, named
    good = aes128_cbc_encrypt(b"payload", key, iv)
    with pytest.raises(ValueError, match="padding"):
        aes128_cbc_decrypt(good, bytes.fromhex("11" * 16), iv)


def test_int_and_numpy_ciphers_agree():
    """The serial T-table encryptor (CBC path) and the vectorized
    numpy cipher (block API / decrypt path) must be the same cipher."""
    import random

    import numpy as np

    from articulation_vector_db_api_spark.functions.aes import (
        _encrypt_block_words,
        _encrypt_blocks,
        _encrypt_word_keys,
        _key_schedule,
    )

    rng = random.Random(14)
    for _ in range(50):
        key = bytes(rng.randrange(256) for _ in range(16))
        blk = bytes(rng.randrange(256) for _ in range(16))
        rk = _key_schedule(key)
        via_np = _encrypt_blocks(
            np.frombuffer(blk, dtype=np.uint8).reshape(1, 16), rk
        ).tobytes()
        wk = _encrypt_word_keys(rk)
        words = _encrypt_block_words(
            *(int.from_bytes(blk[i : i + 4], "big") for i in (0, 4, 8, 12)),
            wk,
        )
        via_int = b"".join(w.to_bytes(4, "big") for w in words)
        assert via_int == via_np
