"""Ciphers for the PDF standard security handler (kernels/pdf.py).

Pure stdlib+NumPy implementations from the public specifications — the
sandbox has no ``cryptography``/``pycryptodome``:

- ``rc4(key, data)``: the symmetric RC4 stream cipher (PDF algorithms
  2/3/4/5 and /V 1-2 stream encryption).
- ``aes128_cbc_decrypt`` / ``aes128_cbc_encrypt``: AES-128 (FIPS-197)
  in CBC mode as used by /CFM /AESV2 — 16-byte IV prefix, PKCS#7
  padding. The block transforms are vectorized across ALL blocks with
  NumPy table lookups (S-box, GF(2^8) multiply tables), so decrypting a
  document's streams is array work, not per-byte Python.

These are interoperability codecs for reading/writing encrypted PDF
fixtures, not a general-purpose crypto library.
"""

from __future__ import annotations

import numpy as np

# ---------------------------------------------------------------------------
# RC4
# ---------------------------------------------------------------------------


def rc4(key: bytes, data: bytes) -> bytes:
    """RC4 (symmetric: encrypt == decrypt)."""
    s = list(range(256))
    j = 0
    klen = len(key)
    for i in range(256):
        j = (j + s[i] + key[i % klen]) & 0xFF
        s[i], s[j] = s[j], s[i]
    out = bytearray(len(data))
    i = j = 0
    for n, ch in enumerate(data):
        i = (i + 1) & 0xFF
        j = (j + s[i]) & 0xFF
        s[i], s[j] = s[j], s[i]
        out[n] = ch ^ s[(s[i] + s[j]) & 0xFF]
    return bytes(out)


# ---------------------------------------------------------------------------
# AES-128 (FIPS-197), vectorized across blocks
# ---------------------------------------------------------------------------

_SBOX = np.array(
    [
        0x63, 0x7C, 0x77, 0x7B, 0xF2, 0x6B, 0x6F, 0xC5, 0x30, 0x01, 0x67, 0x2B,
        0xFE, 0xD7, 0xAB, 0x76, 0xCA, 0x82, 0xC9, 0x7D, 0xFA, 0x59, 0x47, 0xF0,
        0xAD, 0xD4, 0xA2, 0xAF, 0x9C, 0xA4, 0x72, 0xC0, 0xB7, 0xFD, 0x93, 0x26,
        0x36, 0x3F, 0xF7, 0xCC, 0x34, 0xA5, 0xE5, 0xF1, 0x71, 0xD8, 0x31, 0x15,
        0x04, 0xC7, 0x23, 0xC3, 0x18, 0x96, 0x05, 0x9A, 0x07, 0x12, 0x80, 0xE2,
        0xEB, 0x27, 0xB2, 0x75, 0x09, 0x83, 0x2C, 0x1A, 0x1B, 0x6E, 0x5A, 0xA0,
        0x52, 0x3B, 0xD6, 0xB3, 0x29, 0xE3, 0x2F, 0x84, 0x53, 0xD1, 0x00, 0xED,
        0x20, 0xFC, 0xB1, 0x5B, 0x6A, 0xCB, 0xBE, 0x39, 0x4A, 0x4C, 0x58, 0xCF,
        0xD0, 0xEF, 0xAA, 0xFB, 0x43, 0x4D, 0x33, 0x85, 0x45, 0xF9, 0x02, 0x7F,
        0x50, 0x3C, 0x9F, 0xA8, 0x51, 0xA3, 0x40, 0x8F, 0x92, 0x9D, 0x38, 0xF5,
        0xBC, 0xB6, 0xDA, 0x21, 0x10, 0xFF, 0xF3, 0xD2, 0xCD, 0x0C, 0x13, 0xEC,
        0x5F, 0x97, 0x44, 0x17, 0xC4, 0xA7, 0x7E, 0x3D, 0x64, 0x5D, 0x19, 0x73,
        0x60, 0x81, 0x4F, 0xDC, 0x22, 0x2A, 0x90, 0x88, 0x46, 0xEE, 0xB8, 0x14,
        0xDE, 0x5E, 0x0B, 0xDB, 0xE0, 0x32, 0x3A, 0x0A, 0x49, 0x06, 0x24, 0x5C,
        0xC2, 0xD3, 0xAC, 0x62, 0x91, 0x95, 0xE4, 0x79, 0xE7, 0xC8, 0x37, 0x6D,
        0x8D, 0xD5, 0x4E, 0xA9, 0x6C, 0x56, 0xF4, 0xEA, 0x65, 0x7A, 0xAE, 0x08,
        0xBA, 0x78, 0x25, 0x2E, 0x1C, 0xA6, 0xB4, 0xC6, 0xE8, 0xDD, 0x74, 0x1F,
        0x4B, 0xBD, 0x8B, 0x8A, 0x70, 0x3E, 0xB5, 0x66, 0x48, 0x03, 0xF6, 0x0E,
        0x61, 0x35, 0x57, 0xB9, 0x86, 0xC1, 0x1D, 0x9E, 0xE1, 0xF8, 0x98, 0x11,
        0x69, 0xD9, 0x8E, 0x94, 0x9B, 0x1E, 0x87, 0xE9, 0xCE, 0x55, 0x28, 0xDF,
        0x8C, 0xA1, 0x89, 0x0D, 0xBF, 0xE6, 0x42, 0x68, 0x41, 0x99, 0x2D, 0x0F,
        0xB0, 0x54, 0xBB, 0x16,
    ],
    dtype=np.uint8,
)
_INV_SBOX = np.zeros(256, dtype=np.uint8)
_INV_SBOX[_SBOX] = np.arange(256, dtype=np.uint8)

_RCON = [0x01, 0x02, 0x04, 0x08, 0x10, 0x20, 0x40, 0x80, 0x1B, 0x36]


def _gf_mul_table(c: int) -> np.ndarray:
    """GF(2^8) multiply-by-constant lookup table (AES polynomial)."""
    out = np.zeros(256, dtype=np.uint8)
    for x in range(256):
        a, b, acc = x, c, 0
        while b:
            if b & 1:
                acc ^= a
            hi = a & 0x80
            a = (a << 1) & 0xFF
            if hi:
                a ^= 0x1B
            b >>= 1
        out[x] = acc
    return out


_M2, _M3 = _gf_mul_table(2), _gf_mul_table(3)
_M9, _M11, _M13, _M14 = (_gf_mul_table(c) for c in (9, 11, 13, 14))

#: state layout: 16 bytes in FIPS-197 column-major order —
#: state[4*c + r] = byte r of column c. ShiftRows moves row r left by r.
_SHIFT = np.array([4 * ((c + r) % 4) + r for c in range(4) for r in range(4)])
_INV_SHIFT = np.zeros(16, dtype=np.int64)
_INV_SHIFT[_SHIFT] = np.arange(16)


def _expand_key(key: bytes) -> np.ndarray:
    """128-bit key schedule → (11, 16) round keys, column-major bytes."""
    w = [list(key[i : i + 4]) for i in range(0, 16, 4)]
    for i in range(4, 44):
        t = list(w[i - 1])
        if i % 4 == 0:
            t = t[1:] + t[:1]
            t = [int(_SBOX[b]) for b in t]
            t[0] ^= _RCON[i // 4 - 1]
        w.append([a ^ b for a, b in zip(w[i - 4], t)])
    rk = np.array(w, dtype=np.uint8).reshape(11, 16)
    return rk


def _aes_encrypt_blocks(blocks: np.ndarray, rk: np.ndarray) -> np.ndarray:
    """Forward cipher over an (n, 16) uint8 array (column-major state)."""
    s = blocks ^ rk[0]
    for rnd in range(1, 11):
        s = _SBOX[s][:, _SHIFT]
        if rnd < 10:
            a = s.reshape(-1, 4, 4)  # [block, column, row]
            b0, b1, b2, b3 = a[:, :, 0], a[:, :, 1], a[:, :, 2], a[:, :, 3]
            m = np.empty_like(a)
            m[:, :, 0] = _M2[b0] ^ _M3[b1] ^ b2 ^ b3
            m[:, :, 1] = b0 ^ _M2[b1] ^ _M3[b2] ^ b3
            m[:, :, 2] = b0 ^ b1 ^ _M2[b2] ^ _M3[b3]
            m[:, :, 3] = _M3[b0] ^ b1 ^ b2 ^ _M2[b3]
            s = m.reshape(-1, 16)
        s = s ^ rk[rnd]
    return s


def _aes_decrypt_blocks(blocks: np.ndarray, rk: np.ndarray) -> np.ndarray:
    """Inverse cipher over an (n, 16) uint8 array (column-major state)."""
    s = blocks ^ rk[10]
    for rnd in range(9, -1, -1):
        s = _INV_SBOX[s[:, _INV_SHIFT]]
        s = s ^ rk[rnd]
        if rnd > 0:
            a = s.reshape(-1, 4, 4)
            b0, b1, b2, b3 = a[:, :, 0], a[:, :, 1], a[:, :, 2], a[:, :, 3]
            m = np.empty_like(a)
            m[:, :, 0] = _M14[b0] ^ _M11[b1] ^ _M13[b2] ^ _M9[b3]
            m[:, :, 1] = _M9[b0] ^ _M14[b1] ^ _M11[b2] ^ _M13[b3]
            m[:, :, 2] = _M13[b0] ^ _M9[b1] ^ _M14[b2] ^ _M11[b3]
            m[:, :, 3] = _M11[b0] ^ _M13[b1] ^ _M9[b2] ^ _M14[b3]
            s = m.reshape(-1, 16)
    return s


def aes128_cbc_encrypt(key: bytes, iv: bytes, plaintext: bytes) -> bytes:
    """AES-128-CBC with PKCS#7 padding; returns iv-less ciphertext."""
    if len(key) != 16 or len(iv) != 16:
        raise ValueError("AES-128-CBC needs 16-byte key and IV")
    pad = 16 - (len(plaintext) % 16)
    data = plaintext + bytes([pad]) * pad
    rk = _expand_key(key)
    blocks = np.frombuffer(data, dtype=np.uint8).reshape(-1, 16).copy()
    # CBC chains: sequential over blocks (xor prev ct), cipher per block
    prev = np.frombuffer(iv, dtype=np.uint8)
    out = np.empty_like(blocks)
    for i in range(blocks.shape[0]):
        ct = _aes_encrypt_blocks((blocks[i] ^ prev)[None, :], rk)[0]
        out[i] = ct
        prev = ct
    return out.tobytes()


def aes128_cbc_decrypt(key: bytes, iv: bytes, ciphertext: bytes) -> bytes:
    """AES-128-CBC decrypt + PKCS#7 unpad. The block decrypts run as ONE
    vectorized pass (no chaining dependency on the decrypt side)."""
    if len(key) != 16 or len(iv) != 16:
        raise ValueError("AES-128-CBC needs 16-byte key and IV")
    if len(ciphertext) % 16 or not ciphertext:
        raise ValueError("AES-CBC ciphertext not block-aligned")
    ct = np.frombuffer(ciphertext, dtype=np.uint8).reshape(-1, 16)
    rk = _expand_key(key)
    pt = _aes_decrypt_blocks(ct, rk)
    chain = np.vstack([np.frombuffer(iv, dtype=np.uint8)[None, :], ct[:-1]])
    pt = pt ^ chain
    data = pt.tobytes()
    pad = data[-1]
    if not 1 <= pad <= 16:
        raise ValueError("AES-CBC bad padding")
    return data[:-pad]
