"""From-scratch primitives for the PDF standard security handler
(ISO 32000-1 §7.6): RC4, AES-128 (CBC with PKCS#7 padding), and the
handler's key-derivation / owner-user entry algorithms (Algorithms 2-5).
Only the EMPTY-user-password case is targeted by the reader — the
overwhelmingly common "encrypted but openable by anyone" PDF — but the
math below is the general form.

Public knowledge only: the PDF spec's algorithm numbers are cited inline;
AES follows FIPS-197; RC4 is the classic alleged-RC4 KSA/PRGA. The
reference has no encryption support at all (pypdfium2 handles it
internally), so this module widens coverage past it.
"""

from __future__ import annotations

import struct
from functools import lru_cache as _lru_cache
from hashlib import md5

# --------------------------------------------------------------------------
# RC4


def rc4(key: bytes, data: bytes) -> bytes:
    """Classic RC4 (KSA + PRGA). Symmetric: encrypt == decrypt."""
    S = list(range(256))
    j = 0
    klen = len(key)
    for i in range(256):
        j = (j + S[i] + key[i % klen]) & 0xFF
        S[i], S[j] = S[j], S[i]
    out = bytearray(len(data))
    i = j = 0
    for n, b in enumerate(data):
        i = (i + 1) & 0xFF
        j = (j + S[i]) & 0xFF
        S[i], S[j] = S[j], S[i]
        out[n] = b ^ S[(S[i] + S[j]) & 0xFF]
    return bytes(out)


# --------------------------------------------------------------------------
# AES-128 (FIPS-197)

_SBOX = bytearray(256)
_INV_SBOX = bytearray(256)


def _init_sbox() -> None:
    # generate the S-box from the finite-field inverse + affine transform
    # (writing out the table would be 256 magic numbers; deriving it is
    # self-checking)
    p = q = 1
    _SBOX[0] = 0x63
    while True:
        # p advances through GF(2^8) multiplying by 3
        p = p ^ ((p << 1) & 0xFF) ^ (0x1B if p & 0x80 else 0)
        # q advances through GF(2^8) dividing by 3
        q ^= (q << 1) & 0xFF
        q ^= (q << 2) & 0xFF
        q ^= (q << 4) & 0xFF
        if q & 0x80:
            q ^= 0x09
        x = (q ^ _rotl8(q, 1) ^ _rotl8(q, 2) ^ _rotl8(q, 3)
             ^ _rotl8(q, 4) ^ 0x63)
        _SBOX[p] = x
        if p == 1:
            break
    for i in range(256):
        _INV_SBOX[_SBOX[i]] = i


def _rotl8(x: int, n: int) -> int:
    return ((x << n) | (x >> (8 - n))) & 0xFF


_init_sbox()

_RCON = [0x01, 0x02, 0x04, 0x08, 0x10, 0x20, 0x40, 0x80, 0x1B, 0x36]
_ROUNDS = {16: 10, 32: 14}  # AES-128 / AES-256


def _xtime(a: int) -> int:
    return ((a << 1) ^ 0x1B) & 0xFF if a & 0x80 else (a << 1)


def _gmul(a: int, b: int) -> int:
    out = 0
    while b:
        if b & 1:
            out ^= a
        a = _xtime(a)
        b >>= 1
    return out


def _expand_key(key: bytes) -> list[bytes]:
    """128/256-bit key -> Nr+1 round keys of 16 bytes (FIPS-197 §5.2)."""
    nk = len(key) // 4
    nr = _ROUNDS[len(key)]
    w = [key[i : i + 4] for i in range(0, len(key), 4)]
    for i in range(nk, 4 * (nr + 1)):
        t = bytearray(w[i - 1])
        if i % nk == 0:
            t = t[1:] + t[:1]
            t = bytearray(_SBOX[b] for b in t)
            t[0] ^= _RCON[i // nk - 1]
        elif nk > 6 and i % nk == 4:
            t = bytearray(_SBOX[b] for b in t)
        w.append(bytes(a ^ b for a, b in zip(w[i - nk], t)))
    return [b"".join(w[i : i + 4]) for i in range(0, 4 * (nr + 1), 4)]


def _add_round_key(s: bytearray, rk: bytes) -> None:
    for i in range(16):
        s[i] ^= rk[i]


_SHIFT = [0, 5, 10, 15, 4, 9, 14, 3, 8, 13, 2, 7, 12, 1, 6, 11]
_INV_SHIFT = [0, 13, 10, 7, 4, 1, 14, 11, 8, 5, 2, 15, 12, 9, 6, 3]


def _encrypt_block(block: bytes, rks: list[bytes]) -> bytes:
    nr = len(rks) - 1
    s = bytearray(block)
    _add_round_key(s, rks[0])
    for rnd in range(1, nr + 1):
        # SubBytes + ShiftRows
        s = bytearray(_SBOX[s[_SHIFT[i]]] for i in range(16))
        if rnd < nr:
            # MixColumns
            t = bytearray(16)
            for c in range(4):
                a = s[4 * c : 4 * c + 4]
                t[4 * c + 0] = _gmul(a[0], 2) ^ _gmul(a[1], 3) ^ a[2] ^ a[3]
                t[4 * c + 1] = a[0] ^ _gmul(a[1], 2) ^ _gmul(a[2], 3) ^ a[3]
                t[4 * c + 2] = a[0] ^ a[1] ^ _gmul(a[2], 2) ^ _gmul(a[3], 3)
                t[4 * c + 3] = _gmul(a[0], 3) ^ a[1] ^ a[2] ^ _gmul(a[3], 2)
            s = t
        _add_round_key(s, rks[rnd])
    return bytes(s)


def _decrypt_block(block: bytes, rks: list[bytes]) -> bytes:
    nr = len(rks) - 1
    s = bytearray(block)
    _add_round_key(s, rks[nr])
    for rnd in range(nr - 1, -1, -1):
        # InvShiftRows + InvSubBytes
        s = bytearray(_INV_SBOX[s[_INV_SHIFT[i]]] for i in range(16))
        _add_round_key(s, rks[rnd])
        if rnd > 0:
            # InvMixColumns
            t = bytearray(16)
            for c in range(4):
                a = s[4 * c : 4 * c + 4]
                t[4 * c + 0] = (_gmul(a[0], 14) ^ _gmul(a[1], 11)
                                ^ _gmul(a[2], 13) ^ _gmul(a[3], 9))
                t[4 * c + 1] = (_gmul(a[0], 9) ^ _gmul(a[1], 14)
                                ^ _gmul(a[2], 11) ^ _gmul(a[3], 13))
                t[4 * c + 2] = (_gmul(a[0], 13) ^ _gmul(a[1], 9)
                                ^ _gmul(a[2], 14) ^ _gmul(a[3], 11))
                t[4 * c + 3] = (_gmul(a[0], 11) ^ _gmul(a[1], 13)
                                ^ _gmul(a[2], 9) ^ _gmul(a[3], 14))
            s = t
    return bytes(s)


def aes128_cbc_decrypt(key: bytes, data: bytes) -> bytes:
    """PDF AESV2 stream form: 16-byte IV prefix, CBC, PKCS#7 padding."""
    if len(data) < 32 or len(data) % 16:
        raise ValueError("AES-CBC data not a whole number of blocks")
    rks = _expand_key(key)
    iv, body = data[:16], data[16:]
    out = bytearray()
    prev = iv
    for i in range(0, len(body), 16):
        blk = body[i : i + 16]
        out += bytes(a ^ b for a, b in zip(_decrypt_block(blk, rks), prev))
        prev = blk
    pad = out[-1]
    if not 1 <= pad <= 16:
        raise ValueError("bad PKCS#7 padding")
    return bytes(out[:-pad])


def aes128_cbc_encrypt(key: bytes, data: bytes, iv: bytes) -> bytes:
    rks = _expand_key(key)
    pad = 16 - len(data) % 16
    data = data + bytes([pad]) * pad
    out = bytearray(iv)
    prev = iv
    for i in range(0, len(data), 16):
        blk = bytes(a ^ b for a, b in zip(data[i : i + 16], prev))
        prev = _encrypt_block(blk, rks)
        out += prev
    return bytes(out)


# the generalized key schedule makes these work for 16- OR 32-byte keys;
# the aes128_* names predate AES-256 support
aes_cbc_decrypt = aes128_cbc_decrypt
aes_cbc_encrypt = aes128_cbc_encrypt


def aes_cbc_encrypt_nopad(key: bytes, data: bytes,
                          iv: bytes = b"\x00" * 16) -> bytes:
    """Raw CBC, no padding, IV not prepended — the R6 /UE//OE and
    Algorithm 2.B shapes. `data` must be block-aligned."""
    rks = _expand_key(key)
    out = bytearray()
    prev = iv
    for i in range(0, len(data), 16):
        blk = bytes(a ^ b for a, b in zip(data[i : i + 16], prev))
        prev = _encrypt_block(blk, rks)
        out += prev
    return bytes(out)


def aes_cbc_decrypt_nopad(key: bytes, data: bytes,
                          iv: bytes = b"\x00" * 16) -> bytes:
    rks = _expand_key(key)
    out = bytearray()
    prev = iv
    for i in range(0, len(data), 16):
        blk = data[i : i + 16]
        out += bytes(a ^ b for a, b in zip(_decrypt_block(blk, rks), prev))
        prev = blk
    return bytes(out)


# --------------------------------------------------------------------------
# PDF standard security handler (ISO 32000-1 §7.6.3)

PAD = bytes([
    0x28, 0xBF, 0x4E, 0x5E, 0x4E, 0x75, 0x8A, 0x41,
    0x64, 0x00, 0x4E, 0x56, 0xFF, 0xFA, 0x01, 0x08,
    0x2E, 0x2E, 0x00, 0xB6, 0xD0, 0x68, 0x3E, 0x80,
    0x2F, 0x0C, 0xA9, 0xFE, 0x64, 0x53, 0x69, 0x7A,
])


def std_key(password: bytes, o_entry: bytes, p: int, id0: bytes,
            r: int, key_len: int) -> bytes:
    """Algorithm 2: the file encryption key from a (user) password."""
    h = md5()
    h.update((password + PAD)[:32])
    h.update(o_entry[:32])
    # '<I' of the low 32 bits: identical bytes to '<i' for negative /P
    # (two's complement), and real-world writers that serialize /P
    # UNSIGNED (e.g. 4294963392) no longer blow up struct.pack with a
    # foreign exception type (round-5 ADVICE)
    h.update(struct.pack("<I", p & 0xFFFFFFFF))
    h.update(id0)
    key = h.digest()
    if r >= 3:
        for _ in range(50):
            key = md5(key[:key_len]).digest()
    return key[:key_len]


def owner_entry(owner_pw: bytes, user_pw: bytes, r: int, key_len: int) -> bytes:
    """Algorithm 3: the /O entry."""
    key = md5((owner_pw + PAD)[:32]).digest()
    if r >= 3:
        for _ in range(50):
            key = md5(key).digest()
    key = key[:key_len]
    o = rc4(key, (user_pw + PAD)[:32])
    if r >= 3:
        for i in range(1, 20):
            o = rc4(bytes(b ^ i for b in key), o)
    return o


def user_entry(key: bytes, id0: bytes, r: int) -> bytes:
    """Algorithm 4 (R=2) / 5 (R>=3): the /U entry (32 bytes)."""
    if r == 2:
        return rc4(key, PAD)
    u = rc4(key, md5(PAD + id0).digest())
    for i in range(1, 20):
        u = rc4(bytes(b ^ i for b in key), u)
    return u + b"\x00" * 16


def check_user_password(password: bytes, o_entry: bytes, u_entry: bytes,
                        p: int, id0: bytes, r: int, key_len: int) -> bytes | None:
    """Algorithm 6: returns the file key when `password` is the user
    password, else None. R>=3 compares the first 16 /U bytes."""
    key = std_key(password, o_entry, p, id0, r, key_len)
    expect = user_entry(key, id0, r)
    got = bytes(u_entry)
    if r == 2:
        ok = expect == got[:32].ljust(32, b"\x00")
    else:
        ok = expect[:16] == got[:16]
    return key if ok else None


# --------------------------------------------------------------------------
# R6 / AES-256 (ISO 32000-2 §7.6.4.3.4; PDF 2.0, also Acrobat X+ files)


def hash_2b(password: bytes, salt: bytes, udata: bytes = b"") -> bytes:
    """Algorithm 2.B: the iterated SHA-256/384/512 password hash. `udata`
    is the 48-byte /U entry when hashing owner passwords, else empty.
    Cached: the chain runs 64+ AES-CBC rounds in pure python (~1 s), and
    both the reader and a fixture fleet re-derive the same
    (password, salt) pairs constantly."""
    return _hash_2b_cached(bytes(password), bytes(salt), bytes(udata))


@_lru_cache(maxsize=64)
def _hash_2b_cached(password: bytes, salt: bytes, udata: bytes) -> bytes:
    from hashlib import sha256, sha384, sha512

    k = sha256(password + salt + udata).digest()
    i = 0
    while True:
        k1 = (password + k + udata) * 64  # always block-aligned (x64)
        e = aes_cbc_encrypt_nopad(k[:16], k1, iv=k[16:32])
        k = (sha256, sha384, sha512)[sum(e[:16]) % 3](e).digest()
        i += 1
        if i >= 64 and e[-1] <= i - 32:
            return k[:32]


def r6_user_entries(password: bytes, file_key: bytes,
                    vsalt: bytes, ksalt: bytes) -> tuple[bytes, bytes]:
    """(U, UE) for R6: U = hash + validation salt + key salt (48 bytes),
    UE = AES-256-CBC(intermediate key, file key), zero IV, no padding."""
    u = hash_2b(password, vsalt) + vsalt + ksalt
    ue = aes_cbc_encrypt_nopad(hash_2b(password, ksalt), file_key)
    return u, ue


def r6_owner_entries(password: bytes, file_key: bytes, u_entry: bytes,
                     vsalt: bytes, ksalt: bytes) -> tuple[bytes, bytes]:
    """(O, OE) for R6 — owner hashes bind the 48-byte /U as udata."""
    o = hash_2b(password, vsalt, u_entry[:48]) + vsalt + ksalt
    oe = aes_cbc_encrypt_nopad(hash_2b(password, ksalt, u_entry[:48]),
                               file_key)
    return o, oe


def check_user_password_r6(password: bytes, u_entry: bytes,
                           ue_entry: bytes) -> bytes | None:
    """Algorithm 11 + 8a: the 32-byte file key when `password` is the R6
    user password, else None."""
    u = bytes(u_entry)
    if len(u) < 48 or len(ue_entry) < 32:
        return None
    vsalt, ksalt = u[32:40], u[40:48]
    if hash_2b(password, vsalt) != u[:32]:
        return None
    return aes_cbc_decrypt_nopad(
        hash_2b(password, ksalt), bytes(ue_entry)[:32]
    )


def object_key(file_key: bytes, num: int, gen: int, aes: bool) -> bytes:
    """Algorithm 1: the per-object key (RC4 or AESV2)."""
    h = md5()
    h.update(file_key)
    h.update(bytes([num & 0xFF, (num >> 8) & 0xFF, (num >> 16) & 0xFF,
                    gen & 0xFF, (gen >> 8) & 0xFF]))
    if aes:
        h.update(b"sAlT")
    return h.digest()[: min(len(file_key) + 5, 16)]
