"""Hash-kernel unit tests: Guava-compatible md5 combine semantics.

The cross-check anchor is the reference golden test
(src/test/java/cl/uchile/dcc/blabel/BlabelTest.java) exercised in
test_local_canon.py; here we pin the primitive kernels and the vectorized
numpy variants against the scalar ones.
"""

import numpy as np
import pytest

from blabel_spark.hashing import (
    BLANK_HASH,
    MINUS,
    PLUS,
    combine_ordered,
    combine_ordered_vec,
    combine_unordered,
    fold_sorted_lists_ordered,
    hash_int,
    hash_string,
    hash_unencoded_chars,
    md5_of_utf8_vec,
)


def test_blank_hash_is_md5_of_empty_string():
    assert BLANK_HASH.hex() == "d41d8cd98f00b204e9800998ecf8427e"


def test_hash_string_utf8():
    assert hash_string("abc").hex() == "900150983cd24fb0d6963f7d28e17f72"


def test_unencoded_chars_is_utf16le():
    # Guava hashUnencodedChars hashes UTF-16LE code units
    import hashlib
    assert PLUS == hashlib.md5("+".encode("utf-16-le")).digest()
    assert MINUS == hashlib.md5("-".encode("utf-16-le")).digest()
    assert hash_unencoded_chars("ab") == hashlib.md5(b"a\x00b\x00").digest()


def test_hash_int_little_endian():
    import hashlib
    assert hash_int(0) == hashlib.md5(b"\x00\x00\x00\x00").digest()
    assert hash_int(1) == hashlib.md5(b"\x01\x00\x00\x00").digest()
    assert hash_int(256) == hashlib.md5(b"\x00\x01\x00\x00").digest()


def test_combine_ordered_byte_math():
    a, b = bytes(range(16)), bytes(range(16, 32))
    r = combine_ordered([a, b])
    expect = bytes(((ai * 37) ^ bi) & 0xFF for ai, bi in zip(a, b))
    assert r == expect
    # order-sensitive
    assert combine_ordered([a, b]) != combine_ordered([b, a])


def test_combine_unordered_commutative():
    a, b, c = hash_string("a"), hash_string("b"), hash_string("c")
    assert combine_unordered([a, b, c]) == combine_unordered([c, a, b])
    expect = bytes((x + y + z) & 0xFF for x, y, z in zip(a, b, c))
    assert combine_unordered([a, b, c]) == expect


def test_empty_combine_raises():
    with pytest.raises(ValueError):
        combine_ordered([])
    with pytest.raises(ValueError):
        combine_unordered([])


def test_vectorized_combine_matches_scalar():
    rng = np.random.RandomState(7)
    rows = [[bytes(rng.randint(0, 256, 16, dtype=np.uint8))
             for _ in range(rng.randint(1, 9))] for _ in range(200)]
    # combine_ordered_vec: aligned columns
    cols3 = [[r[0] for r in rows], [r[-1] for r in rows],
             [r[len(r) // 2] for r in rows]]
    mats = [np.frombuffer(b"".join(c), dtype=np.uint8).reshape(-1, 16)
            for c in cols3]
    vec = combine_ordered_vec(mats)
    for j in range(len(rows)):
        assert vec[j].tobytes() == combine_ordered(
            [cols3[0][j], cols3[1][j], cols3[2][j]])
    # ragged fold (left-zero-pad trick)
    folded = fold_sorted_lists_ordered(rows)
    for j, row in enumerate(rows):
        assert folded[j] == combine_ordered(row)


def test_md5_vec():
    out = md5_of_utf8_vec(["", "abc", "üñî"])
    assert out[0] == BLANK_HASH
    assert out[1] == hash_string("abc")
    assert out[2] == hash_string("üñî")
