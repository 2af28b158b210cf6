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


def test_sql_combine_kernels_match_arrow(spark):
    """The whole-stage-codegen combine/unordered kernels must be
    bit-identical to the Arrow/numpy kernels on random stored pairs."""
    import random as _r

    from pyspark.sql import functions as F

    from blabel_spark.pair_kernels import (
        combine2_pairs_sql,
        combine2_pairs_udf,
        combine3_pairs_sql,
        combine3_pairs_udf,
        unordered_sum_pairs,
        unordered_sum_pairs_sql,
    )
    rng = _r.Random(99)
    rows = [tuple(rng.randint(-2**63, 2**63 - 1) for _ in range(6))
            + (rng.randint(0, 7),) for _ in range(3000)]
    df = spark.createDataFrame(
        rows, "a0 long, a1 long, b0 long, b1 long, c0 long, c1 long, "
              "g int").localCheckpoint(True)
    u3 = combine3_pairs_udf("a0", "a1", "b0", "b1", "c0", "c1")
    s30, s31 = combine3_pairs_sql("a0", "a1", "b0", "b1", "c0", "c1")
    u2 = combine2_pairs_udf("a0", "a1", "b0", "b1")
    s20, s21 = combine2_pairs_sql("a0", "a1", "b0", "b1")
    bad = df.select(
        u3.getField("h0").alias("u0"), u3.getField("h1").alias("u1"),
        s30.alias("s0"), s31.alias("s1"),
        u2.getField("h0").alias("v0"), u2.getField("h1").alias("v1"),
        s20.alias("t0"), s21.alias("t1")) \
        .where("u0 != s0 or u1 != s1 or v0 != t0 or v1 != t1").count()
    assert bad == 0
    a = {tuple(r) for r in unordered_sum_pairs(
        df, ["g"], "a0", "a1", "o0", "o1",
        extra_init=(123, -456)).collect()}
    b = {tuple(r) for r in unordered_sum_pairs_sql(
        df, ["g"], "a0", "a1", "o0", "o1",
        extra_init=(123, -456)).collect()}
    assert a == b


def test_hash_int_pair_sql_matches_scalar(spark):
    """Direct parity for the codegen duplicate-mux digest: a byte-order
    or conv/XOR-encoding regression must fail HERE, not as an opaque
    end-to-end golden-label mismatch."""
    from pyspark.sql import functions as F

    from blabel_spark.hashing import enc_pair
    from blabel_spark.pair_kernels import hash_int_pair_sql
    vals = [0, 1, 2, 255, 256, 2**31 - 1]
    df = spark.createDataFrame([(v,) for v in vals], "i long")
    h0, h1 = hash_int_pair_sql(F.col("i"))
    got = {r["i"]: (r["h0"], r["h1"])
           for r in df.select("i", h0.alias("h0"), h1.alias("h1"))
           .collect()}
    want = {v: enc_pair(hash_int(v)) for v in vals}
    assert got == want


def test_by_graph_route_warns_on_ignored_fixpoint_options(spark):
    """checkpoint_dir (and other fixpoint-only knobs) must not be
    silently dropped when the per-graph kernel route is taken."""
    import warnings

    from blabel_spark.canon.distributed import canonicalize
    df = spark.createDataFrame(
        [("g", "_:a", "<p>", "<o>")],
        "graph_id string, subj string, pred string, obj string")
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        res = canonicalize(spark, df, route="by_graph",
                           checkpoint_dir="/tmp/nonexistent-ckpt")
    assert res.metrics.get("ignored_options") == ["checkpoint_dir"]
    assert any("checkpoint_dir" in str(x.message) for x in w)
