"""Property-based (Hypothesis) invariants for the local kernels.

Random small RDF graphs; the properties are the reference's own test
framework invariants (TestFramework.java:90-168): canonical-form
invariance under bnode renaming + shuffling, idempotence, and leaning
witness soundness.  Pure local — no Spark session — so hundreds of cases
run in seconds and failures shrink to minimal graphs.
"""

import random as _random

from hypothesis import given, settings
from hypothesis import strategies as st

from blabel_spark.canon.local import is_bnode, label_graph
from blabel_spark.lean.local import lean_graph

_BNODES = [f"_:b{i}" for i in range(6)]
_GROUND = ["<u>", "<v>", '"lit"', '"x"@en']
_PREDS = ["<p>", "<q>"]

_node = st.sampled_from(_BNODES + _GROUND)
_pred = st.sampled_from(_PREDS)
_triple = st.tuples(_node, _pred, _node)
# RDF graphs are SETS of triples: label_graph normalizes its input to a
# set first (the distributed engine dedupes identically), so duplicated
# input rows can never shift the unordered graph/upg hashes and
# idempotence holds unconditionally.  test_duplicate_input_set_semantics
# pins that behaviour explicitly.
_graph = st.lists(_triple, min_size=1, max_size=12, unique=True).map(list)


def test_duplicate_input_set_semantics():
    dup = [("_:b0", "<p>", "_:b0"), ("_:b0", "<p>", "_:b0")]
    once = label_graph(dup)
    assert len(once.graph) == 1  # output is a set (TreeSet semantics)
    assert label_graph(dup).graph == once.graph  # deterministic
    # duplicates are invisible: same labels as the deduplicated input
    assert label_graph(dup[:1]).graph == once.graph
    # re-labelling the output is a fixpoint
    assert label_graph(list(once.graph)).graph == \
        label_graph(list(label_graph(list(once.graph)).graph)).graph


def _rename_shuffle(triples, seed):
    rng = _random.Random(seed)
    bnodes = sorted({t for tr in triples for t in (tr[0], tr[2])
                     if is_bnode(t)})
    new = [f"_:r{seed}x{i}" for i in range(len(bnodes))]
    rng.shuffle(new)
    m = dict(zip(bnodes, new))
    out = [(m.get(s, s), p, m.get(o, o)) for s, p, o in triples]
    rng.shuffle(out)
    return out


@settings(max_examples=150, deadline=None)
@given(_graph, st.integers(0, 10_000))
def test_canonical_form_invariant_under_renaming(triples, seed):
    base = label_graph(triples).graph
    assert label_graph(_rename_shuffle(triples, seed)).graph == base


@settings(max_examples=100, deadline=None)
@given(_graph)
def test_labelling_idempotent(triples):
    once = label_graph(triples).graph
    assert label_graph(list(once)).graph == once


@settings(max_examples=100, deadline=None)
@given(_graph)
def test_lean_witness_sound_and_idempotent(triples):
    res = lean_graph(triples)
    in_bnodes = {t for tr in triples for t in (tr[0], tr[2]) if is_bnode(t)}
    assert set(res.core_map) == in_bnodes
    mapped = {(res.core_map.get(s, s), p, res.core_map.get(o, o))
              for s, p, o in triples}
    assert mapped == set(res.lean)
    assert set(res.lean) <= set(triples)
    again = lean_graph(list(res.lean))
    assert again.lean == res.lean


@settings(max_examples=80, deadline=None)
@given(_graph, st.integers(0, 10_000))
def test_lean_then_label_canonical_invariant(triples, seed):
    """Lean → label of any renamed variant lands on one canonical graph
    (the reference's cross-config equality, TestFramework.java:235-241)."""
    a = label_graph(list(lean_graph(triples).lean)).graph
    v = _rename_shuffle(triples, seed)
    b = label_graph(list(lean_graph(v).lean)).graph
    assert a == b
