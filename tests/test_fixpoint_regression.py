"""Regression tests for the lazy-checkpoint bug class (found round 4).

With two stacked LAZY localCheckpoints per round (colours under the
convergence table), ``RDD.doCheckpoint`` recursion stops at the first
checkpoint-marked RDD unless ``spark.checkpoint.checkpointAllMarkedAncestors``
is set — the inner colour table never truncates and per-round plans DOUBLE
(the event-log signature: job stage counts growing ~3/round, "Broadcasting
large task binary" warnings).  These tests pin

(a) that ``get_spark`` sessions set the conf and the lazy path keeps
    per-round job/stage counts FLAT across rounds, and
(b) that the eager fallback taken on foreign sessions
    (``_lazy_checkpoint_ok`` False) produces bit-identical labels, also
    with flat per-round plans.

Reference anchor: the one-pass-per-round colouring loop both paths mirror,
GraphColouring.java:463-666.
"""

from __future__ import annotations


def _chain_corpus(spark, n_chains: int = 40, length: int = 12):
    """Directed bnode chains force ~length/2 refinement rounds with every
    component staying active until the simultaneous final round — rounds
    2..N-1 are structurally identical, so any plan growth is the bug."""
    from blabel_spark.synthetic import chain
    rows = []
    for i in range(n_chains):
        rows.extend((f"c{i}", s, p, o)
                    for s, p, o in chain(length, tag=f"c{i}_"))
    return spark.createDataFrame(
        rows, "graph_id string, subj string, pred string, obj string"
    ).localCheckpoint(True)


def _assert_flat(log):
    """Rounds 2..N-1 must have identical (n_jobs, n_stages): round 1 has
    no active-semi-join yet and the final round folds resolved
    components, but any growth in the middle is lineage leaking through
    the lazy checkpoints."""
    mids = log[1:-1]
    assert len(mids) >= 2, f"corpus too shallow for the check: {log}"
    shapes = {(e["n_jobs"], e["n_stages"]) for e in mids}
    assert len(shapes) == 1, (
        f"per-round plan size must stay constant, got {shapes}: {log}")


def test_lazy_path_flat_plans(spark):
    from blabel_spark.canon import distributed as D
    assert D._lazy_checkpoint_ok(spark), (
        "get_spark must set spark.checkpoint.checkpointAllMarkedAncestors "
        "(static conf) — without it lazy per-round checkpoints leak "
        "lineage and plans double every round")
    res = D.canonicalize(spark, _chain_corpus(spark), route="fixpoint")
    assert res.metrics["colour_iterations"] >= 5
    _assert_flat(res.metrics["iterations_log"])


def test_loop_retains_o1_checkpoints_and_unpersist(spark):
    """A long fixpoint must not accumulate O(rounds) checkpointed tables:
    superseded round state is released the moment its last consumer
    materializes, the returned result rides on a fixed handful of blocks
    (btri, node table, final labels), and ``CanonResult.unpersist``
    releases those too once the result has been consumed — the
    session-hygiene contract for long-lived sessions running many
    corpora."""
    from blabel_spark.canon import distributed as D

    def persistent_ids():
        jmap = spark.sparkContext._jsc.getPersistentRDDs()
        return {int(k) for k in jmap.keySet().toArray()}

    before = persistent_ids()
    tri = _chain_corpus(spark)
    res = D.canonicalize(spark, tri, route="fixpoint")
    rows = res.labels.count()
    assert rows > 0
    assert res.metrics["colour_iterations"] >= 5
    ours = persistent_ids() - before
    # input checkpoint (tri) + btri + node_comp/CC + leaf_final, NOT
    # 2 tables x colour_iterations
    assert len(ours) <= 6, (
        f"fixpoint retained {len(ours)} checkpointed RDDs after "
        f"{res.metrics['colour_iterations']} rounds — loop state leaking")
    res.unpersist(blocking=True)
    left = persistent_ids() - before
    # only the test's own input checkpoint may remain
    assert len(left) <= 1, (
        f"unpersist left {len(left)} RDDs behind")
    # the result is no longer usable after unpersist — that's documented


def test_eager_fallback_parity_and_flat_plans(spark, monkeypatch):
    from blabel_spark.canon import distributed as D
    tri = _chain_corpus(spark)
    want = sorted(
        (r["graph_id"], r["bnode"], r["label"])
        for r in D.canonicalize(spark, tri, route="fixpoint")
        .labels.collect())

    monkeypatch.setattr(D, "_lazy_checkpoint_ok", lambda s: False)
    res = D.canonicalize(spark, tri, route="fixpoint")
    got = sorted((r["graph_id"], r["bnode"], r["label"])
                 for r in res.labels.collect())
    assert got == want
    _assert_flat(res.metrics["iterations_log"])
