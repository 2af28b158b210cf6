"""Corpus-mode metamorphic TEST harness (RunNQuadsTest -b TEST
counterpart): OKAY on isomorphism-invariant engine behaviour, ERROR when
a variant's canonical form diverges, TSV ingestible by `analyse`."""

import subprocess
import sys

from pyspark.sql import functions as F

from blabel_spark.testing import (
    SEPV,
    corpus_variants,
    metamorphic_report,
    to_test_tsv,
)


def _corpus(spark):
    from blabel_spark.synthetic import chain, clique, cycle
    rows = []
    rows += [("doc-cycle", s, p, o) for s, p, o in cycle(6)]
    rows += [("doc-clique", s, p, o) for s, p, o in clique(4)]
    rows += [("doc-chain", s, p, o) for s, p, o in chain(5)]
    # a graph with a trivially non-lean bnode (dominated by ground <a>)
    rows += [("doc-nonlean", "<a>", "<p>", "<b>"),
             ("doc-nonlean", "_:x", "<p>", "<b>"),
             ("doc-nonlean", "<a>", "<q>", "<c>")]
    # ground-only document
    rows += [("doc-ground", "<s>", "<p>", "<o>")]
    return spark.createDataFrame(
        rows, "graph_id string, subj string, pred string, obj string")


def test_metamorphic_report_all_okay(spark):
    rep = metamorphic_report(spark, _corpus(spark), shuffles=3).collect()
    by_doc = {r["doc"]: r for r in rep}
    assert set(by_doc) == {"doc-cycle", "doc-clique", "doc-chain",
                           "doc-nonlean", "doc-ground"}
    for doc, r in by_doc.items():
        assert r["status"] == "OKAY", (doc, r)
        assert r["label_partitions"] == 1, (doc, r)
        assert r["lean_partitions"] == 1, (doc, r)
        assert r["mapping_failures"] == 0, (doc, r)
    assert by_doc["doc-cycle"]["triples"] == 6
    assert by_doc["doc-cycle"]["bnodes"] == 6
    assert by_doc["doc-ground"]["bnodes"] == 0


def test_metamorphic_error_injection_and_analyse_ingest(spark, tmp_path):
    """A tampered variant (extra triple smuggled into variant 1 of one
    doc) must flip that doc to ERROR with a LABELLING_PARTITION_SIZE
    detail, and the TSV must flow through read_bench_tsv into
    corpus_summary's error split."""
    tri = _corpus(spark)
    var = corpus_variants(tri, shuffles=3)
    tamper = spark.createDataFrame(
        [(f"doc-chain{SEPV}1", "_:evil", "<p>", "<tampered>")],
        "graph_id string, subj string, pred string, obj string")
    rep = metamorphic_report(spark, tri, shuffles=3, lean=False,
                             variants=var.union(tamper))
    rows = {r["doc"]: r for r in rep.collect()}
    assert rows["doc-chain"]["status"] == "ERROR"
    assert rows["doc-chain"]["label_partitions"] > 1
    assert all(r["status"] == "OKAY" for d, r in rows.items()
               if d != "doc-chain")

    tsv = to_test_tsv(rep)
    lines = [r["value"] for r in tsv.collect()]
    err = [l for l in lines if "\tERROR" in l]
    assert len(err) == 1 and "LABELLING_PARTITION_SIZE\t2" in err[0]
    out = str(tmp_path / "test_tsv")
    tsv.coalesce(1).write.mode("overwrite").text(out)

    from blabel_spark.ops.analyse import corpus_summary, read_bench_tsv
    runs = read_bench_tsv(spark, out)
    assert runs.count() == 5
    summ = corpus_summary(runs).collect()
    assert len(summ) == 1 and summ[0]["mode"] == "TEST"
    assert summ[0]["n_docs"] == 5 and summ[0]["n_errors"] == 1


def test_cli_test_subcommand(tmp_path):
    """End-to-end: .nq corpus in, OKAY TSV out, exit code 0."""
    lines = []
    from blabel_spark.synthetic import cycle
    for s, p, o in cycle(4):
        lines.append(f"{s} {p} {o} <doc1> .")
    lines += ["<a> <p> <b> <doc2> .", "_:x <p> <b> <doc2> ."]
    inp = tmp_path / "corpus.nq"
    inp.write_text("\n".join(lines) + "\n")
    outdir = tmp_path / "tsv"
    r = subprocess.run(
        [sys.executable, "-m", "blabel_spark.cli", "test",
         "-i", str(inp), "-o", str(outdir), "--shuffles", "3",
         "--cpus", "4"],
        capture_output=True, text=True, timeout=900, cwd="/root/repo")
    assert r.returncode == 0, r.stderr[-800:]
    got = []
    for f in outdir.glob("part-*"):
        got += [l for l in f.read_text().splitlines() if l]
    assert len(got) == 2
    assert all(l.startswith("TEST\t") and l.endswith("\tOKAY")
               for l in got), got
