"""AnalyseNQuadsResults parity: TSV parse, corpus aggregates, argmax
trackers, Binner runtime histograms (cli/AnalyseNQuadsResults.java)."""

from blabel_spark.ops.analyse import (
    analyse_run,
    argmax_docs,
    corpus_summary,
    read_bench_tsv,
    runtime_histogram,
)

TSV = """LEAN\tdoc1\t100\t10\t50\t90\t8\t3\t2\t1\t10\t2
LEAN\tdoc2\t2000\t200\t-5000\tLeanBudgetExceeded\tx
LABEL\tdoc1\t100\t10\t40\t2\t1
LABEL\tdoc3\t5\t1\t12000\t9\t4
NOBNODES\tdoc4\t7
"""


def _runs(spark, tmp_path):
    p = tmp_path / "bench.tsv"
    p.write_text(TSV)
    return read_bench_tsv(spark, str(p))


def test_tsv_parse(spark, tmp_path):
    runs = _runs(spark, tmp_path).collect()
    assert len(runs) == 4          # NOBNODES line excluded
    modes = sorted(r["mode"] for r in runs)
    assert modes == ["LABEL", "LABEL", "LEAN", "LEAN"]


def test_summary(spark, tmp_path):
    s = {r["mode"]: r for r in corpus_summary(_runs(spark, tmp_path)).collect()}
    assert s["LEAN"]["n_docs"] == 2
    assert s["LEAN"]["n_errors"] == 1
    assert s["LEAN"]["ok_triples"] == 100
    assert s["LEAN"]["err_triples"] == 2000
    assert s["LEAN"]["err_time_ms"] == 5000
    assert s["LABEL"]["n_errors"] == 0
    assert s["LABEL"]["ok_time_ms"] == 12040


def test_argmax(spark, tmp_path):
    rows = {(r["mode"], r["criterion"]): r["doc"]
            for r in argmax_docs(_runs(spark, tmp_path)).collect()}
    assert rows[("LEAN", "max_triples")] == "doc2"
    assert rows[("LEAN", "slowest")] == "doc2"     # |−5000| > 50
    assert rows[("LABEL", "max_triples")] == "doc1"
    assert rows[("LABEL", "slowest")] == "doc3"


def test_runtime_hist(spark, tmp_path):
    h = {(r["mode"], r["bin"]): r["n_docs"]
         for r in runtime_histogram(_runs(spark, tmp_path)).collect()}
    assert h[("LEAN", "10-99")] == 1          # 50 ms
    assert h[("LEAN", "1000-9999")] == 1      # |−5000|
    assert h[("LABEL", "10-99")] == 1         # 40 ms
    assert h[("LABEL", "10000-99999")] == 1   # 12000 ms


def test_analyse_run_shapes(spark, tmp_path):
    rep = analyse_run(_runs(spark, tmp_path))
    assert set(rep) == {"summary", "argmax", "runtime_hist"}
    for df in rep.values():
        assert df.count() > 0
