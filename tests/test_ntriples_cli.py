"""N-Triples source/sink round-trip + CLI end-to-end (golden fixture)."""

import subprocess
import sys

from tests.test_local_canon import GOLD_BNODE_OUTPUT, GOLD_INPUT


def test_ntriples_roundtrip(spark, tmp_path):
    from blabel_spark.sources.ntriples import read_ntriples, write_ntriples
    rows = [("g1", s, p, o) for s, p, o in GOLD_INPUT]
    rows += [("g2", "<a>", "<p>", '"lit with \\"quote\\" and space"@en')]
    df = spark.createDataFrame(rows, "graph_id string, subj string, "
                                     "pred string, obj string")
    out = str(tmp_path / "round.nq")
    write_ntriples(df, out, quads=True)
    back = read_ntriples(spark, out)
    assert sorted(map(tuple, back.collect())) == sorted(rows)


def test_ntriples_parse_skips_garbage(spark, tmp_path):
    p = tmp_path / "mixed.nt"
    p.write_text("\n".join([
        "<a> <p> <b> .",
        "# a comment line",
        "",
        "not a triple at all",
        '_:x <p> "lit" .',
    ]))
    from blabel_spark.sources.ntriples import read_ntriples
    got = sorted(map(tuple, read_ntriples(spark, str(p)).collect()))
    assert got == [("default", "<a>", "<p>", "<b>"),
                   ("default", "_:x", "<p>", '"lit"')]


def test_cli_label_golden(tmp_path):
    """The reference's primary CLI flow: .nt in, canonical .nt out,
    matching BlabelTest's golden labels."""
    inp = tmp_path / "gold.nt"
    inp.write_text("".join(f"{s} {p} {o} .\n" for s, p, o in GOLD_INPUT))
    outdir = tmp_path / "out"
    r = subprocess.run(
        [sys.executable, "-m", "blabel_spark.cli", "label",
         "-i", str(inp), "-o", str(outdir), "--single", "--cpus", "4"],
        capture_output=True, text=True, timeout=600, cwd="/root/repo")
    assert r.returncode == 0, r.stderr[-800:]
    lines = set()
    for f in outdir.glob("part-*"):
        lines |= {l for l in f.read_text().splitlines() if l}
    expect = {f"{s} {p} {o} ." for s, p, o in GOLD_BNODE_OUTPUT}
    assert lines == expect


def test_cli_label_iri_prefix(tmp_path):
    inp = tmp_path / "gold.nt"
    inp.write_text("".join(f"{s} {p} {o} .\n" for s, p, o in GOLD_INPUT))
    outdir = tmp_path / "out2"
    r = subprocess.run(
        [sys.executable, "-m", "blabel_spark.cli", "label",
         "-i", str(inp), "-o", str(outdir), "--single", "--cpus", "4",
         "--iri", "--prefix", "urn:blabel:"],
        capture_output=True, text=True, timeout=600, cwd="/root/repo")
    assert r.returncode == 0, r.stderr[-800:]
    lines = set()
    for f in outdir.glob("part-*"):
        lines |= {l for l in f.read_text().splitlines() if l}
    # golden IRI rendering (BlabelTest.java:36-42)
    assert ("<urn:blabel:SK0036cc1684b47a2ab9d572712e9bf6d4b6> <p> "
            "<urn:blabel:SK003e2cfe64ac8abefd0daec5da3bda7422> .") in lines
    assert "<u> <p> <v> ." in lines
    assert all("_:" not in l for l in lines)


def test_cli_control_passthrough(tmp_path):
    """Control run (cli/Control.java:98-124): parse + write with no
    transformation, optional 1-in-N document sample."""
    inp = tmp_path / "c.nq"
    lines = [f"<s{i}> <p> <o{i}> <g{i % 7}> ." for i in range(70)]
    inp.write_text("\n".join(lines) + "\n")
    outdir = tmp_path / "out"
    r = subprocess.run(
        [sys.executable, "-m", "blabel_spark.cli", "control",
         "-i", str(inp), "-o", str(outdir), "--cpus", "4"],
        capture_output=True, text=True, timeout=600, cwd="/root/repo")
    assert r.returncode == 0, r.stderr[-800:]
    assert "CONTROL\t7\t70\t" in r.stderr
    got = set()
    for f in outdir.glob("part-*"):
        got |= {l for l in f.read_text().splitlines() if l}
    assert len(got) == 70

    out2 = tmp_path / "out2"
    r = subprocess.run(
        [sys.executable, "-m", "blabel_spark.cli", "control",
         "-i", str(inp), "-o", str(out2), "-n", "3", "--cpus", "4"],
        capture_output=True, text=True, timeout=600, cwd="/root/repo")
    assert r.returncode == 0, r.stderr[-800:]
    n_docs = int(r.stderr.split("CONTROL\t")[1].split("\t")[0])
    assert 0 < n_docs < 7
