"""North-rule ship test: the KG job runs under REAL ``spark-submit
--py-files`` (fresh JVM, package shipped as a zip, no repo on the
driver's sys.path beyond the job script)."""

import json
import shutil
import subprocess


def test_build_kg_via_spark_submit(spark, tmp_path):
    # stage a transcript corpus
    from blabel_spark.datagen import transcripts_df
    tdf, _ = transcripts_df(spark, seed=42, n_convs=12)
    src = str(tmp_path / "transcripts")
    tdf.write.parquet(src)

    pkg = shutil.make_archive(str(tmp_path / "blabel_spark_pkg"), "zip",
                              root_dir="/root/repo",
                              base_dir="blabel_spark")
    out = str(tmp_path / "kg")
    r = subprocess.run(
        ["/opt/spark/bin/spark-submit", "--master", "local[4]",
         "--conf", "spark.ui.enabled=false",
         "--conf", "spark.sql.shuffle.partitions=8",
         "--py-files", pkg,
         "/root/repo/jobs/build_kg.py",
         "--transcripts", src, "--out", out],
        capture_output=True, text=True, timeout=600, cwd=str(tmp_path))
    assert r.returncode == 0, r.stderr[-2000:]
    line = [l for l in r.stdout.splitlines() if l.startswith("{")][-1]
    info = json.loads(line)
    assert info["run_id"]

    # the committed snapshot points at a readable canonical triple table
    from blabel_spark.sources.io import latest_snapshot
    snap = latest_snapshot(out)
    assert snap["run_id"] == info["run_id"]
    triples = spark.read.parquet(snap["tables"]["triples"])
    assert triples.count() > 0
    labelled_subj = triples.where("subj LIKE '\\_:SK00%' ESCAPE '\\\\'")
    assert labelled_subj.count() > 0
    metrics = spark.read.parquet(snap["tables"]["metrics"])
    assert metrics.count() == 12        # one lineage row per conversation
