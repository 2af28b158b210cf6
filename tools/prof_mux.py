#!/usr/bin/env python
"""Stage-level decomposition of the fixpoint's post-loop tail
(t_comp_mux + t_mux) via the Spark event log.

Usage: python tools/prof_mux.py [sf_dir] [cpus]
Runs the forced fixpoint once (after an auto-route warmup), then prints
each job > 0.2 s with its top stages — the feedback loop for the mux-tail
(bucketed-storage) work.
"""
import glob
import json
import os
import subprocess
import sys
import time

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
cpus = int(sys.argv[2]) if len(sys.argv) > 2 else 32

EVDIR = "/tmp/spark-events-mux"
os.makedirs(EVDIR, exist_ok=True)

from pyspark.sql import SparkSession  # noqa: E402

os.makedirs("/dev/shm/spark-local", exist_ok=True)
spark = (SparkSession.builder.master(f"local[{cpus}]").appName("prof-mux")
         .config("spark.local.dir", "/dev/shm/spark-local")
         .config("spark.sql.shuffle.partitions", "32")
         .config("spark.sql.adaptive.enabled", "true")
         .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
         .config("spark.sql.adaptive.coalescePartitions.parallelismFirst",
                 "true")
         .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8m")
         .config("spark.checkpoint.checkpointAllMarkedAncestors", "true")
         .config("spark.sql.execution.arrow.pyspark.enabled", "true")
         .config("spark.driver.memory", "8g")
         .config("spark.eventLog.enabled", "true")
         .config("spark.eventLog.dir", EVDIR)
         .config("spark.ui.enabled", "false")
         .config("spark.ui.showConsoleProgress", "false")
         .getOrCreate())

from blabel_spark.canon.distributed import canonicalize  # noqa: E402
from blabel_spark.ops.triples_view import build_triples  # noqa: E402

triples = build_triples(spark, sf_dir).localCheckpoint(True)
n = triples.count()
warm = canonicalize(spark, triples)
warm.labelled.write.format("noop").mode("overwrite").save()

t0 = time.time()
res = canonicalize(spark, triples, route="fixpoint")
t_pre_save = time.time()
res.labelled.write.format("noop").mode("overwrite").save()
wall = round(time.time() - t0, 3)
app_id = spark.sparkContext.applicationId
m = res.metrics
print(json.dumps({"n_triples": n, "wall_s": wall,
                  **{k: v for k, v in m.items()
                     if k != "iterations_log"}}, default=str))
# phase boundaries in epoch ms for the job timeline below
bounds, acc = [], t0 * 1000
for ph in ("t_prep_s", "t_loop_s", "t_leaf_kernel_s", "t_comp_mux_s",
           "t_mux_s"):
    acc += m[ph] * 1000
    bounds.append((ph, acc))
bounds.append(("save", t_pre_save * 1000))
spark.stop()

# ---- parse the event log ---------------------------------------------------
evd = glob.glob(f"{EVDIR}/eventlog_v2_{app_id}/events_*.zstd")
raw = f"/tmp/mux_events_{app_id}.json"
subprocess.run(["zstd", "-d", "-f", evd[0], "-o", raw], check=True,
               capture_output=True)
jobs, stages = {}, {}
for line in open(raw):
    try:
        e = json.loads(line)
    except ValueError:
        continue
    t = e.get("Event")
    if t == "SparkListenerJobStart":
        jobs[e["Job ID"]] = {"t0": e["Submission Time"],
                             "stages": [s["Stage ID"]
                                        for s in e["Stage Infos"]]}
    elif t == "SparkListenerJobEnd":
        jobs.setdefault(e["Job ID"], {}).setdefault("t0", 0)
        jobs[e["Job ID"]]["t1"] = e["Completion Time"]
    elif t == "SparkListenerStageCompleted":
        si = e["Stage Info"]
        stages[si["Stage ID"]] = {
            "name": si["Stage Name"].split(" at ")[0],
            "details": si.get("Details", "")[:0],
            "ms": si.get("Completion Time", 0)
            - si.get("Submission Time", 0),
            "tasks": si["Number of Tasks"]}
def phase_of(ts_ms: float) -> str:
    for ph, end in bounds[:-1]:
        if ts_ms <= end:
            return ph
    return "post"


for jid in sorted(jobs):
    j = jobs[jid]
    dur = (j.get("t1", 0) - j.get("t0", 0)) / 1000
    if dur < 0.15 or j.get("t0", 0) < t0 * 1000:
        continue
    done = [(stages[s]["ms"], stages[s]["name"], stages[s]["tasks"])
            for s in j.get("stages", []) if s in stages]
    done.sort(reverse=True)
    off = (j["t0"] - t0 * 1000) / 1000
    print(f"[{phase_of(j['t0'])}] +{off:6.2f}s job {jid}: {dur:.2f}s "
          + "; ".join(f"{nm}({tk}t)={ms}ms" for ms, nm, tk in done[:4]))
