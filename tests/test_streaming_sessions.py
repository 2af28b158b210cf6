"""Streaming analytics: watermarked windows match the batch/DuckDB
semantics, and the applyInPandasWithState sessionizer closes sessions on
in-stream gaps, flushes trailing sessions by event-time timeout, and
keeps its state across a stream restart (checkpointed state store)."""

import datetime as dt

import pandas as pd

from blabel_spark.datagen import TRANSCRIPT_SCHEMA
from blabel_spark.streaming.sessions import (
    sessionize_stream,
    windowed_turn_counts,
)

T0 = dt.datetime(2026, 1, 1, 12, 0, 0)


def _turn(conv, idx, minutes, role="user"):
    return (conv, idx, role, f"text {idx}", "",
            T0 + dt.timedelta(minutes=minutes))


def _write_batch(spark, path, rows):
    spark.createDataFrame(rows, TRANSCRIPT_SCHEMA) \
        .coalesce(1).write.mode("append").parquet(path)


def _drain(spark, src, ckpt, out_dir, gap_seconds=600):
    """Run one availableNow pass with a parquet sink (supports restart
    from the same checkpoint, unlike the memory sink); returns all
    session rows written so far."""
    stream = spark.readStream.schema(TRANSCRIPT_SCHEMA).parquet(src)
    sessions = sessionize_stream(stream, gap_seconds=gap_seconds,
                                 watermark="0 seconds")
    q = (sessions.writeStream.format("parquet")
         .option("path", out_dir).outputMode("append")
         .option("checkpointLocation", ckpt)
         .trigger(availableNow=True).start())
    q.awaitTermination()
    try:
        return {tuple(r) for r in spark.read.parquet(out_dir).collect()}
    except Exception:
        return set()   # no output files yet


def test_windowed_counts_batch_semantics(spark):
    rows = [_turn("c1", i, i * 3) for i in range(8)]          # 0..21 min
    rows += [_turn("c2", i, i * 3, "assistant") for i in range(4)]
    df = spark.createDataFrame(rows, TRANSCRIPT_SCHEMA)
    out = {(r.window_start.minute, r.role): r.n_turns
           for r in windowed_turn_counts(df, window="10 minutes").collect()}
    # windows at :00, :10, :20 — turns at 0,3,6,9 | 12,15,18 | 21
    assert out[(0, "user")] == 4
    assert out[(10, "user")] == 3
    assert out[(20, "user")] == 1
    assert out[(0, "assistant")] == 4


def test_windowed_counts_streaming_smoke(spark, tmp_path):
    src = str(tmp_path / "turns")
    _write_batch(spark, src, [_turn("c1", i, i) for i in range(5)])
    stream = spark.readStream.schema(TRANSCRIPT_SCHEMA).parquet(src)
    q = (windowed_turn_counts(stream).writeStream.format("memory")
         .queryName("win_smoke").outputMode("append")
         .option("checkpointLocation", str(tmp_path / "ck"))
         .trigger(availableNow=True).start())
    q.awaitTermination()
    # append mode only emits finalized windows; the smoke check is that
    # the watermarked plan runs as a stream at all
    assert q.lastProgress is not None


def test_stateful_sessionizer_gaps_and_timeout(spark, tmp_path):
    src = str(tmp_path / "turns")
    ck = str(tmp_path / "ck")
    # c1: turns at 0,2,4 min then 30,31 → gap closes first session; a
    # final turn at 90 min advances the watermark past 31+10min so the
    # second session flushes via timeout
    rows = [_turn("c1", 0, 0), _turn("c1", 1, 2), _turn("c1", 2, 4),
            _turn("c1", 3, 30), _turn("c1", 4, 31),
            _turn("c1", 5, 90)]
    _write_batch(spark, src, rows)
    got = _drain(spark, src, ck, str(tmp_path / "out_a"), gap_seconds=600)
    by_start = {r[1]: r for r in got}
    s1 = by_start[T0]
    assert s1[2] == T0 + dt.timedelta(minutes=4) and s1[3] == 3
    s2 = by_start[T0 + dt.timedelta(minutes=30)]
    assert s2[2] == T0 + dt.timedelta(minutes=31) and s2[3] == 2


def test_stateful_sessionizer_state_survives_restart(spark, tmp_path):
    src = str(tmp_path / "turns")
    ck = str(tmp_path / "ck")
    # batch 1: an open session (no gap, no watermark push)
    _write_batch(spark, src, [_turn("c9", 0, 0), _turn("c9", 1, 2)])
    out = str(tmp_path / "out_b")
    got1 = _drain(spark, src, ck, out, gap_seconds=600)
    assert got1 == set()          # session still open in state
    # batch 2 (new stream run, same checkpoint): turns continuing the SAME
    # session, then a far-future turn to flush it
    _write_batch(spark, src, [_turn("c9", 2, 4), _turn("c9", 3, 120)])
    got2 = _drain(spark, src, ck, out, gap_seconds=600)
    sessions = {r for r in got2 if r[0] == "c9"}
    starts = {r[1]: r for r in sessions}
    # the restored state merged batch-1 turns with batch-2's: one session
    # 0→4 min with THREE turns (state crossed the restart)
    s = starts[T0]
    assert s[2] == T0 + dt.timedelta(minutes=4)
    assert s[3] == 3
