"""Out-of-order streaming replay soak (round-7 verdict directive #7):
the sf0.1 events table delivered as SCRAMBLED micro-batches with
injected cross-batch duplicates, through the stateful streaming twins,
each checked EXACTLY against its batch oracle — the "measured, not
asserted" treatment for the watermark-correctness claims.

Replay construction (deterministic, seed=8):
  * order events by time, slice into ``--batches`` contiguous slices;
  * write the slices under a PERMUTED delivery order — a slice whose
    data is hours older than its predecessors arrives late, so every
    operator sees heavy out-of-order input (disorder span = the full
    table, ~30 days at sf0.1);
  * duplicate every 10th event into a DIFFERENT (later-delivered)
    slice — exact duplicates arriving twice across micro-batches.

Twins and oracles (all run under BOTH state-store providers —
HDFS-backed default and RocksDB):
  * ``incremental_upsert_stream``  — version-aware "newest wins"
    upsert; arrival-order-free by design, so the final snapshot must
    EQUAL ``cdc.latest_per_key`` over the union of everything
    delivered (duplicates included) even under full scramble.
  * ``stream_dedup`` (dropDuplicatesWithinWatermark) — with late
    tolerance ≥ the disorder span, the output must be exactly one row
    per event_id.
  * ``sessionize_stateful`` — with the round-8 ``watermark`` override
    (late tolerance decoupled from the session gap) ≥ the disorder
    span, closed sessions must EQUAL ``sessionize_batch`` on the clean
    table, row for row.
  * ``windowed_event_agg`` — same tolerance, must equal the batch agg.

Writes STREAM_SOAK.json incrementally.

Usage: python tools/streaming_soak.py [--sf-dir /root/testdata/sf0.1]
       [--batches 20] [--out STREAM_SOAK.json]
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import random
import shutil
import sys
import tempfile
import time
import uuid

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from pyspark.sql import functions as F

from mapreduce_join_comparison_spark.operators.cdc import latest_per_key
from mapreduce_join_comparison_spark.session import get_spark, scoped_conf
from mapreduce_join_comparison_spark.sources.io import load_table
from mapreduce_join_comparison_spark.streaming.events import (
    incremental_upsert_stream,
    load_events_stream,
    sessionize_batch,
    sessionize_stateful,
    stream_dedup,
    windowed_event_agg,
)

ROCKSDB = ("org.apache.spark.sql.execution.streaming.state."
           "RocksDBStateStoreProvider")
TOLERANCE = "40 days"  # ≥ the full sf0.1 time span ⇒ no legitimate drop
# the sentinel (user_id = -1) rides the LAST batch with a timestamp
# far enough ahead that the final watermark passes every real
# session's end + gap — the stream's "end of input" flush; both sides
# of each comparison exclude it
SENTINEL_USER = -1
SENTINEL_AHEAD_DAYS = 90


def stage_replay(spark, sf_dir: str, n_batches: int, workdir: str,
                 inject_dups: bool = True, name: str = "stage") -> str:
    """Write the scrambled (optionally duplicated) replay; returns the
    stage dir whose lexicographic file order IS the delivery order."""
    events = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "ts", "value", "props"
    )
    # contiguous time slices via ntile over the time order
    from pyspark.sql.window import Window

    sliced = events.withColumn(
        "_slice",
        F.ntile(n_batches).over(Window.orderBy("ts", "event_id")) - 1,
    )
    rng = random.Random(8)
    delivery = list(range(n_batches))
    rng.shuffle(delivery)  # delivery[i] = the slice delivered i-th
    # duplicates: every 10th event re-delivered in a later batch than
    # its own slice (position-wise), so the second copy crosses batches
    pos_of_slice = {s: i for i, s in enumerate(delivery)}
    stage = os.path.join(workdir, name)
    os.makedirs(stage)
    with scoped_conf(
        spark,
        **{"spark.sql.parquet.outputTimestampType": "TIMESTAMP_MICROS"},
    ):
        max_ts = events.agg(F.max("ts")).collect()[0][0]
        for i, s in enumerate(delivery):
            chunk = sliced.filter(F.col("_slice") == s).drop("_slice")
            if i == n_batches - 1:
                sentinel = events.sparkSession.createDataFrame(
                    [(10 ** 12, SENTINEL_USER, "sentinel", max_ts, 0.0,
                      "{}")],
                    "event_id bigint, user_id bigint, event_type string, "
                    "ts timestamp, value double, props string",
                ).withColumn(
                    "ts",
                    F.col("ts") + F.expr(
                        f"INTERVAL {SENTINEL_AHEAD_DAYS} DAYS"),
                )
                chunk = chunk.unionByName(sentinel.select(*chunk.columns))
            # inject: duplicates of earlier-DELIVERED slices' events
            dup_sources = [
                d for d in delivery[:i] if pos_of_slice[d] == i - 1
            ] if inject_dups else []
            if dup_sources:
                dups = sliced.filter(
                    F.col("_slice").isin(dup_sources)
                    & (F.col("event_id") % 10 == 0)
                ).drop("_slice")
                chunk = chunk.unionByName(dups)
            out = os.path.join(workdir, f"{name}_chunk{i}")
            chunk.coalesce(1).write.parquet(out)
            (part,) = glob.glob(os.path.join(out, "part-*.parquet"))
            shutil.copy(part, os.path.join(stage, f"c{i:03d}.parquet"))
    return stage


def run_to_memory_counted(stream_df, output_mode="append"):
    qname = f"soak_{uuid.uuid4().hex[:8]}"
    q = (
        stream_df.writeStream.format("memory")
        .queryName(qname)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    n_batches = len(q.recentProgress)
    return stream_df.sparkSession.table(qname), n_batches


def rows_set(df, round_cols=()):
    out = set()
    for r in df.collect():
        d = r.asDict()
        out.add(tuple(
            round(d[c], 6) if c in round_cols and d[c] is not None else d[c]
            for c in sorted(d)
        ))
    return out


def check_twins(spark, sf_dir: str, stage: str, clean_stage: str,
                provider: str) -> dict:
    res: dict = {"provider": provider}
    events = load_table(spark, sf_dir, "events")
    delivered_all = spark.read.parquet(
        os.path.join(stage, "*.parquet"))

    # --- upsert: final snapshot == latest_per_key over ALL deliveries
    t0 = time.monotonic()
    workdir = tempfile.mkdtemp(prefix="soak_upsert_")
    stream = load_events_stream(spark, stage, max_files_per_trigger=1)
    final = incremental_upsert_stream(
        stream, os.path.join(workdir, "state"),
        key="user_id", version_col="ts", tiebreak="event_id",
        checkpoint_dir=os.path.join(workdir, "ckpt"),
    )
    want = latest_per_key(delivered_all, "user_id", "ts", "event_id")
    final = final.filter(F.col("user_id") != SENTINEL_USER)
    want = want.filter(F.col("user_id") != SENTINEL_USER)
    cols = ["user_id", "event_id", "event_type", "value"]
    got_s = rows_set(final.select(*cols))
    want_s = rows_set(want.select(*cols))
    res["upsert"] = {
        "rows": len(got_s), "match": got_s == want_s,
        "sec": round(time.monotonic() - t0, 2),
    }
    shutil.rmtree(workdir, ignore_errors=True)

    # --- dedup: exactly one row per delivered event_id
    t0 = time.monotonic()
    stream = load_events_stream(spark, stage, max_files_per_trigger=1)
    out, nb = run_to_memory_counted(
        stream_dedup(stream, watermark=TOLERANCE))
    out = out.filter(F.col("user_id") != SENTINEL_USER)
    got = {r["event_id"] for r in out.select("event_id").collect()}
    n_out = out.count()
    want_ids = {r["event_id"] for r in delivered_all
                .filter(F.col("user_id") != SENTINEL_USER)
                .select("event_id").distinct().collect()}
    res["dedup"] = {
        "micro_batches": nb, "rows": n_out,
        "match": got == want_ids and n_out == len(want_ids),
        "sec": round(time.monotonic() - t0, 2),
    }

    # --- sessionize: closed sessions == batch sessionization of the
    # clean table (the dup-free scrambled stage: chaining a streaming
    # dedup in front would redefine the watermark, which Spark forbids)
    t0 = time.monotonic()
    stream = load_events_stream(spark, clean_stage, max_files_per_trigger=1)
    sess, nb = run_to_memory_counted(
        sessionize_stateful(stream, gap_minutes=30, watermark=TOLERANCE))
    sess = sess.filter(F.col("user_id") != SENTINEL_USER)
    want_sess = sessionize_batch(events, gap_minutes=30).select(
        "user_id", "session_start_us", "session_end_us",
        "n_events", "sum_value")
    got_s = rows_set(sess.select(*want_sess.columns), round_cols=("sum_value",))
    want_s = rows_set(want_sess, round_cols=("sum_value",))
    res["sessionize"] = {
        "micro_batches": nb, "rows": len(got_s),
        "match": got_s == want_s,
        "sec": round(time.monotonic() - t0, 2),
    }

    # --- windowed agg over the clean scrambled replay == batch agg
    t0 = time.monotonic()
    stream = load_events_stream(spark, clean_stage, max_files_per_trigger=1)
    agg, nb = run_to_memory_counted(
        windowed_event_agg(stream, window="1 day", watermark=TOLERANCE))
    agg = agg.filter(F.col("event_type") != "sentinel")
    want_agg = windowed_event_agg(events, window="1 day")
    got_s = rows_set(agg, round_cols=("sum_value",))
    want_s = rows_set(want_agg, round_cols=("sum_value",))
    res["windowed_agg"] = {
        "micro_batches": nb, "rows": len(got_s),
        "match": got_s == want_s,
        "sec": round(time.monotonic() - t0, 2),
    }
    return res


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--batches", type=int, default=20)
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(__file__), "..", "STREAM_SOAK.json"))
    args = ap.parse_args()

    spark = get_spark(app_name="streaming-soak")
    spark.sparkContext.setLogLevel("ERROR")

    workdir = tempfile.mkdtemp(prefix="stream_soak_")
    stage = stage_replay(spark, args.sf_dir, args.batches, workdir)
    clean_stage = stage_replay(spark, args.sf_dir, args.batches, workdir,
                               inject_dups=False, name="clean")
    n_files = len(glob.glob(os.path.join(stage, "*.parquet")))

    record = {
        "replay": (
            f"{args.sf_dir} events in {n_files} scrambled micro-batches "
            "(full-span disorder, seed=8 permutation) + every 10th "
            "event duplicated into the next-delivered batch; late "
            f"tolerance {TOLERANCE} >= the disorder span"
        ),
        "providers": {},
    }

    # one section per sf tier (round-8 verdict #8: the sf1 run must
    # ADD a section, not clobber the committed sf0.1 evidence); a
    # pre-sections file (bare {replay, providers}) migrates to its
    # sf0.1 slot on first write
    sf_label = os.path.basename(os.path.normpath(args.sf_dir)) \
        .replace("spark_graft_", "")
    existing: dict = {}
    if os.path.exists(args.out):
        try:
            with open(args.out) as fh:
                existing = json.load(fh)
        except (OSError, json.JSONDecodeError):
            existing = {}
    if "providers" in existing:  # legacy single-run layout
        existing = {"sf0.1": existing}

    def flush():
        existing[sf_label] = record
        with open(args.out, "w") as fh:
            json.dump(existing, fh, indent=1)

    for label, conf in (
        ("hdfs", {}),
        ("rocksdb", {"spark.sql.streaming.stateStore.providerClass": ROCKSDB}),
    ):
        with scoped_conf(spark, **conf) if conf else _nullcontext():
            res = check_twins(spark, args.sf_dir, stage, clean_stage,
                              label)
        record["providers"][label] = res
        print(f"[{label}] " + json.dumps(res), flush=True)
        flush()

    shutil.rmtree(workdir, ignore_errors=True)
    ok = all(
        v["match"]
        for p in record["providers"].values()
        for k, v in p.items() if isinstance(v, dict)
    )
    print("ALL MATCH" if ok else "MISMATCH", flush=True)
    return 0 if ok else 1


class _nullcontext:
    def __enter__(self):
        return None

    def __exit__(self, *a):
        return False


if __name__ == "__main__":
    sys.exit(main())
