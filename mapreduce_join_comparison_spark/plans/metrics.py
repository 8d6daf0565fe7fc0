"""Execution metrics — the reference's ``JoinStats`` re-expressed over
Spark's instrumentation (SURVEY.md §2.11 A2/B3).

Reference mapping:
  * job wall time      — ``JobUtils.time`` around ``waitForCompletion``
                         (``JobUtils.java:17-31``) → ``timed_action``;
                         failures RAISE (the reference records 0 ns and
                         the harness records it blindly — SURVEY §4.3).
  * map/reduce record counters — ``MAP_OUTPUT_RECORDS`` etc. harvested
                         in ``JoinSimulation.java:161-162`` → per-operator
                         ``numOutputRows`` from the executed plan's SQL
                         metrics (``collect_plan_metrics``).
  * task-time mean/median/max — ``JoinSimulation.java:34-70`` over
                         ``TaskReport``s → stage/task data from the
                         status tracker API (``task_time_summary``).
"""

from __future__ import annotations

import statistics
import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame


@dataclass
class RunStats:
    wall_seconds: float
    operator_rows: dict[str, list[int]] = field(default_factory=dict)
    shuffle_rows_written: int = 0
    output_rows: int | None = None


def timed_action(df: DataFrame, action=None) -> tuple[object, float]:
    """Run an action (default: noop-sink materialization) and return
    (result, wall seconds). Raises on failure rather than encoding it
    as a zero time."""
    t0 = time.monotonic()
    if action is None:
        df.write.format("noop").mode("overwrite").save()
        result = None
    else:
        result = action(df)
    return result, time.monotonic() - t0


def _seq(scala_seq) -> list:
    """Materialize a scala Seq through py4j (not directly iterable)."""
    return [scala_seq.apply(i) for i in range(scala_seq.size())]


def _walk(node):
    yield node
    for child in _seq(node.children()):
        yield from _walk(child)
    # AQE wraps subtrees; descend into the final plan of each stage
    name = node.nodeName()
    if name == "AdaptiveSparkPlan":
        yield from _walk(node.executedPlan())
    elif "QueryStage" in name:
        yield from _walk(node.plan())


def collect_plan_metrics(df: DataFrame) -> RunStats:
    """Execute ``df`` and harvest per-operator SQL metrics from the
    executed plan — the analog of reading Hadoop job counters after
    ``waitForCompletion``.

    Executes the DataFrame's OWN QueryExecution (``toRdd().count()``,
    no driver materialization of rows) — a sink write or ``df.count()``
    would run a fresh QueryExecution whose metrics this df's plan never
    sees."""
    t0 = time.monotonic()
    n_out = df._jdf.queryExecution().toRdd().count()
    wall = time.monotonic() - t0
    stats = RunStats(wall_seconds=round(wall, 4), output_rows=int(n_out))
    rows, shuffled = harvest_operator_rows(df)
    stats.operator_rows = rows
    stats.shuffle_rows_written = shuffled
    return stats


def harvest_operator_rows(df: DataFrame) -> tuple[dict, int]:
    """Read (operator → numOutputRows list, total shuffle records)
    from ``df``'s CURRENT QueryExecution without executing anything —
    for callers that already ran the plan (``df.collect()``,
    ``collect_plan_metrics``) and want the counters afterwards."""
    operator_rows: dict[str, list[int]] = {}
    shuffled = 0
    plan = df._jdf.queryExecution().executedPlan()
    for node in _walk(plan):
        name = node.nodeName()
        metrics = node.metrics()
        for key in _seq(metrics.keySet().toList()):
            metric = metrics.get(key).get()
            if key == "numOutputRows":
                operator_rows.setdefault(name, []).append(
                    int(metric.value())
                )
            elif key == "shuffleRecordsWritten":
                shuffled += int(metric.value())
    return operator_rows, shuffled


def peak_intermediate_rows(stats: RunStats) -> int | None:
    """Peak intermediate volume for the blocking family (round-7
    directive #5): the max ``numOutputRows`` over the executed plan's
    non-scan nodes. This is an UPPER BOUND on candidate-stage volume:
    the candidate generator (a join in the SimHash/LSH bucket forms,
    a Generate-explode after a per-sid aggregate in the indexed
    AllPairs probe) is always ≤ the peak, so an operator whose peak
    stays ≪ n(n-1)/2 demonstrably never materializes the quadratic
    pair space — the prune-ratio scale claim. Caveat (honesty over
    optics): on a WELL-pruned corpus a linear corpus-side node (the
    shingle-explode Generate, ~docs × shingles rows) can be the peak
    instead of the candidate join, so the reported ratio then
    overstates candidate volume and a candidate regression hiding
    below the explode volume is invisible until it crosses it — the
    pinned number still catches every superlinear blow-up, which is
    what the regression signal is for. Scans (and their ColumnarToRow
    mirrors) are excluded so input size isn't conflated with
    intermediate blow-up. Accepts a :class:`RunStats` or a bare
    operator→rows dict (:func:`harvest_operator_rows`)."""
    rows = stats.operator_rows if hasattr(stats, "operator_rows") \
        else stats
    best = None
    for name, vals in rows.items():
        if name.startswith("Scan") or name == "ColumnarToRow":
            continue
        m = max(vals)
        best = m if best is None else max(best, m)
    return best


def _stage_list(store):
    """``AppStatusStore.stageList`` has four Scala default arguments;
    py4j can't elide them, so fetch each ``stageList$default$N`` thunk
    explicitly. (The old one-arg call raised Py4JError on every Spark 4
    build and silently degraded the skew telemetry to zeros.)"""
    defaults = [
        store.__getattr__(f"stageList$default${i}")() for i in (2, 3, 4, 5)
    ]
    return store.stageList(None, *defaults)


def task_time_summary(spark) -> dict[str, float]:
    """mean / median / max of per-stage average task runtime (ms) —
    ``JoinSimulation.java:34-70`` over Spark's app-status store
    (per-task granularity would need a SparkListener; per-stage
    averages carry the same skew signal the reference's harness reads
    from ``TaskReport``s)."""
    per_stage: list[float] = []
    try:
        store = spark.sparkContext._jsc.sc().statusStore()
        stages = _stage_list(store)
        for i in range(stages.size()):
            sd = stages.apply(i)
            n = sd.numCompleteTasks()
            if n:
                per_stage.append(sd.executorRunTime() / n)
    except Exception:
        # statusStore is a private JVM surface that shifts across Spark
        # minors; task-skew telemetry is advisory, so a read failure
        # degrades to the explicit all-zero result below rather than
        # failing the job being measured
        per_stage = []
    if not per_stage:
        return {"mean_task_ms": 0.0, "median_task_ms": 0.0, "max_task_ms": 0.0}
    return {
        "mean_task_ms": round(statistics.fmean(per_stage), 2),
        "median_task_ms": round(statistics.median(per_stage), 2),
        "max_task_ms": round(max(per_stage), 2),
    }


def max_stage_id(spark) -> int:
    """Highest stage id seen so far — a checkpoint for
    :func:`peak_task_metrics`' ``since`` parameter."""
    try:
        store = spark.sparkContext._jsc.sc().statusStore()
        stages = _stage_list(store)
        best = -1
        for i in range(stages.size()):
            best = max(best, stages.apply(i).stageId())
        return best
    except Exception:
        return -1


def peak_task_metrics(spark, since: int = -1) -> dict:
    """PER-TASK maxima over every completed stage with id > ``since``
    — the hot-group skew signal (round-7 directive #4): a salt-split
    that works shows max_task_input_bytes and max_task_ms bounded
    near the per-task averages even on an adversarial corpus, while a
    lost guard shows one task owning a whole cluster's cross product.
    Reads the app-status store's task-level rows (the same data the
    UI's task table shows). Advisory telemetry: any read failure
    returns the explicit all-minus-one record."""
    out = {
        "max_task_ms": -1,
        "max_task_input_bytes": -1,
        "max_task_shuffle_read_bytes": -1,
        "max_task_shuffle_write_bytes": -1,
        "n_tasks": 0,
    }
    try:
        store = spark.sparkContext._jsc.sc().statusStore()
        stages = _stage_list(store)
        for i in range(stages.size()):
            sd = stages.apply(i)
            if sd.stageId() <= since or not sd.numCompleteTasks():
                continue
            tasks = store.taskList(sd.stageId(), sd.attemptId(),
                                   2_147_483_647)
            for j in range(tasks.size()):
                tm = tasks.apply(j).taskMetrics()
                if not tm.isDefined():
                    continue
                m = tm.get()
                sr = m.shuffleReadMetrics()
                out["n_tasks"] += 1
                out["max_task_ms"] = max(
                    out["max_task_ms"], int(m.executorRunTime()))
                out["max_task_input_bytes"] = max(
                    out["max_task_input_bytes"],
                    int(m.inputMetrics().bytesRead()))
                out["max_task_shuffle_read_bytes"] = max(
                    out["max_task_shuffle_read_bytes"],
                    int(sr.localBytesRead()) + int(sr.remoteBytesRead()))
                out["max_task_shuffle_write_bytes"] = max(
                    out["max_task_shuffle_write_bytes"],
                    int(m.shuffleWriteMetrics().bytesWritten()))
    except Exception:
        pass
    return out
