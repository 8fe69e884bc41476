"""Runtime (executed) scan counting via the SQL status store.

tests/test_scan_counts.py pins `Location` leaves in the FINAL plan,
which is blind to two things (r13 advice item):

* scans that run at BUILD time, behind an eager localCheckpoint —
  the final plan shows `Scan ExistingRDD`, asserting nothing about
  the real IO that produced it;
* cached-plan scan nodes that appear in the plan graph but never
  execute (an `InMemoryTableScan` hit shows the parquet scan of its
  build plan without re-running it).

This module counts scans that ACTUALLY EXECUTED: every Spark action
is a SQL execution in `SharedState.statusStore()`; a plan-graph scan
node only has recorded metric values in the executions where it ran.
Counting distinct `number of output rows` accumulator ids of matching
scan nodes that carry recorded values therefore counts real scan
executions — build-time checkpoint jobs, broadcast-exchange jobs and
cache builds included, cache hits excluded.

Local/classic mode only (needs the JVM handle); tests skip on
Connect.
"""

from __future__ import annotations

from pyspark.sql import SparkSession


def snapshot_executions(spark: SparkSession) -> set[int]:
    """Ids of all SQL executions so far (pass to executed_scans)."""
    store = spark._jsparkSession.sharedState().statusStore()
    lst = store.executionsList()
    return {lst.apply(i).executionId() for i in range(lst.size())}


def executed_scans(
    spark: SparkSession, before: set[int], table: str
) -> int:
    """Distinct file-scan executions touching `table` in every SQL
    execution recorded since `before` (a snapshot_executions set).

    A scan plan node is counted iff its `number of output rows`
    accumulator has a recorded value in some execution — i.e. the
    scan ran. Accumulator ids are deduped across executions, so a
    shared cached-build plan counts once however many
    InMemoryTableScan consumers display it.
    """
    # the status store is fed asynchronously off the listener bus
    spark.sparkContext._jsc.sc().listenerBus().waitUntilEmpty()
    store = spark._jsparkSession.sharedState().statusStore()
    lst = store.executionsList()
    ran: set[int] = set()
    # match the dataset PATH token, not the bare name: a bare
    # substring also matches column names in checkpoint-RDD leaves
    # (a column called n_events made a weekday query count 3 "events
    # scans" when the real file was read once), and an unanchored
    # "<table>.parquet" still matches any dataset whose directory name
    # merely ENDS with the table name (raw_events.parquet would count
    # as events) — so anchor on the path separator (r13 advice)
    token = table if table.endswith(".parquet") else f"/{table}.parquet"
    for i in range(lst.size()):
        exec_data = lst.apply(i)
        eid = exec_data.executionId()
        if eid in before:
            continue
        metrics = store.executionMetrics(eid)  # Map[accumId, value]
        nodes = store.planGraph(eid).allNodes()
        for j in range(nodes.size()):
            node = nodes.apply(j)
            if not node.name().startswith("Scan"):
                continue
            if token not in node.desc():
                continue
            node_metrics = node.metrics()
            for k in range(node_metrics.size()):
                m = node_metrics.apply(k)
                if m.name() == "number of output rows":
                    acc_id = m.accumulatorId()
                    if metrics.contains(acc_id):
                        ran.add(acc_id)
    return len(ran)
