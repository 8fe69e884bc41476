"""Materialization discipline for multi-consumer intermediates.

Two tiers, chosen by ROW COUNT of the intermediate (SURVEY.md §4;
r12 scan-sweep + r13 advice):

* **Reduced tables** (aggregate / edge / vocab / model-sized — rows
  bounded by a dimension, a group count, or a sketch size, NOT by the
  fact table): ``localCheckpoint(eager=True)``. Cheap to rebuild the
  plan from, tiny to store, and cutting lineage is exactly what the
  iterative operators need (operators/components.py discipline). An
  executor loss costs a re-run of a small job.

* **Fact-row-count tables** (one row per fact row, however narrow the
  projection): ``persist_fact_rows`` → ``persist(DISK_ONLY)``, never
  ``localCheckpoint``. localCheckpoint materializes to NON-RELIABLE
  executor-local storage AND severs lineage — on executor loss (or
  any scale-in under dynamic allocation) the data is simply gone and
  the whole query fails. DISK_ONLY persist keeps the bytes off-heap
  and off-memory but RETAINS lineage, so a lost block is recomputed
  from the pruned columnar scan instead of killing the query. At
  100 TB the trade per consumer beyond the first is: one serialized
  local-disk read of the narrow projection vs a re-scan of the full
  columnar table; when local disk is the scarcer resource, dropping
  the persist and paying the second pruned scan is the documented
  fallback (see q17's pin in tests/test_scan_counts.py).

Runtime truth for both tiers is pinned by
tests/test_scan_counts.py::test_runtime_fact_scans_pinned via
plans/runtime.py (executed-scan counting — plan-leaf pins cannot see
scans that run at build time behind a checkpoint).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.storagelevel import StorageLevel


def persist_fact_rows(df: DataFrame) -> DataFrame:
    """DISK_ONLY-persist a fact-row-count intermediate (see module
    docstring for why this is never localCheckpoint)."""
    return df.persist(StorageLevel.DISK_ONLY)
