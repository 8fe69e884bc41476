"""One-shot audit: count fact-table Location leaves in the formatted
plan of EVERY registered query and print those with ≥3 scans of any
one table (the q18/dsir defect class). Build-time scans hidden behind
localCheckpoint/parquet materialization are not visible here — this
flags the lazy-plan offenders only.

Usage: PYTHONPATH=/root/repo python tools/scan_sweep.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

TABLES = ("lineitem", "orders", "events", "documents", "embeddings")


def main() -> None:
    # r15 (r14 ADVICE): plan-only sweep — keep checkpoint-using
    # queries lazy and their inner Location leaves visible (see
    # bnlj_audit.py). This widens visibility vs the ≤r14 baseline, so
    # a flag NEW relative to r14 needs adjudication, not automatic
    # alarm. Set INSIDE main(), never at import (tests import these
    # tools for helpers; an import-time env mutation would bypass the
    # checkpoint discipline for the whole test process).
    os.environ["SPARK_GRAFT_KEEP_PLAN"] = "1"
    from hdsp_hive_release_src_spark import registry
    from hdsp_hive_release_src_spark.plans import explain_str
    from hdsp_hive_release_src_spark.session import get_spark

    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark(app_name="scan_sweep", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    registry.load_all()
    flagged = 0
    for name in sorted(registry.QUERIES):
        try:
            plan = explain_str(registry.QUERIES[name](spark, sf))
        except Exception as ex:  # streaming/ddl queries may not plan
            print(f"# {name}: unplannable ({type(ex).__name__})",
                  flush=True)
            continue
        counts = {
            t: sum(
                1
                for ln in plan.splitlines()
                if "Location" in ln and t in ln
            )
            for t in TABLES
        }
        hot = {t: c for t, c in counts.items() if c >= 3}
        if hot:
            flagged += 1
            print(f"{name}: {hot}", flush=True)
    print(f"# done: {flagged} queries with >=3 scans of one table",
          flush=True)


if __name__ == "__main__":
    main()
