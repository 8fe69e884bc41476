"""Capture ``.explain("formatted")`` for named registered queries.

Writes one ``<outdir>/<name>_<tag>.txt`` per query — the judge-facing
plan evidence for an optimization round (plans/r16/<q>_before.txt /
_after.txt). Runs under SPARK_GRAFT_KEEP_PLAN=1, same as the standing
plan sweeps, so checkpoint-rooted queries stay lazy and their inner
plans stay visible.

Usage:
  PYTHONPATH=<repo> python tools/capture_plans.py <outdir> <tag> \
      <name> [<name> ...]
Optional env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.001).
"""

from __future__ import annotations

import os
import sys
from pathlib import Path


def main() -> None:
    os.environ["SPARK_GRAFT_KEEP_PLAN"] = "1"
    from hdsp_hive_release_src_spark import registry
    from hdsp_hive_release_src_spark.plans import explain_str
    from hdsp_hive_release_src_spark.session import get_spark

    outdir, tag, *names = sys.argv[1:]
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    Path(outdir).mkdir(parents=True, exist_ok=True)
    spark = get_spark(app_name="capture_plans", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    registry.load_all()
    for name in names:
        try:
            plan = explain_str(registry.QUERIES[name](spark, sf))
        except Exception as ex:
            plan = f"UNPLANNABLE: {type(ex).__name__}: {ex}"
        Path(outdir, f"{name}_{tag}.txt").write_text(plan + "\n")
        print(f"# wrote {name}_{tag}.txt ({len(plan)} chars)", flush=True)


if __name__ == "__main__":
    main()
