from hdsp_hive_release_src_spark.plans.asserts import (  # noqa: F401
    explain_str,
    has_broadcast_join,
    has_cartesian,
    pushed_filters,
)
from hdsp_hive_release_src_spark.plans.runtime import (  # noqa: F401
    executed_scans,
    snapshot_executions,
)
