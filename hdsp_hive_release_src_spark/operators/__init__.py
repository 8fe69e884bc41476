"""Composable operators Spark lacks natively (SURVEY.md §2.3/§2.4).

Each is a composition of built-in DataFrame ops where semantics allow
(preferred — stays in Catalyst/codegen), with Pandas-UDF fallbacks only
where genuinely required.
"""

from hdsp_hive_release_src_spark.operators.asof import asof_join  # noqa: F401
from hdsp_hive_release_src_spark.operators.sessionize import sessionize  # noqa: F401
