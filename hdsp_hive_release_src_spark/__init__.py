"""PySpark-native analytics engine with the query surface of the
``andyzhang86/hdsp-hive-release-src`` reference (an Apache Hive release
fork — see /root/reference/README.md:1-4; capability map in SURVEY.md).

Everything is expressed Spark-first: DataFrame/SQL plans optimized by
Catalyst + Tungsten, Pandas UDFs only where built-ins can't express the
semantics (as-of join, multimodal decode).
"""

__version__ = "0.1.0"

from hdsp_hive_release_src_spark.session import get_spark  # noqa: F401
from hdsp_hive_release_src_spark.catalog import Catalog  # noqa: F401
