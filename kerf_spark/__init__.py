"""kerf_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of kevinlawler/kerf (columnar tick-series
DBMS + APL-family vector language), re-expressed Spark-first.

Layout:
    session    — SparkSession bootstrap (ns-timestamps, AQE, Arrow)
    functions  — scalar/temporal/null-semantics Column library
    operators  — relational verbs, window adverbs, as-of/interval joins,
                 dedup, similarity search, text analysis, multimodal
    sources    — parquet/CSV/JSON IO + the workspace catalog
    plans      — kerf-SQL text front-end
    streaming  — Structured Streaming ingestion (feed-handler surface)
"""

from .operators.asof import asof_join, asof_join_merge, window_join
from .operators.windows import chunked_moving, global_rank, global_scan
from .plans.kerfsql import kerf_sql
from .session import configure, get_spark
from .sources.catalog import Workspace

__all__ = [
    "get_spark",
    "configure",
    "asof_join",
    "asof_join_merge",
    "window_join",
    "kerf_sql",
    "Workspace",
    "global_scan",
    "global_rank",
    "chunked_moving",
]
__version__ = "0.1.0"
