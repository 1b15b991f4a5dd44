"""dffoo_data_pipeline_spark — a PySpark-native analytics engine.

Re-expresses the full data-processing surface of the reference batch ETL
pipeline (Jace743/dffoo-data-pipeline, surveyed in SURVEY.md) as idiomatic
Spark DataFrame/SQL plans, and extends it with the relational breadth and
LLM-data-pipeline operators the reference lacks (joins, window functions,
rollups, dedup, similarity search, text analysis, streaming) — every
operator designed for 100 TB scale: declarative plans Catalyst can optimize,
broadcast-bounded dimension joins, shuffle-conscious aggregation, and no
driver-side row loops.
"""

from dffoo_data_pipeline_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
