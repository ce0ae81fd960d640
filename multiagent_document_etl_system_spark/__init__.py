"""PySpark-native analytics engine with the capability surface of
hsa12098/MultiAgent-Document-ETL-System (see /root/repo/SURVEY.md).

Corpus-at-a-time DataFrame engine: every reference "agent" is a
DataFrame -> DataFrame transformation; the LangGraph DAG becomes one lazy
Catalyst plan (SURVEY.md §2.7, §3.1).
"""

from multiagent_document_etl_system_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
