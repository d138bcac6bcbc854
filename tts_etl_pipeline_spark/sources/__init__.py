from tts_etl_pipeline_spark.sources.tables import TABLE_NAMES, register_views, table

__all__ = ["TABLE_NAMES", "register_views", "table"]
