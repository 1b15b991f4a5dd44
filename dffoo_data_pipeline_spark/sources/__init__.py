from dffoo_data_pipeline_spark.sources.readers import load_table, register_views

__all__ = ["load_table", "register_views"]
