from datachain_spark.lake.table import LakeTable

__all__ = ["LakeTable"]
