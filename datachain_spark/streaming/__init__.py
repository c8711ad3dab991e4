from datachain_spark.streaming.ops import sessionize_stateful, windowed_counts

__all__ = ["windowed_counts", "sessionize_stateful"]
