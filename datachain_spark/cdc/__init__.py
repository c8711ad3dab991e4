from datachain_spark.cdc.feed import FeedSpec, gen_events_df, gen_events_py, write_feed
from datachain_spark.cdc.apply import apply_batch, replay_feed_dir
from datachain_spark.cdc.oracle import oracle_replay

__all__ = [
    "FeedSpec",
    "gen_events_df",
    "gen_events_py",
    "write_feed",
    "apply_batch",
    "replay_feed_dir",
    "oracle_replay",
]
