from qwatch_spark.sources.feed import read_feed, read_feed_stream  # noqa: F401
