from qwatch_spark.streaming.runner import run_stream  # noqa: F401
