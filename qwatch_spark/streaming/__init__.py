from qwatch_spark.streaming.runner import run_entity_stream, run_stream  # noqa: F401
