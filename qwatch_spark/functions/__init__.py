from qwatch_spark.functions.text import (  # noqa: F401
    extract_text_bytes,
    extract_text_udf,
)
