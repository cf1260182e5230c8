from qwatch_spark.operators.dedup import latest_wins  # noqa: F401
from qwatch_spark.operators.rules import apply_rules  # noqa: F401
