from qwatch_spark.plans.snapshot_table import SnapshotTable  # noqa: F401
