from hudi_spark_plus_spark.table.commit_log import CommitLog
from hudi_spark_plus_spark.table.lake_table import LakeTable

__all__ = ["CommitLog", "LakeTable"]
