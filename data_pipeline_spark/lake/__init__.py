from data_pipeline_spark.lake.table import LakeTable, Snapshot  # noqa: F401
from data_pipeline_spark.lake.merge import merge_into  # noqa: F401
