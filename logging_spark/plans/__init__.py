from logging_spark.plans.job import PipelineResult, run_pipeline  # noqa: F401
