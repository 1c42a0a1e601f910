from fluent_server_spark.plans.pipeline import PipelineConfig, TranscriptPipeline  # noqa: F401
