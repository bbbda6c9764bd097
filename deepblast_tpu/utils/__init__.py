from deepblast_tpu.utils.logging import MetricsLogger, tensorboard_to_csv  # noqa: F401
