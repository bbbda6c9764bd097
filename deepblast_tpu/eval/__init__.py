from deepblast_tpu.eval import score  # noqa: F401
