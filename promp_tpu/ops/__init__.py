from promp_tpu.ops import baselines, discounting, distributions  # noqa: F401
