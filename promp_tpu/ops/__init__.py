from promp_tpu.ops import baselines, discounting, distributions  # noqa: F401
from promp_tpu.ops.baseline_classes import (  # noqa: F401
    Baseline, LinearFeatureBaseline, LinearTimeBaseline, ZeroBaseline)
