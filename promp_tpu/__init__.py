"""promp_tpu: a TPU-native meta-RL framework (ProMP-family algorithms).

Brand-new JAX/XLA implementation of the capabilities of the reference
``meta_policy_search`` package (jonasrothfuss/ProMP): MAML-family
gradient-based meta-RL (ProMP, MAML-TRPO, MAML-VPG, E-MAML, DICE-MAML) on
task-distribution environments, built TPU-first — on-device vectorized
envs, fused rollout scans, nested jax.grad through the inner adaptation,
and mesh-sharded meta-batches.
"""
import os as _os

__version__ = "0.1.0"

# Escape hatch for hosts that pin a platform via sitecustomize (where the
# JAX_PLATFORMS env var is overridden before user code runs): setting
# PROMP_TPU_PLATFORM=cpu forces the backend through jax.config instead.
if _os.environ.get("PROMP_TPU_PLATFORM"):
    import jax as _jax
    _jax.config.update("jax_platforms", _os.environ["PROMP_TPU_PLATFORM"])
