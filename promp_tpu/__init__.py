"""promp_tpu: a TPU-native meta-RL framework (ProMP-family algorithms).

Brand-new JAX/XLA implementation of the capabilities of the reference
``meta_policy_search`` package (jonasrothfuss/ProMP): MAML-family
gradient-based meta-RL (ProMP, MAML-TRPO, MAML-VPG, E-MAML, DICE-MAML) on
task-distribution environments, built TPU-first — on-device vectorized
envs, fused rollout scans, nested jax.grad through the inner adaptation,
and mesh-sharded meta-batches.
"""
__version__ = "0.1.0"
