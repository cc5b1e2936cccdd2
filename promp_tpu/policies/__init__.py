from promp_tpu.policies.gaussian_mlp import (  # noqa: F401
    GaussianMLPPolicy, flatten_params, unflatten_params)

# The reference splits the policy into GaussianMLPPolicy (single-task) and
# MetaGaussianMLPPolicy (per-task parameter handling,
# meta_gaussian_mlp_policy.py). Here one functional policy covers both —
# per-task behavior is just a params pytree with a leading task axis
# (replicate()/vmap) — so the meta name is an alias for API parity.
MetaGaussianMLPPolicy = GaussianMLPPolicy
