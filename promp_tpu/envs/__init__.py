"""Environment suite; importing registers every env in ENV_REGISTRY."""
from promp_tpu.envs.base import ENV_REGISTRY, Box, TaskEnv, make_env, register_env  # noqa: F401
from promp_tpu.envs.normalized import NormalizedEnv, normalize  # noqa: F401
from promp_tpu.envs.point.corner import MetaPointEnvCorner  # noqa: F401
from promp_tpu.envs.point.basic import (  # noqa: F401
    MetaPointEnv, MetaPointEnvCornerGoals, MetaPointEnvMomentum, MetaPointEnvV2)
from promp_tpu.envs.point.walls import MetaPointEnvWalls  # noqa: F401
