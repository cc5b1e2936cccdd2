"""Environment suite; importing registers every env in ENV_REGISTRY."""
from promp_tpu.envs.base import ENV_REGISTRY, Box, TaskEnv, make_env, register_env  # noqa: F401
from promp_tpu.envs.normalized import NormalizedEnv, normalize  # noqa: F401
from promp_tpu.envs.point.corner import MetaPointEnvCorner  # noqa: F401
from promp_tpu.envs.point.basic import (  # noqa: F401
    MetaPointEnv, MetaPointEnvCornerGoals, MetaPointEnvMomentum, MetaPointEnvV2)
from promp_tpu.envs.point.walls import MetaPointEnvWalls  # noqa: F401
from promp_tpu.envs.mujoco.locomotion import (  # noqa: F401
    HalfCheetahRandDirecEnv, HalfCheetahRandVelEnv, HopperEnv,
    SwimmerRandVelEnv, Walker2DRandDirecEnv, Walker2DRandVelEnv)
from promp_tpu.envs.mujoco.ant import (  # noqa: F401
    AntRandDirec2DEnv, AntRandDirecEnv, AntRandGoalEnv)
from promp_tpu.envs.mujoco.humanoid import (  # noqa: F401
    HumanoidRandDirec2DEnv, HumanoidRandDirecEnv)
from promp_tpu.envs.mujoco.rand_params import (  # noqa: F401
    HalfCheetahRandParamsEnv, HopperRandParamsEnv, Walker2DRandParamsEnv)
from promp_tpu.envs.sawyer import (  # noqa: F401
    SawyerDoorEnv, SawyerPickAndPlaceEnv, SawyerPushEnv, SawyerPushSimpleEnv)
