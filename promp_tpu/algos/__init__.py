from promp_tpu.algos.base import MAMLAlgo  # noqa: F401
from promp_tpu.algos.dice_maml import DICEMAML, VPG_DICEMAML, magic_box  # noqa: F401
from promp_tpu.algos.promp import ProMP  # noqa: F401
from promp_tpu.algos.trpo_maml import TRPOMAML  # noqa: F401
from promp_tpu.algos.vpg_maml import VPGMAML  # noqa: F401
