"""Utility subpackage: logging, checkpoints, native bindings, misc helpers."""
from promp_tpu.utils.misc import (  # noqa: F401
    concat_tensor_dict_list,
    explained_variance_1d,
    extract,
    set_seed,
    stack_tensor_dict_list,
)
