from promp_tpu.optimizers.adam import Adam, AdamState  # noqa: F401
from promp_tpu.optimizers.trpo import (  # noqa: F401
    ConjugateGradientOptimizer, FiniteDifferenceHvp, conjugate_gradients)

# reference naming aliases (maml_first_order_optimizer.py): the first-order
# optimizers are Adam wrappers; epochs/stat-reporting live in the algos
MAMLFirstOrderOptimizer = Adam
MAMLPPOOptimizer = Adam
