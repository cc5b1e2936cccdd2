"""ProMP on HalfCheetah-RandVel (the north-star MuJoCo meta-benchmark).

Entry point mirroring reference run_scripts/pro-mp_run_mujoco.py
(env HalfCheetahRandVelEnv, same hyperparameters).
"""
import os
import sys

# Runnable straight from a checkout: a script's sys.path[0] is run_scripts/,
# so add the repo root when promp_tpu isn't pip-installed.
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import json
import time

from promp_tpu.run import run_experiment

DEFAULT_CONFIG = {
    'seed': 1,
    'algo': 'ProMP',
    'baseline': 'LinearFeatureBaseline',
    'env': 'HalfCheetahRandVelEnv',
    'rollouts_per_meta_task': 20,
    'max_path_length': 100,
    'parallel': True,
    'discount': 0.99,
    'gae_lambda': 1,
    'normalize_adv': True,
    'hidden_sizes': (64, 64),
    'learn_std': True,
    'inner_lr': 0.1,
    'learning_rate': 1e-3,
    'num_promp_steps': 5,
    'clip_eps': 0.3,
    'target_inner_step': 0.01,
    'init_inner_kl_penalty': 5e-4,
    'adaptive_inner_kl_penalty': False,
    'n_itr': 1001,
    'meta_batch_size': 40,
    'num_inner_grad_steps': 1,
}

if __name__ == "__main__":
    parser = argparse.ArgumentParser(description='ProMP on MuJoCo-class envs')
    parser.add_argument('--config_file', type=str, default='')
    parser.add_argument('--dump_path', type=str,
                        default=os.path.join(
                            os.path.dirname(os.path.dirname(
                                os.path.realpath(__file__))),
                            'data', 'pro-mp-mujoco', f'run_{int(time.time())}'))
    parser.add_argument('--n_itr', type=int, default=None)
    args = parser.parse_args()
    if args.config_file:
        with open(args.config_file) as f:
            config = json.load(f)
    else:
        config = dict(DEFAULT_CONFIG)
    if args.n_itr is not None:
        config['n_itr'] = args.n_itr
    run_experiment(config, dump_path=args.dump_path)
