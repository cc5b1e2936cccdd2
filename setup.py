"""promp_tpu: TPU-native meta-RL framework (ProMP-family algorithms).

Analog of the reference setup.py (reference: setup.py:3-21, package
``meta_policy_search`` v0.1).
"""
from setuptools import find_packages, setup

setup(
    name="promp_tpu",
    version="0.1.0",
    description="TPU-native proximal meta-policy search (JAX/XLA)",
    packages=find_packages(include=["promp_tpu", "promp_tpu.*"]),
    python_requires=">=3.10",
    install_requires=["jax", "numpy", "scipy"],
)
