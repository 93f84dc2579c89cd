"""rlpyt_tpu — a TPU-native deep RL framework with rlpyt's capability surface.

Built from scratch for JAX/XLA: vectorized envs stepped in lockstep under
jit replace rlpyt's sampler process tree; replay lives in device HBM;
algorithms are pure update functions; scaling rides jax.sharding meshes.
"""
__version__ = "0.1.0"
