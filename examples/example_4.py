"""Example 4: multi-chip synchronous data parallelism (reference: rlpyt
examples/example_4.py — multi-GPU sync with DDP; here a mesh spec on
SyncRl replaces affinity codes + torch.distributed).

Run on a TPU slice, or locally with a virtual mesh:
  XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
      python examples/example_4.py
"""
from rlpyt_tpu.experiments.scripts.minatar_dqn import build_and_train
from rlpyt_tpu.parallel.mesh import MeshSpec


if __name__ == "__main__":
    build_and_train(
        "dqn",
        mesh=MeshSpec(dp=-1),   # all devices on the data-parallel axis
        config_overrides=dict(
            sampler=dict(batch_B=64),
            runner=dict(n_steps=500_000, log_interval_steps=50_000)),
    )
