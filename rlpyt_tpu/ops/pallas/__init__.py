"""Pallas TPU kernels for the framework's hot ops.

Each kernel has a reference jnp implementation in its module; tests
compare the two in interpreter mode (CPU).  Kernels are opt-in via the
owning module's ``impl`` switches — GSPMD cannot auto-partition a
``pallas_call``, so sharded (SyncRl) programs keep the jnp path while
single-chip hot loops select pallas.
"""
