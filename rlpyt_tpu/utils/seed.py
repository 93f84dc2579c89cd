"""Seeding (reference: rlpyt/utils/seed.py:set_seed, make_seed ~L5-40).

The JAX path needs no global seeding — all randomness is threaded through
counter-based PRNG keys, which is what makes fixed-seed trajectories exact
across sharding layouts (SURVEY.md §7.3).  These helpers cover the host
edges (numpy/python RNGs in env farms, experiment launchers) and keep the
reference's per-rank offset convention.
"""
from __future__ import annotations

import random
import time

import numpy as np


def set_seed(seed: int) -> None:
    """Seed host-side RNGs (rlpyt set_seed; torch omitted — unused)."""
    seed = int(seed) % (2**32)
    random.seed(seed)
    np.random.seed(seed)


def make_seed() -> int:
    """Entropy-derived seed (rlpyt make_seed: time-based mixing)."""
    t = time.time()
    return int(1e6 * (t - int(t))) % (2**31)


def worker_seed(seed: int, rank: int) -> int:
    """Per-worker offset (rlpyt initialize_worker: seed + rank)."""
    return (int(seed) + int(rank)) % (2**31)
