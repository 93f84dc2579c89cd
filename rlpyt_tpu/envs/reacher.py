"""Reacher — on-device 2-link planar arm (continuous torque control).

The role of rlpyt's MuJoCo Reacher path (rlpyt/envs/gym.py:GymEnvWrapper
over mujoco-py) as a *pure-JAX* env: standard two-link manipulator
dynamics (no gravity — the arm moves in the horizontal plane, as in the
MuJoCo model), semi-implicit Euler with substeps, viscous joint damping.
Observation/reward layout follows gymnasium Reacher-v5:

    obs  = [cos q1, cos q2, sin q1, sin q2, target_xy(2), qdot(2),
            (fingertip - target)_xy(2)]                      -> (10,)
    rew  = -||fingertip - target|| - ctrl_cost * ||a||^2
    episode: fixed horizon (truncation only), like the MuJoCo task.

Exact-MuJoCo parity runs ride the host farm (envs/host.py with
gymnasium[mujoco]); this env is the lockstep/vmap path so SAC/TD3/DDPG
train fully on device at MinAtar-class throughput.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from rlpyt_tpu.envs.base import Env, EnvStep
from rlpyt_tpu.spaces import FloatBox


class ReacherState(NamedTuple):
    q: jax.Array       # (2,) joint angles
    qd: jax.Array      # (2,) joint velocities
    target: jax.Array  # (2,) goal position in the plane
    t: jax.Array


class Reacher(Env):
    """Two-link torque-controlled reaching task."""

    l1 = 0.1      # link lengths (gym Reacher geometry)
    l2 = 0.11
    m1 = 0.05     # link masses
    m2 = 0.05
    damping = 0.001
    gear = 0.01   # torque scale (actions in [-1, 1])
    dt = 0.01
    substeps = 2  # => 0.02 s per control step (gym frame_skip=2)
    target_radius = 0.2
    ctrl_cost = 0.1
    max_vel = 20.0

    def __init__(self, max_steps: int = 50):
        self.max_steps = max_steps

    @property
    def observation_space(self):
        return FloatBox(low=-jnp.inf, high=jnp.inf, shape=(10,))

    @property
    def action_space(self):
        return FloatBox(low=-1.0, high=1.0, shape=(2,))

    @property
    def horizon(self):
        return self.max_steps

    def _fingertip(self, q):
        x = self.l1 * jnp.cos(q[0]) + self.l2 * jnp.cos(q[0] + q[1])
        y = self.l1 * jnp.sin(q[0]) + self.l2 * jnp.sin(q[0] + q[1])
        return jnp.stack([x, y])

    def _obs(self, s: ReacherState) -> jax.Array:
        delta = self._fingertip(s.q) - s.target
        return jnp.concatenate([
            jnp.cos(s.q), jnp.sin(s.q), s.target, s.qd, delta,
        ]).astype(jnp.float32)

    def _qdd(self, q, qd, tau):
        # Manipulator equation M(q) qdd + C(q, qd) = tau - b qd  (no gravity).
        lc1, lc2 = self.l1 / 2, self.l2 / 2
        i1 = self.m1 * self.l1**2 / 12.0
        i2 = self.m2 * self.l2**2 / 12.0
        c2 = jnp.cos(q[1])
        s2 = jnp.sin(q[1])
        a1 = i1 + i2 + self.m1 * lc1**2 + self.m2 * (self.l1**2 + lc2**2)
        a2 = self.m2 * self.l1 * lc2
        a3 = i2 + self.m2 * lc2**2
        m11 = a1 + 2 * a2 * c2
        m12 = a3 + a2 * c2
        m22 = a3
        # Coriolis/centrifugal
        c1 = -a2 * s2 * qd[1] * (2 * qd[0] + qd[1])
        cc2 = a2 * s2 * qd[0]**2
        rhs = tau - self.damping * qd - jnp.stack([c1, cc2])
        det = m11 * m22 - m12 * m12
        qdd0 = (m22 * rhs[0] - m12 * rhs[1]) / det
        qdd1 = (m11 * rhs[1] - m12 * rhs[0]) / det
        return jnp.stack([qdd0, qdd1])

    def reset(self, key, params=None):
        kq, kr, ka = jax.random.split(key, 3)
        q = jax.random.uniform(kq, (2,), minval=-0.1, maxval=0.1)
        # uniform in the reachable disk (sqrt-radius trick, jit-safe vs
        # gym's rejection sampling)
        r = self.target_radius * jnp.sqrt(
            jax.random.uniform(kr, (), minval=0.0025, maxval=1.0))
        ang = jax.random.uniform(ka, (), minval=-jnp.pi, maxval=jnp.pi)
        target = jnp.stack([r * jnp.cos(ang), r * jnp.sin(ang)])
        s = ReacherState(q, jnp.zeros((2,)), target, jnp.zeros((), jnp.int32))
        return s, self._obs(s)

    def step(self, key, state: ReacherState, action, params=None):
        tau = self.gear * jnp.clip(action, -1.0, 1.0)
        q, qd = state.q, state.qd
        for _ in range(self.substeps):  # unrolled: substeps is tiny + static
            qdd = self._qdd(q, qd, tau)
            qd = jnp.clip(qd + self.dt * qdd, -self.max_vel, self.max_vel)
            q = q + self.dt * qd
        t = state.t + 1
        new_state = ReacherState(q, qd, state.target, t)
        dist = jnp.linalg.norm(self._fingertip(q) - state.target)
        reward = (-dist - self.ctrl_cost * jnp.sum(action**2)
                  ).astype(jnp.float32)
        truncated = t >= self.max_steps
        info = {"timeout": truncated}
        return new_state, EnvStep(self._obs(new_state), reward,
                                  truncated, info)

    def example_info(self):
        return {"timeout": jnp.zeros((), jnp.bool_)}
