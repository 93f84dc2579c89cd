"""On-device planar locomotion environments (SURVEY §2.12 mujoco-py →
on-device physics row; reference workloads: gym Hopper/HalfCheetah via
rlpyt/envs/gym.py:GymEnvWrapper — here the physics itself runs under
jit/vmap so thousands of lockstep env lanes train QPG algos entirely
on-chip).

Design (TPU-first, not a MuJoCo port): each robot is a planar kinematic
chain in generalized coordinates q = [x, z, θ_0..θ_n] (absolute link
angles).  Dynamics come from the Lagrangian by automatic
differentiation — no hand-derived equations of motion:

    L(q, q̇) = Σ_i ½ m_i |J_i(q) q̇|² + ½ I_i θ̇_i² − Σ_i m_i g z_i(q)
    M(q)        = ∂²L/∂q̇²                    (mass matrix, exact: L is
                                               quadratic in q̇)
    q̈           = M⁻¹ (∂L/∂q − (∂²L/∂q̇∂q) q̇ + Q_act + Q_contact)

with ground contact as a spring-damper normal force + Coulomb-capped
tangential friction at designated contact points, mapped to generalized
forces through the contact-point Jacobian transpose.  Everything is a
few small (≤9×9) dense ops — ideal shape for vmap over env lanes; the
per-step cost is dominated by one `linalg.solve` per substep.

This is intentionally NOT MuJoCo-exact (MJX is unavailable in this
image); it is a locomotion-class benchmark with contact, underactuation,
and torque control, for exercising DDPG/TD3/SAC at on-device scale.
"""
from __future__ import annotations

from typing import NamedTuple, Sequence, Tuple

import jax
import jax.numpy as jnp

from rlpyt_tpu.envs.base import Env, EnvStep
from rlpyt_tpu.spaces import FloatBox


class ChainSpec(NamedTuple):
    """A planar articulated tree: link i starts at ``attach_frac[i]``
    along its parent link ``parents[i]`` (parent −1 = the free base
    point (x, z)) and extends ``length[i]`` in direction
    (sin θ_i, −cos θ_i).  Branching (a torso with several legs) is just
    two links sharing a parent."""

    lengths: Tuple[float, ...]
    masses: Tuple[float, ...]
    parents: Tuple[int, ...]         # parent link index, -1 = base point
    attach_frac: Tuple[float, ...]   # where on the parent link i attaches
    # actuated joints: (link_a, link_b, torque_scale) — torque acts +
    # on link_b, − on link_a (relative joint torque in absolute coords)
    joints: Tuple[Tuple[int, int, float], ...]
    contacts: Tuple[Tuple[int, float], ...]  # (link, frac along link)


def _link_frames(spec: ChainSpec, q: jax.Array):
    """Start points, directions, CoM positions of every link."""
    x, z = q[0], q[1]
    th = q[2:]
    dirs = jnp.stack([jnp.sin(th), -jnp.cos(th)], axis=-1)  # [n, 2]
    base = jnp.stack([x, z])
    starts = []
    for i in range(len(spec.lengths)):
        p = spec.parents[i]
        if p < 0:
            starts.append(base)
        else:
            starts.append(starts[p]
                          + dirs[p] * (spec.attach_frac[i]
                                       * spec.lengths[p]))
    starts = jnp.stack(starts)                               # [n, 2]
    lengths = jnp.asarray(spec.lengths)[:, None]
    coms = starts + dirs * lengths * 0.5
    return starts, dirs, coms


def _contact_points(spec: ChainSpec, q: jax.Array) -> jax.Array:
    starts, dirs, _ = _link_frames(spec, q)
    pts = [starts[l] + dirs[l] * (f * spec.lengths[l])
           for l, f in spec.contacts]
    return jnp.stack(pts)                                    # [c, 2]


class PlanarChainEnv(Env):
    """Base planar-locomotion env; subclasses set the chain + reward."""

    gravity = 9.81
    # Explicit contact springs bound the stable step: with k_p=6e3 and
    # the lightest links ~1.5 kg, ω ≈ 63 rad/s → dt·ω ≈ 0.13 at
    # dt=2 ms.  16 substeps give a 32 ms control step (gym Hopper's
    # frame_skip=4 × 8 ms).
    dt = 0.002
    n_frames = 16         # physics substeps per env step (action repeat)
    contact_kp = 6_000.0  # ground spring
    contact_kd = 300.0    # ground damper (normal velocity)
    friction_visc = 30.0  # tangential viscous coefficient
    friction_mu = 1.0     # Coulomb cap
    joint_damping = 0.5

    spec: ChainSpec = None
    max_steps = 1000
    init_height = 1.3
    torso_obs_min_z = 0.0

    # ------------------------------------------------------------------

    def __init__(self, max_steps: int = 1000):
        self.max_steps = max_steps
        n = len(self.spec.lengths)
        self.nq = 2 + n
        self.na = len(self.spec.joints)
        # moment of inertia of a uniform rod about its center
        self._inertia = jnp.asarray(
            [m * l * l / 12.0
             for m, l in zip(self.spec.masses, self.spec.lengths)])
        self._masses = jnp.asarray(self.spec.masses)

    @property
    def observation_space(self):
        # [z, θ..., ẋ, ż, θ̇...]  (x excluded, as in gym locomotion)
        d = 2 * self.nq - 1
        return FloatBox(low=[-1e3] * d, high=[1e3] * d, shape=(d,))

    @property
    def action_space(self):
        return FloatBox(low=[-1.0] * self.na, high=[1.0] * self.na,
                        shape=(self.na,))

    @property
    def horizon(self):
        return self.max_steps

    # ------------------------------------------------------------------

    def _lagrangian(self, q: jax.Array, qd: jax.Array) -> jax.Array:
        def coms_fn(qq):
            return _link_frames(self.spec, qq)[2].reshape(-1)

        J = jax.jacfwd(coms_fn)(q)                 # [2n, nq]
        v = (J @ qd).reshape(-1, 2)                # link CoM velocities
        ke = 0.5 * jnp.sum(self._masses * jnp.sum(v * v, axis=-1))
        ke = ke + 0.5 * jnp.sum(self._inertia * qd[2:] ** 2)
        coms = _link_frames(self.spec, q)[2]
        pe = self.gravity * jnp.sum(self._masses * coms[:, 1])
        return ke - pe

    def _generalized_contact(self, q, qd):
        def pts_fn(qq):
            return _contact_points(self.spec, qq).reshape(-1)

        pts = _contact_points(self.spec, q)        # [c, 2]
        Jc = jax.jacfwd(pts_fn)(q)                 # [2c, nq]
        vel = (Jc @ qd).reshape(-1, 2)             # [c, 2]
        depth = -pts[:, 1]                          # >0 when below ground
        in_contact = depth > 0.0
        fn = jnp.where(
            in_contact,
            self.contact_kp * depth
            - self.contact_kd * jnp.minimum(vel[:, 1], 0.0),
            0.0)
        fn = jnp.maximum(fn, 0.0)
        # Coulomb-capped viscous tangential friction
        ft_raw = -self.friction_visc * vel[:, 0] * in_contact
        ft = jnp.clip(ft_raw, -self.friction_mu * fn,
                      self.friction_mu * fn)
        F = jnp.stack([ft, fn], axis=-1).reshape(-1)  # [2c]
        return Jc.T @ F

    def _generalized_action(self, action: jax.Array) -> jax.Array:
        tau = jnp.zeros((self.nq,))
        for k, (a, b, scale) in enumerate(self.spec.joints):
            t = jnp.clip(action[k], -1.0, 1.0) * scale
            tau = tau.at[2 + b].add(t)
            tau = tau.at[2 + a].add(-t)
        return tau

    def _qdd(self, q, qd, action):
        M = jax.hessian(self._lagrangian, argnums=1)(q, qd)
        dLdq = jax.grad(self._lagrangian, argnums=0)(q, qd)
        # Coriolis/centrifugal: (∂²L/∂q̇∂q) q̇
        C = jax.jacfwd(jax.grad(self._lagrangian, argnums=1),
                       argnums=0)(q, qd) @ qd
        Q = (self._generalized_action(action)
             + self._generalized_contact(q, qd))
        damp = jnp.concatenate(
            [jnp.zeros(2), -self.joint_damping * qd[2:]])
        rhs = dLdq - C + Q + damp
        M = M + 1e-9 * jnp.eye(self.nq)
        return jnp.linalg.solve(M, rhs)

    # ------------------------------------------------------------------

    class State(NamedTuple):
        q: jax.Array
        qd: jax.Array
        t: jax.Array

    def _init_q(self, key) -> Tuple[jax.Array, jax.Array]:
        raise NotImplementedError

    def reset(self, key, params=None):
        q, qd = self._init_q(key)
        s = self.State(q, qd, jnp.zeros((), jnp.int32))
        return s, self._obs(s)

    def _obs(self, s: "PlanarChainEnv.State") -> jax.Array:
        return jnp.concatenate([s.q[1:], s.qd]).astype(jnp.float32)

    def _healthy(self, q, qd) -> jax.Array:
        raise NotImplementedError

    def _reward(self, q, qd, q_new, qd_new, action) -> jax.Array:
        raise NotImplementedError

    def step(self, key, state: "PlanarChainEnv.State", action,
             params=None):
        action = jnp.asarray(action, jnp.float32).reshape((self.na,))

        def substep(carry, _):
            q, qd = carry
            qdd = self._qdd(q, qd, action)
            qd2 = jnp.clip(qd + self.dt * qdd, -100.0, 100.0)
            q2 = q + self.dt * qd2          # semi-implicit Euler
            return (q2, qd2), None

        (q2, qd2), _ = jax.lax.scan(substep, (state.q, state.qd), None,
                                    length=self.n_frames)
        t = state.t + 1
        new_state = self.State(q2, qd2, t)
        healthy = self._healthy(q2, qd2)
        terminated = ~healthy
        truncated = t >= self.max_steps
        done = terminated | truncated
        reward = self._reward(state.q, state.qd, q2, qd2, action)
        info = {"timeout": truncated & ~terminated}
        return new_state, EnvStep(self._obs(new_state),
                                  reward.astype(jnp.float32), done, info)

    def example_info(self):
        return {"timeout": jnp.zeros((), jnp.bool_)}


class Hopper2D(PlanarChainEnv):
    """One-legged hopper (gym Hopper-v5-class task: torso + thigh +
    shin + foot, 3 joint torques, toe/heel contact; forward-velocity
    reward + alive bonus − control cost; terminates when the torso
    drops or pitches over)."""

    spec = ChainSpec(
        lengths=(0.40, 0.45, 0.50, 0.39),
        masses=(3.53, 3.93, 2.71, 5.09),
        parents=(-1, 0, 1, 2),
        attach_frac=(0.0, 1.0, 1.0, 1.0),
        joints=((0, 1, 75.0), (1, 2, 75.0), (2, 3, 45.0)),
        contacts=((3, 0.0), (3, 1.0), (0, 0.0)),  # heel, toe, torso top
    )
    init_height = 1.40

    def _init_q(self, key):
        n = len(self.spec.lengths)
        kq, kd = jax.random.split(key)
        th0 = jnp.asarray([0.0, 0.0, 0.0, jnp.pi / 2])
        q = jnp.concatenate([
            jnp.asarray([0.0, self.init_height]),
            th0 + jax.random.uniform(kq, (n,), minval=-5e-3, maxval=5e-3),
        ])
        qd = jax.random.uniform(kd, (self.nq,), minval=-5e-3, maxval=5e-3)
        return q, qd

    def _healthy(self, q, qd):
        # torso top height and pitch within bounds (gym Hopper's
        # healthy_z_range / healthy_angle_range analogue)
        return ((q[1] > 0.80) & (jnp.abs(q[2]) < 0.6)
                & jnp.all(jnp.isfinite(q)) & jnp.all(jnp.abs(qd) < 100.0))

    def _reward(self, q, qd, q_new, qd_new, action):
        dx = (q_new[0] - q[0]) / (self.dt * self.n_frames)
        return dx + 1.0 - 1e-3 * jnp.sum(action ** 2)


class Cheetah2D(PlanarChainEnv):
    """Planar two-legged runner (gym HalfCheetah-class: a near-
    horizontal torso with back and front legs of two links each, 4
    joint torques, one contact point per foot; pure forward-velocity −
    control-cost reward, no termination)."""

    # torso near-horizontal (θ_0 ≈ π/2 points +x): back leg hangs from
    # the torso start (rear), front leg from the torso end (branching
    # via parents).
    spec = ChainSpec(
        lengths=(1.0, 0.29, 0.30, 0.27, 0.29),
        masses=(6.36, 1.54, 1.59, 1.44, 1.20),
        parents=(-1, 0, 1, 0, 3),
        attach_frac=(0.0, 0.0, 1.0, 1.0, 1.0),
        joints=((0, 1, 90.0), (1, 2, 60.0), (0, 3, 90.0), (3, 4, 60.0)),
        contacts=((2, 1.0), (4, 1.0), (0, 0.0), (0, 1.0)),  # feet + torso
    )
    init_height = 0.7

    def _healthy(self, q, qd):
        return jnp.all(jnp.isfinite(q)) & jnp.all(jnp.abs(qd) < 100.0)

    def _init_q(self, key):
        n = len(self.spec.lengths)
        kq, kd = jax.random.split(key)
        th0 = jnp.asarray([jnp.pi / 2, 0.0, 0.0, 0.0, 0.0])
        q = jnp.concatenate([
            jnp.asarray([0.0, self.init_height]),
            th0 + jax.random.uniform(kq, (n,), minval=-5e-3, maxval=5e-3),
        ])
        qd = jax.random.uniform(kd, (self.nq,), minval=-5e-3, maxval=5e-3)
        return q, qd

    def _reward(self, q, qd, q_new, qd_new, action):
        dx = (q_new[0] - q[0]) / (self.dt * self.n_frames)
        return dx - 0.05 * jnp.sum(action ** 2)
