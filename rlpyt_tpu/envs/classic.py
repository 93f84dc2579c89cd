"""JAX-native classic-control environments.

These are the fast deterministic-path envs (SURVEY.md §7.2 step 2): the role
rlpyt filled with ``gym`` classic control (rlpyt/envs/gym.py:GymEnvWrapper).
Dynamics follow the standard OpenAI Gym formulations so learning curves are
comparable; all are pure functions safe under vmap/jit/scan.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from rlpyt_tpu.envs.base import Env, EnvStep
from rlpyt_tpu.spaces import Composite, FloatBox, IntBox


class CartPoleState(NamedTuple):
    x: jax.Array
    x_dot: jax.Array
    theta: jax.Array
    theta_dot: jax.Array
    t: jax.Array  # step counter for the internal time limit


class CartPole(Env):
    """CartPole-v1 dynamics (Euler integration, gym-compatible constants)."""

    gravity = 9.8
    masscart = 1.0
    masspole = 0.1
    total_mass = masspole + masscart
    length = 0.5
    polemass_length = masspole * length
    force_mag = 10.0
    tau = 0.02
    theta_threshold = 12 * 2 * jnp.pi / 360
    x_threshold = 2.4

    def __init__(self, max_steps: int = 500):
        self.max_steps = max_steps

    @property
    def observation_space(self):
        high = [self.x_threshold * 2, 3.0e2, self.theta_threshold * 2, 3.0e2]
        return FloatBox(low=[-h for h in high], high=high, shape=(4,))

    @property
    def action_space(self):
        return IntBox(0, 2)

    @property
    def horizon(self):
        return self.max_steps

    def _obs(self, s: CartPoleState) -> jax.Array:
        return jnp.stack([s.x, s.x_dot, s.theta, s.theta_dot]).astype(jnp.float32)

    def reset(self, key, params=None):
        vals = jax.random.uniform(key, (4,), minval=-0.05, maxval=0.05)
        s = CartPoleState(vals[0], vals[1], vals[2], vals[3],
                          jnp.zeros((), jnp.int32))
        return s, self._obs(s)

    def step(self, key, state: CartPoleState, action, params=None):
        force = jnp.where(action == 1, self.force_mag, -self.force_mag)
        costheta = jnp.cos(state.theta)
        sintheta = jnp.sin(state.theta)
        temp = (force + self.polemass_length * state.theta_dot**2 * sintheta
                ) / self.total_mass
        thetaacc = (self.gravity * sintheta - costheta * temp) / (
            self.length * (4.0 / 3.0 - self.masspole * costheta**2
                           / self.total_mass))
        xacc = temp - self.polemass_length * thetaacc * costheta / self.total_mass
        x = state.x + self.tau * state.x_dot
        x_dot = state.x_dot + self.tau * xacc
        theta = state.theta + self.tau * state.theta_dot
        theta_dot = state.theta_dot + self.tau * thetaacc
        t = state.t + 1
        new_state = CartPoleState(x, x_dot, theta, theta_dot, t)
        terminated = (
            (jnp.abs(x) > self.x_threshold)
            | (jnp.abs(theta) > self.theta_threshold)
        )
        truncated = t >= self.max_steps
        done = terminated | truncated
        reward = jnp.ones((), jnp.float32)
        info = {"timeout": truncated & ~terminated}
        return new_state, EnvStep(self._obs(new_state), reward, done, info)

    def example_info(self):
        return {"timeout": jnp.zeros((), jnp.bool_)}


class PendulumState(NamedTuple):
    theta: jax.Array
    theta_dot: jax.Array
    t: jax.Array


class Pendulum(Env):
    """Pendulum-v1 dynamics — the continuous-control smoke env standing in
    for rlpyt's MuJoCo path (rlpyt/envs/gym.py) at unit-test scale."""

    max_speed = 8.0
    max_torque = 2.0
    dt = 0.05
    g = 10.0
    m = 1.0
    length = 1.0

    def __init__(self, max_steps: int = 200):
        self.max_steps = max_steps

    @property
    def observation_space(self):
        return FloatBox(low=[-1.0, -1.0, -self.max_speed],
                        high=[1.0, 1.0, self.max_speed], shape=(3,))

    @property
    def action_space(self):
        return FloatBox(low=-self.max_torque, high=self.max_torque, shape=(1,))

    @property
    def horizon(self):
        return self.max_steps

    def _obs(self, s: PendulumState) -> jax.Array:
        return jnp.stack(
            [jnp.cos(s.theta), jnp.sin(s.theta), s.theta_dot]
        ).astype(jnp.float32)

    def reset(self, key, params=None):
        k1, k2 = jax.random.split(key)
        theta = jax.random.uniform(k1, (), minval=-jnp.pi, maxval=jnp.pi)
        theta_dot = jax.random.uniform(k2, (), minval=-1.0, maxval=1.0)
        s = PendulumState(theta, theta_dot, jnp.zeros((), jnp.int32))
        return s, self._obs(s)

    def step(self, key, state: PendulumState, action, params=None):
        u = jnp.clip(action[0], -self.max_torque, self.max_torque)
        th, thdot = state.theta, state.theta_dot
        norm_th = ((th + jnp.pi) % (2 * jnp.pi)) - jnp.pi
        cost = norm_th**2 + 0.1 * thdot**2 + 0.001 * u**2
        newthdot = thdot + (
            3 * self.g / (2 * self.length) * jnp.sin(th)
            + 3.0 / (self.m * self.length**2) * u
        ) * self.dt
        newthdot = jnp.clip(newthdot, -self.max_speed, self.max_speed)
        newth = th + newthdot * self.dt
        t = state.t + 1
        new_state = PendulumState(newth, newthdot, t)
        truncated = t >= self.max_steps
        info = {"timeout": truncated}
        return new_state, EnvStep(
            self._obs(new_state), -cost.astype(jnp.float32), truncated, info)

    def example_info(self):
        return {"timeout": jnp.zeros((), jnp.bool_)}


class AcrobotState(NamedTuple):
    theta1: jax.Array
    theta2: jax.Array
    dtheta1: jax.Array
    dtheta2: jax.Array
    t: jax.Array


class Acrobot(Env):
    """Acrobot-v1 dynamics ("book" formulation, single RK4 step of dt=0.2,
    gym-compatible constants) — underactuated two-link swing-up with
    discrete {-1, 0, +1} torque on the elbow joint."""

    link_length_1 = 1.0
    link_length_2 = 1.0
    link_mass_1 = 1.0
    link_mass_2 = 1.0
    link_com_1 = 0.5
    link_com_2 = 0.5
    link_moi = 1.0
    max_vel_1 = 4 * jnp.pi
    max_vel_2 = 9 * jnp.pi
    dt = 0.2
    gravity = 9.8

    def __init__(self, max_steps: int = 500):
        self.max_steps = max_steps

    @property
    def observation_space(self):
        high = [1.0, 1.0, 1.0, 1.0, float(self.max_vel_1),
                float(self.max_vel_2)]
        return FloatBox(low=[-h for h in high], high=high, shape=(6,))

    @property
    def action_space(self):
        return IntBox(0, 3)

    @property
    def horizon(self):
        return self.max_steps

    def _obs(self, s: AcrobotState) -> jax.Array:
        return jnp.stack([
            jnp.cos(s.theta1), jnp.sin(s.theta1),
            jnp.cos(s.theta2), jnp.sin(s.theta2),
            s.dtheta1, s.dtheta2,
        ]).astype(jnp.float32)

    def _dsdt(self, y, torque):
        m1, m2 = self.link_mass_1, self.link_mass_2
        l1 = self.link_length_1
        lc1, lc2 = self.link_com_1, self.link_com_2
        i1 = i2 = self.link_moi
        g = self.gravity
        theta1, theta2, dtheta1, dtheta2 = y
        d1 = (m1 * lc1**2 + m2 * (l1**2 + lc2**2
                                  + 2 * l1 * lc2 * jnp.cos(theta2)) + i1 + i2)
        d2 = m2 * (lc2**2 + l1 * lc2 * jnp.cos(theta2)) + i2
        phi2 = m2 * lc2 * g * jnp.cos(theta1 + theta2 - jnp.pi / 2.0)
        phi1 = (-m2 * l1 * lc2 * dtheta2**2 * jnp.sin(theta2)
                - 2 * m2 * l1 * lc2 * dtheta2 * dtheta1 * jnp.sin(theta2)
                + (m1 * lc1 + m2 * l1) * g * jnp.cos(theta1 - jnp.pi / 2.0)
                + phi2)
        ddtheta2 = ((torque + d2 / d1 * phi1
                     - m2 * l1 * lc2 * dtheta1**2 * jnp.sin(theta2) - phi2)
                    / (m2 * lc2**2 + i2 - d2**2 / d1))
        ddtheta1 = -(d2 * ddtheta2 + phi1) / d1
        return jnp.stack([dtheta1, dtheta2, ddtheta1, ddtheta2])

    def reset(self, key, params=None):
        vals = jax.random.uniform(key, (4,), minval=-0.1, maxval=0.1)
        s = AcrobotState(vals[0], vals[1], vals[2], vals[3],
                         jnp.zeros((), jnp.int32))
        return s, self._obs(s)

    def step(self, key, state: AcrobotState, action, params=None):
        torque = (action - 1).astype(jnp.float32)  # {0,1,2} -> {-1,0,+1}
        y0 = jnp.stack([state.theta1, state.theta2,
                        state.dtheta1, state.dtheta2])
        h = self.dt
        k1 = self._dsdt(y0, torque)
        k2 = self._dsdt(y0 + h / 2.0 * k1, torque)
        k3 = self._dsdt(y0 + h / 2.0 * k2, torque)
        k4 = self._dsdt(y0 + h * k3, torque)
        y = y0 + h / 6.0 * (k1 + 2 * k2 + 2 * k3 + k4)
        wrap = lambda x: ((x + jnp.pi) % (2 * jnp.pi)) - jnp.pi
        theta1 = wrap(y[0])
        theta2 = wrap(y[1])
        dtheta1 = jnp.clip(y[2], -self.max_vel_1, self.max_vel_1)
        dtheta2 = jnp.clip(y[3], -self.max_vel_2, self.max_vel_2)
        t = state.t + 1
        new_state = AcrobotState(theta1, theta2, dtheta1, dtheta2, t)
        terminated = -jnp.cos(theta1) - jnp.cos(theta2 + theta1) > 1.0
        truncated = t >= self.max_steps
        done = terminated | truncated
        reward = jnp.where(terminated, 0.0, -1.0).astype(jnp.float32)
        info = {"timeout": truncated & ~terminated}
        return new_state, EnvStep(self._obs(new_state), reward, done, info)

    def example_info(self):
        return {"timeout": jnp.zeros((), jnp.bool_)}


class DictObsCartPole(CartPole):
    """CartPole with a Composite (dict) observation space — the
    end-to-end exerciser for nested observations (reference:
    rlpyt/spaces/composite.py:Composite + gym_wrapper.py's Dict
    handling; rlpyt's namedarraytuple made nested observations
    first-class through samplers, replay, and models alike).  The same
    pytree flows here through rollout scan → replay ring → model."""

    @property
    def observation_space(self):
        hi_pos = [self.x_threshold * 2, self.theta_threshold * 2]
        hi_vel = [3.0e2, 3.0e2]
        return Composite({
            "position": FloatBox(low=[-h for h in hi_pos], high=hi_pos,
                                 shape=(2,)),
            "velocity": FloatBox(low=[-h for h in hi_vel], high=hi_vel,
                                 shape=(2,)),
        })

    def _obs(self, s: CartPoleState):
        return {
            "position": jnp.stack([s.x, s.theta]).astype(jnp.float32),
            "velocity": jnp.stack([s.x_dot, s.theta_dot]).astype(
                jnp.float32),
        }


class MountainCarState(NamedTuple):
    position: jax.Array
    velocity: jax.Array
    t: jax.Array


class MountainCar(Env):
    """MountainCar-v0 — a sparse-reward discrete-control test env."""

    min_position = -1.2
    max_position = 0.6
    max_speed = 0.07
    goal_position = 0.5
    force = 0.001
    gravity = 0.0025

    def __init__(self, max_steps: int = 200):
        self.max_steps = max_steps

    @property
    def observation_space(self):
        return FloatBox(low=[self.min_position, -self.max_speed],
                        high=[self.max_position, self.max_speed], shape=(2,))

    @property
    def action_space(self):
        return IntBox(0, 3)

    @property
    def horizon(self):
        return self.max_steps

    def _obs(self, s):
        return jnp.stack([s.position, s.velocity]).astype(jnp.float32)

    def reset(self, key, params=None):
        position = jax.random.uniform(key, (), minval=-0.6, maxval=-0.4)
        s = MountainCarState(position, jnp.zeros(()), jnp.zeros((), jnp.int32))
        return s, self._obs(s)

    def step(self, key, state, action, params=None):
        velocity = state.velocity + (action - 1) * self.force + jnp.cos(
            3 * state.position) * (-self.gravity)
        velocity = jnp.clip(velocity, -self.max_speed, self.max_speed)
        position = jnp.clip(state.position + velocity,
                            self.min_position, self.max_position)
        velocity = jnp.where(
            (position <= self.min_position) & (velocity < 0), 0.0, velocity)
        t = state.t + 1
        new_state = MountainCarState(position, velocity, t)
        terminated = position >= self.goal_position
        truncated = t >= self.max_steps
        done = terminated | truncated
        info = {"timeout": truncated & ~terminated}
        return new_state, EnvStep(
            self._obs(new_state), jnp.float32(-1.0), done, info)

    def example_info(self):
        return {"timeout": jnp.zeros((), jnp.bool_)}


class ContinuousMountainCar(Env):
    """MountainCarContinuous-v0 — sparse-reward continuous control
    (gym-compatible constants; the exploration stress test for SAC/DDPG)."""

    min_position = -1.2
    max_position = 0.6
    max_speed = 0.07
    goal_position = 0.45
    power = 0.0015

    def __init__(self, max_steps: int = 999):
        self.max_steps = max_steps

    @property
    def observation_space(self):
        return FloatBox(low=[self.min_position, -self.max_speed],
                        high=[self.max_position, self.max_speed], shape=(2,))

    @property
    def action_space(self):
        return FloatBox(low=-1.0, high=1.0, shape=(1,))

    @property
    def horizon(self):
        return self.max_steps

    def _obs(self, s):
        return jnp.stack([s.position, s.velocity]).astype(jnp.float32)

    def reset(self, key, params=None):
        position = jax.random.uniform(key, (), minval=-0.6, maxval=-0.4)
        s = MountainCarState(position, jnp.zeros(()), jnp.zeros((), jnp.int32))
        return s, self._obs(s)

    def step(self, key, state, action, params=None):
        force = jnp.clip(action[0], -1.0, 1.0)
        velocity = state.velocity + force * self.power - 0.0025 * jnp.cos(
            3 * state.position)
        velocity = jnp.clip(velocity, -self.max_speed, self.max_speed)
        position = jnp.clip(state.position + velocity,
                            self.min_position, self.max_position)
        velocity = jnp.where(
            (position <= self.min_position) & (velocity < 0), 0.0, velocity)
        t = state.t + 1
        new_state = MountainCarState(position, velocity, t)
        terminated = position >= self.goal_position
        truncated = t >= self.max_steps
        done = terminated | truncated
        reward = (jnp.where(terminated, 100.0, 0.0)
                  - 0.1 * force**2).astype(jnp.float32)
        info = {"timeout": truncated & ~terminated}
        return new_state, EnvStep(self._obs(new_state), reward, done, info)

    def example_info(self):
        return {"timeout": jnp.zeros((), jnp.bool_)}
