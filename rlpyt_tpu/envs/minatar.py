"""JAX-native Atari-class environments (MinAtar game family).

Role in the framework (SURVEY.md §2.12, §7.3): the reference binds the C++
ALE emulator (rlpyt/envs/atari/atari_env.py:AtariEnv) — infeasible to run
on-device.  This module provides the deterministic on-device Atari path:
the MinAtar games (Young & Tian 2019, arXiv:1903.03176 — public spec),
re-implemented from scratch as pure-JAX state machines so thousands of
instances run in lockstep under vmap/jit/scan on TPU.  The full-ALE host
bridge lives in envs/host.py; both share the same Env API.

Conventions (matching the MinAtar spec):
- 10×10 grid, per-game channel set; observations are [C, 10, 10] uint8
  in {0,1} (channels-first to match the framework's NCHW conv surface).
- Unified 6-action set: 0=noop, 1=left, 2=up, 3=right, 4=down, 5=fire.
- Optional sticky actions (repeat previous action w.p. 0.1) and
  difficulty ramping, as in the published spec.
- Terminal states are signalled via ``done``; the rollout engine
  auto-resets (rlpyt CpuResetCollector semantics).
- ``max_steps`` adds a time limit with a ``timeout`` info flag feeding
  the time-limit-aware replay path.
"""
from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from rlpyt_tpu.envs.base import Env, EnvStep
from rlpyt_tpu.spaces import IntBox

F32 = jnp.float32
I32 = jnp.int32

# Action indices
NOOP, LEFT, UP, RIGHT, DOWN, FIRE = range(6)


class MinAtarEnv(Env):
    """Shared plumbing: 6-action space, [C,10,10] binary obs, sticky
    actions, time limit."""

    n_channels: int = 4

    def __init__(self, sticky_action_prob: float = 0.1,
                 ramping: bool = True, max_steps: int = 5000):
        self.sticky_action_prob = sticky_action_prob
        self.ramping = ramping
        self.max_steps = max_steps

    @property
    def observation_space(self):
        return IntBox(0, 2, shape=(self.n_channels, 10, 10),
                      dtype=jnp.uint8)

    @property
    def action_space(self):
        return IntBox(0, 6)

    @property
    def horizon(self):
        return self.max_steps

    def example_info(self):
        return {"timeout": jnp.zeros((), jnp.bool_)}

    def _sticky(self, key, action, last_action):
        if self.sticky_action_prob <= 0.0:
            return action
        repeat = jax.random.uniform(key) < self.sticky_action_prob
        return jnp.where(repeat, last_action, action)

    def _finish(self, state, obs, reward, terminal):
        """Apply the time limit and pack the EnvStep."""
        truncated = state.t >= self.max_steps
        done = terminal | truncated
        info = {"timeout": truncated & ~terminal}
        return state, EnvStep(obs, reward.astype(F32), done, info)


# ===========================================================================
# Breakout
# ===========================================================================

class BreakoutState(NamedTuple):
    ball_y: jax.Array
    ball_x: jax.Array
    ball_dir: jax.Array      # 0:up-left 1:down-left 2:down-right 3:up-right
    pos: jax.Array           # paddle column
    brick_map: jax.Array     # [10, 10] uint8
    strike: jax.Array        # bool: currently inside a brick-hit streak
    last_y: jax.Array        # previous ball cell (trail channel)
    last_x: jax.Array
    last_action: jax.Array
    t: jax.Array


# Direction index maps (spec: reflection tables)
_REFLECT_X = jnp.array([3, 2, 1, 0])   # bounce off side wall
_REFLECT_Y = jnp.array([1, 0, 3, 2])   # bounce off top / brick / paddle
_SWAP = jnp.array([2, 3, 0, 1])        # paddle corner hit
_DX = jnp.array([-1, -1, 1, 1])
_DY = jnp.array([-1, 1, 1, -1])


class Breakout(MinAtarEnv):
    """MinAtar Breakout: 3 brick rows, diagonal ball, 1-px paddle.

    Channels: 0 paddle, 1 ball, 2 trail, 3 bricks."""

    n_channels = 4

    def reset(self, key, params=None):
        side = jax.random.randint(key, (), 0, 2)
        s = BreakoutState(
            ball_y=jnp.asarray(3, I32),
            ball_x=jnp.where(side == 0, 0, 9).astype(I32),
            ball_dir=jnp.where(side == 0, 2, 3).astype(I32),
            pos=jnp.asarray(4, I32),
            brick_map=jnp.zeros((10, 10), jnp.uint8).at[1:4, :].set(1),
            strike=jnp.asarray(False),
            last_y=jnp.asarray(3, I32),
            last_x=jnp.where(side == 0, 0, 9).astype(I32),
            last_action=jnp.asarray(0, I32),
            t=jnp.asarray(0, I32),
        )
        return s, self._obs(s)

    def _obs(self, s: BreakoutState):
        obs = jnp.zeros((self.n_channels, 10, 10), jnp.uint8)
        obs = obs.at[0, 9, s.pos].set(1)
        obs = obs.at[1, s.ball_y, s.ball_x].set(1)
        obs = obs.at[2, s.last_y, s.last_x].set(1)
        obs = obs.at[3].set(s.brick_map)
        return obs

    def step(self, key, s: BreakoutState, action, params=None):
        a = self._sticky(key, action.astype(I32), s.last_action)
        pos = jnp.clip(s.pos + (a == RIGHT).astype(I32)
                       - (a == LEFT).astype(I32), 0, 9)

        last_y, last_x = s.ball_y, s.ball_x
        new_x = s.ball_x + _DX[s.ball_dir]
        new_y = s.ball_y + _DY[s.ball_dir]

        # Side walls reflect x
        side_hit = (new_x < 0) | (new_x > 9)
        new_x = jnp.clip(new_x, 0, 9)
        d = jnp.where(side_hit, _REFLECT_X[s.ball_dir], s.ball_dir)

        # Exclusive cases on y (spec order: top, brick, bottom)
        top_hit = new_y < 0
        y_idx = jnp.clip(new_y, 0, 9)
        brick_here = (~top_hit) & (s.brick_map[y_idx, new_x] == 1)
        strike_hit = brick_here & (~s.strike)       # only first contact acts
        bottom = (~top_hit) & (~brick_here) & (new_y == 9)

        reward = strike_hit.astype(F32)
        brick_map = jnp.where(
            strike_hit, s.brick_map.at[y_idx, new_x].set(0), s.brick_map)

        # Bottom row: paddle save or death; respawn bricks if cleared
        cleared = jnp.count_nonzero(brick_map) == 0
        brick_map = jnp.where(bottom & cleared,
                              brick_map.at[1:4, :].set(1), brick_map)
        flat_save = bottom & (s.ball_x == pos)       # ball directly above
        corner_save = bottom & (s.ball_x != pos) & (new_x == pos)
        death = bottom & ~flat_save & ~corner_save

        d = jnp.where(top_hit | strike_hit, _REFLECT_Y[d], d)
        d = jnp.where(flat_save, _REFLECT_X[d], d)
        d = jnp.where(corner_save, _SWAP[d], d)

        fy = jnp.where(top_hit, 0, new_y)
        fy = jnp.where(strike_hit | flat_save | corner_save, last_y, fy)
        fy = jnp.clip(fy, 0, 9)

        ns = BreakoutState(
            ball_y=fy, ball_x=new_x, ball_dir=d, pos=pos,
            brick_map=brick_map, strike=brick_here,
            last_y=last_y, last_x=last_x, last_action=a, t=s.t + 1)
        return self._finish(ns, self._obs(ns), reward, death)


# ===========================================================================
# Space Invaders
# ===========================================================================

class SpaceInvadersState(NamedTuple):
    pos: jax.Array
    f_bullet_map: jax.Array   # [10,10] friendly bullets (move up)
    e_bullet_map: jax.Array   # [10,10] enemy bullets (move down)
    alien_map: jax.Array      # [10,10]
    alien_dir: jax.Array      # ±1 horizontal march direction
    enemy_move_interval: jax.Array
    alien_move_timer: jax.Array
    alien_shot_timer: jax.Array
    shot_timer: jax.Array     # player fire cooldown
    last_action: jax.Array
    t: jax.Array


_SI_SHOT_COOL = 5
_SI_ENEMY_MOVE_INTERVAL = 12
_SI_ENEMY_SHOT_INTERVAL = 10


class SpaceInvaders(MinAtarEnv):
    """MinAtar Space Invaders.  Channels: 0 cannon, 1 alien, 2 alien-left,
    3 alien-right, 4 friendly bullet, 5 enemy bullet."""

    n_channels = 6

    def reset(self, key, params=None):
        s = SpaceInvadersState(
            pos=jnp.asarray(5, I32),
            f_bullet_map=jnp.zeros((10, 10), jnp.uint8),
            e_bullet_map=jnp.zeros((10, 10), jnp.uint8),
            alien_map=jnp.zeros((10, 10), jnp.uint8).at[0:4, 2:8].set(1),
            alien_dir=jnp.asarray(-1, I32),
            enemy_move_interval=jnp.asarray(_SI_ENEMY_MOVE_INTERVAL, I32),
            alien_move_timer=jnp.asarray(_SI_ENEMY_MOVE_INTERVAL, I32),
            alien_shot_timer=jnp.asarray(_SI_ENEMY_SHOT_INTERVAL, I32),
            shot_timer=jnp.asarray(0, I32),
            last_action=jnp.asarray(0, I32),
            t=jnp.asarray(0, I32),
        )
        return s, self._obs(s)

    def _obs(self, s: SpaceInvadersState):
        obs = jnp.zeros((self.n_channels, 10, 10), jnp.uint8)
        obs = obs.at[0, 9, s.pos].set(1)
        obs = obs.at[1].set(s.alien_map)
        obs = obs.at[2].set(jnp.where(s.alien_dir < 0, s.alien_map, 0)
                            .astype(jnp.uint8))
        obs = obs.at[3].set(jnp.where(s.alien_dir > 0, s.alien_map, 0)
                            .astype(jnp.uint8))
        obs = obs.at[4].set(s.f_bullet_map)
        obs = obs.at[5].set(s.e_bullet_map)
        return obs

    def step(self, key, s: SpaceInvadersState, action, params=None):
        a = self._sticky(key, action.astype(I32), s.last_action)

        # Player: fire or move
        fire = (a == FIRE) & (s.shot_timer == 0)
        f_map = jnp.where(fire, s.f_bullet_map.at[9, s.pos].set(1),
                          s.f_bullet_map)
        shot_timer = jnp.where(fire, _SI_SHOT_COOL, s.shot_timer)
        pos = jnp.clip(s.pos + (a == RIGHT).astype(I32)
                       - (a == LEFT).astype(I32), 0, 9)

        # Bullets advance
        f_map = jnp.roll(f_map, -1, axis=0).at[9, :].set(0)
        e_map = jnp.roll(s.e_bullet_map, 1, axis=0).at[0, :].set(0)
        terminal = e_map[9, pos] == 1

        # Alien march (down at walls, else sideways)
        alien_map = s.alien_map
        alien_dir = s.alien_dir
        move_now = s.alien_move_timer - 1 == 0
        at_left = (alien_map[:, 0].sum() > 0) & (alien_dir < 0)
        at_right = (alien_map[:, 9].sum() > 0) & (alien_dir > 0)
        turn = at_left | at_right
        aliens_landed = alien_map[9, :].sum() > 0
        terminal = terminal | (move_now & turn & aliens_landed)
        moved_down = jnp.roll(alien_map, 1, axis=0)
        moved_side = jnp.roll(alien_map, alien_dir, axis=1)
        alien_map = jnp.where(move_now,
                              jnp.where(turn, moved_down, moved_side),
                              alien_map)
        alien_dir = jnp.where(move_now & turn, -alien_dir, alien_dir)
        terminal = terminal | (move_now & (alien_map[9, pos] == 1))
        n_aliens = jnp.count_nonzero(alien_map).astype(I32)
        alien_move_timer = jnp.where(
            move_now, jnp.minimum(jnp.maximum(n_aliens, 1),
                                  s.enemy_move_interval),
            s.alien_move_timer - 1)

        # Alien shooting: nearest column to player, lowest alien there
        shoot_now = s.alien_shot_timer - 1 == 0
        cols = jnp.arange(10)
        has_alien = alien_map.sum(axis=0) > 0
        dist = jnp.abs(cols - pos) + jnp.where(has_alien, 0, 100)
        col = jnp.argmin(dist)
        row = 9 - jnp.argmax(alien_map[::-1, col])
        can_shoot = shoot_now & (n_aliens > 0)
        e_map = jnp.where(can_shoot, e_map.at[row, col].set(1), e_map)
        alien_shot_timer = jnp.where(
            shoot_now, _SI_ENEMY_SHOT_INTERVAL, s.alien_shot_timer - 1)

        # Friendly bullets kill aliens
        kills = (alien_map == 1) & (f_map == 1)
        reward = jnp.sum(kills).astype(F32)
        alien_map = jnp.where(kills, 0, alien_map).astype(jnp.uint8)
        f_map = jnp.where(kills, 0, f_map).astype(jnp.uint8)

        shot_timer = jnp.maximum(shot_timer - (s.shot_timer > 0), 0)

        # Wave respawn (+ optional speed ramping)
        wave_clear = jnp.count_nonzero(alien_map) == 0
        enemy_move_interval = s.enemy_move_interval
        if self.ramping:
            enemy_move_interval = jnp.where(
                wave_clear & (enemy_move_interval > 6),
                enemy_move_interval - 1, enemy_move_interval)
        alien_map = jnp.where(
            wave_clear,
            jnp.zeros((10, 10), jnp.uint8).at[0:4, 2:8].set(1),
            alien_map)

        ns = SpaceInvadersState(
            pos=pos, f_bullet_map=f_map, e_bullet_map=e_map,
            alien_map=alien_map, alien_dir=alien_dir,
            enemy_move_interval=enemy_move_interval,
            alien_move_timer=alien_move_timer,
            alien_shot_timer=alien_shot_timer,
            shot_timer=shot_timer, last_action=a, t=s.t + 1)
        return self._finish(ns, self._obs(ns), reward, terminal)


# ===========================================================================
# Asterix
# ===========================================================================

class AsterixState(NamedTuple):
    player_x: jax.Array
    player_y: jax.Array
    ent_x: jax.Array        # [8]
    ent_lr: jax.Array       # [8] 1 = moving right
    ent_gold: jax.Array     # [8] bool
    ent_alive: jax.Array    # [8] bool
    spawn_speed: jax.Array
    spawn_timer: jax.Array
    move_speed: jax.Array
    move_timer: jax.Array
    ramp_timer: jax.Array
    ramp_index: jax.Array
    last_action: jax.Array
    t: jax.Array


_AX_INIT_SPAWN_SPEED = 10
_AX_INIT_MOVE_SPEED = 5
_AX_RAMP_INTERVAL = 100


class Asterix(MinAtarEnv):
    """MinAtar Asterix: dodge enemies, collect gold; 8 entity lanes on
    rows 1-8.  Channels: 0 player, 1 enemy, 2 trail, 3 gold."""

    n_channels = 4

    def reset(self, key, params=None):
        s = AsterixState(
            player_x=jnp.asarray(5, I32),
            player_y=jnp.asarray(5, I32),
            ent_x=jnp.zeros((8,), I32),
            ent_lr=jnp.zeros((8,), I32),
            ent_gold=jnp.zeros((8,), jnp.bool_),
            ent_alive=jnp.zeros((8,), jnp.bool_),
            spawn_speed=jnp.asarray(_AX_INIT_SPAWN_SPEED, I32),
            spawn_timer=jnp.asarray(_AX_INIT_SPAWN_SPEED, I32),
            move_speed=jnp.asarray(_AX_INIT_MOVE_SPEED, I32),
            move_timer=jnp.asarray(_AX_INIT_MOVE_SPEED, I32),
            ramp_timer=jnp.asarray(_AX_RAMP_INTERVAL, I32),
            ramp_index=jnp.asarray(0, I32),
            last_action=jnp.asarray(0, I32),
            t=jnp.asarray(0, I32),
        )
        return s, self._obs(s)

    def _obs(self, s: AsterixState):
        obs = jnp.zeros((self.n_channels, 10, 10), jnp.uint8)
        obs = obs.at[0, s.player_y, s.player_x].set(1)
        rows = jnp.arange(8) + 1
        alive = s.ent_alive
        enemy = alive & ~s.ent_gold
        gold = alive & s.ent_gold
        obs = obs.at[1, rows, s.ent_x].max(enemy.astype(jnp.uint8))
        obs = obs.at[3, rows, s.ent_x].max(gold.astype(jnp.uint8))
        back_x = s.ent_x - (2 * s.ent_lr - 1)
        in_grid = (back_x >= 0) & (back_x <= 9) & alive
        obs = obs.at[2, rows, jnp.clip(back_x, 0, 9)].max(
            in_grid.astype(jnp.uint8))
        return obs

    def _collide(self, s: AsterixState, reward, terminal):
        """Player/entity contact: gold collects, enemy kills."""
        rows = jnp.arange(8) + 1
        hit = s.ent_alive & (rows == s.player_y) & (s.ent_x == s.player_x)
        gold_hit = hit & s.ent_gold
        enemy_hit = hit & ~s.ent_gold
        reward = reward + jnp.sum(gold_hit).astype(F32)
        terminal = terminal | jnp.any(enemy_hit)
        return s._replace(ent_alive=s.ent_alive & ~gold_hit), reward, terminal

    def step(self, key, s: AsterixState, action, params=None):
        k_sticky, k_slot, k_lr, k_gold = jax.random.split(key, 4)
        a = self._sticky(k_sticky, action.astype(I32), s.last_action)
        reward = jnp.zeros((), F32)
        terminal = jnp.asarray(False)

        # Spawn into a uniformly-random free lane
        spawn_now = s.spawn_timer == 0
        free = ~s.ent_alive
        n_free = jnp.sum(free)
        u = jax.random.randint(k_slot, (), 0, 1 << 30) % jnp.maximum(n_free, 1)
        slot = jnp.argmax(jnp.cumsum(free) > u)
        do_spawn = spawn_now & (n_free > 0)
        lr = jax.random.randint(k_lr, (), 0, 2)
        gold = jax.random.uniform(k_gold) < (1.0 / 3.0)
        x0 = jnp.where(lr == 1, 0, 9)
        ent_x = jnp.where(do_spawn, s.ent_x.at[slot].set(x0), s.ent_x)
        ent_lr = jnp.where(do_spawn, s.ent_lr.at[slot].set(lr), s.ent_lr)
        ent_gold = jnp.where(do_spawn, s.ent_gold.at[slot].set(gold),
                             s.ent_gold)
        ent_alive = jnp.where(do_spawn, s.ent_alive.at[slot].set(True),
                              s.ent_alive)
        spawn_timer = jnp.where(spawn_now, s.spawn_speed, s.spawn_timer - 1)

        # Player move
        px = jnp.clip(s.player_x + (a == RIGHT).astype(I32)
                      - (a == LEFT).astype(I32), 0, 9)
        py = jnp.clip(s.player_y + (a == DOWN).astype(I32)
                      - (a == UP).astype(I32), 1, 8)
        s1 = s._replace(player_x=px, player_y=py, ent_x=ent_x,
                        ent_lr=ent_lr, ent_gold=ent_gold,
                        ent_alive=ent_alive)
        s1, reward, terminal = self._collide(s1, reward, terminal)

        # Entity march every move_speed steps
        move_now = s.move_timer == 0
        dx = 2 * s1.ent_lr - 1
        new_x = s1.ent_x + jnp.where(move_now, dx, 0)
        off = (new_x < 0) | (new_x > 9)
        s1 = s1._replace(ent_x=jnp.clip(new_x, 0, 9),
                         ent_alive=s1.ent_alive & ~off)
        s1, reward, terminal = self._collide(s1, reward, terminal)
        move_timer = jnp.where(move_now, s1.move_speed, s.move_timer - 1)

        # Difficulty ramping: alternately speed up spawning and movement
        spawn_speed, move_speed = s1.spawn_speed, s1.move_speed
        ramp_timer, ramp_index = s.ramp_timer, s.ramp_index
        if self.ramping:
            ramp_now = (ramp_timer == 0) & (
                (spawn_speed > 1) | (move_speed > 1))
            do_move = ramp_now & ((ramp_index % 2 == 0) | (spawn_speed <= 1))
            do_spawn_r = ramp_now & ~do_move
            move_speed = jnp.where(do_move, jnp.maximum(move_speed - 1, 1),
                                   move_speed)
            spawn_speed = jnp.where(do_spawn_r,
                                    jnp.maximum(spawn_speed - 1, 1),
                                    spawn_speed)
            ramp_index = ramp_index + ramp_now.astype(I32)
            ramp_timer = jnp.where(ramp_now, _AX_RAMP_INTERVAL,
                                   jnp.maximum(ramp_timer - 1, 0))

        ns = s1._replace(spawn_speed=spawn_speed, spawn_timer=spawn_timer,
                         move_speed=move_speed, move_timer=move_timer,
                         ramp_timer=ramp_timer, ramp_index=ramp_index,
                         last_action=a, t=s.t + 1)
        return self._finish(ns, self._obs(ns), reward, terminal)


# ===========================================================================
# Freeway
# ===========================================================================

class FreewayState(NamedTuple):
    pos: jax.Array           # chicken row (col fixed at 4)
    car_x: jax.Array         # [8] rows 1-8
    car_dir: jax.Array       # [8] ±1
    car_period: jax.Array    # [8] steps per move, 1..5
    car_timer: jax.Array     # [8]
    move_timer: jax.Array    # chicken move cooldown
    last_action: jax.Array
    t: jax.Array


_FW_PLAYER_SPEED = 3
_FW_TIME_LIMIT = 2500


class Freeway(MinAtarEnv):
    """MinAtar Freeway: cross 8 lanes of traffic upward; +1 per crossing.
    Channels: 0 chicken, 1 car, 2-6 car trails by speed (period 1-5).

    Round-5 parity fix: earlier rounds shipped a materially HARDER game
    than the published spec (MinAtar freeway.py), which capped every DQN
    variant at ~30-40 vs the published ~50-60 band: (1) the chicken's
    move cooldown decremented only on non-move steps, giving a move
    every 4 frames — the reference decrements the timer at the end of
    the SAME step it is set (``move_timer -= move_timer>0``), so the
    chicken moves every 3; (2) cars ticked every ``period`` frames —
    the reference moves a car when its timer reaches 0 AFTER ``period``
    decrements, i.e. every ``period+1`` frames; (3) cars spawned and
    respawned at random x — the reference spawns every car at x=0,
    granting a grace window at the chicken column after each crossing;
    (4) trail cells clipped at the edges instead of wrapping.  The max
    crossing ceiling moves from ~2500/36 to ~2500/27 episodes."""

    n_channels = 7

    def __init__(self, sticky_action_prob: float = 0.1,
                 ramping: bool = True, max_steps: int = _FW_TIME_LIMIT):
        super().__init__(sticky_action_prob, ramping, max_steps)

    def _randomize_cars(self, key):
        k1, k2 = jax.random.split(key, 2)
        period = jax.random.randint(k1, (8,), 1, 6)
        direction = 2 * jax.random.randint(k2, (8,), 0, 2) - 1
        # Reference _randomize_cars: every car (re)spawns at x=0.
        x = jnp.zeros((8,), I32)
        return x, direction, period

    def reset(self, key, params=None):
        x, direction, period = self._randomize_cars(key)
        s = FreewayState(
            pos=jnp.asarray(9, I32),
            car_x=x.astype(I32), car_dir=direction.astype(I32),
            car_period=period.astype(I32), car_timer=period.astype(I32),
            move_timer=jnp.asarray(_FW_PLAYER_SPEED, I32),
            last_action=jnp.asarray(0, I32),
            t=jnp.asarray(0, I32),
        )
        return s, self._obs(s)

    def _obs(self, s: FreewayState):
        obs = jnp.zeros((self.n_channels, 10, 10), jnp.uint8)
        obs = obs.at[0, s.pos, 4].set(1)
        rows = jnp.arange(8) + 1
        obs = obs.at[1, rows, s.car_x].set(1)
        back_x = (s.car_x - s.car_dir) % 10   # reference wraps trails
        trail_ch = 1 + s.car_period  # periods 1..5 → channels 2..6
        obs = obs.at[trail_ch, rows, back_x].set(1)
        return obs

    def step(self, key, s: FreewayState, action, params=None):
        k_sticky, k_cars = jax.random.split(key)
        a = self._sticky(k_sticky, action.astype(I32), s.last_action)

        can_move = s.move_timer == 0
        move_up = can_move & (a == UP)
        move_down = can_move & (a == DOWN)
        pos = jnp.clip(s.pos - move_up.astype(I32) + move_down.astype(I32),
                       0, 9)
        # Reference sets the timer to player_speed on a move and then
        # decrements it at the end of the SAME step (freeway.py act:
        # ``move_timer -= move_timer>0``) → a move every 3 frames.
        move_timer = jnp.where(move_up | move_down, _FW_PLAYER_SPEED - 1,
                               jnp.maximum(s.move_timer - 1, 0))

        # Win check BEFORE cars update (reference order): +1, chicken
        # respawns, traffic re-randomizes with all cars back at x=0.
        scored = pos == 0
        reward = scored.astype(F32)
        rx, rdir, rper = self._randomize_cars(k_cars)
        car_x = jnp.where(scored, rx, s.car_x)
        car_dir = jnp.where(scored, rdir, s.car_dir)
        car_period = jnp.where(scored, rper, s.car_period)
        car_timer = jnp.where(scored, rper, s.car_timer)
        pos = jnp.where(scored, 9, pos)

        rows = jnp.arange(8) + 1
        # Pre-move collision (reference checks car[0:2]==[4,pos] before
        # each car advances: the chicken stepping INTO a parked car dies
        # even if that car moves away this frame).
        hit_pre = jnp.any((rows == pos) & (car_x == 4))
        pos = jnp.where(hit_pre, 9, pos)

        # Cars advance when their timer reaches 0 after ``period``
        # decrements — one move every period+1 frames (reference
        # freeway.py: ``if car[2]==0: move; car[2]=abs(speed) else:
        # car[2]-=1``), with wraparound.
        tick = car_timer == 0
        car_x = jnp.where(tick, (car_x + car_dir) % 10, car_x)
        car_timer = jnp.where(tick, car_period, car_timer - 1)

        hit_post = jnp.any((rows == pos) & (car_x == 4))
        pos = jnp.where(hit_post, 9, pos)

        ns = FreewayState(
            pos=pos, car_x=car_x, car_dir=car_dir, car_period=car_period,
            car_timer=car_timer, move_timer=move_timer, last_action=a,
            t=s.t + 1)
        # Freeway only ends by time limit.
        return self._finish(ns, self._obs(ns), reward,
                            jnp.asarray(False))


# ===========================================================================
# Seaquest
# ===========================================================================

class SeaquestState(NamedTuple):
    sub_x: jax.Array         # player submarine
    sub_y: jax.Array         # 0 = surface, 1-8 water lanes
    sub_or: jax.Array        # facing: +1 right, -1 left
    fb_l: jax.Array          # [10,10] friendly bullets moving left
    fb_r: jax.Array          # [10,10] friendly bullets moving right
    eb_l: jax.Array          # [10,10] enemy bullets moving left
    eb_r: jax.Array          # [10,10] enemy bullets moving right
    fish_x: jax.Array        # [8] one fish lane per row 1-8
    fish_dir: jax.Array      # [8] ±1
    fish_alive: jax.Array    # [8] bool
    esub_x: jax.Array        # [8] enemy subs, same lane model
    esub_dir: jax.Array      # [8]
    esub_alive: jax.Array    # [8]
    esub_shot_timer: jax.Array  # [8]
    diver_x: jax.Array       # [8]
    diver_dir: jax.Array     # [8]
    diver_alive: jax.Array   # [8]
    oxygen: jax.Array
    diver_count: jax.Array
    e_spawn_speed: jax.Array
    e_spawn_timer: jax.Array
    d_spawn_timer: jax.Array
    move_speed: jax.Array    # enemy move period (ramps down)
    move_timer: jax.Array
    diver_move_timer: jax.Array
    shot_timer: jax.Array    # player fire cooldown
    surface: jax.Array       # bool: was at surface last step
    last_action: jax.Array
    t: jax.Array


_SQ_MAX_OXYGEN = 200
_SQ_INIT_SPAWN_SPEED = 20
_SQ_DIVER_SPAWN_SPEED = 30
_SQ_INIT_MOVE_SPEED = 5
_SQ_SHOT_COOL = 5
_SQ_ENEMY_SHOT_INTERVAL = 10
_SQ_DIVER_MOVE_INTERVAL = 5


class Seaquest(MinAtarEnv):
    """MinAtar Seaquest (Young & Tian 2019 spec, re-designed as a
    fixed-shape JAX state machine).

    Shoot fish and enemy subs (+1 each), collect divers, manage oxygen,
    and surface to refill: surfacing with 0 divers (or running out of
    oxygen) ends the game; surfacing with all 6 divers cashes them in
    for +6 and ramps difficulty.  Design choice vs the list-based spec:
    entities live on 8 fixed lanes (rows 1-8) with at most one fish,
    one enemy sub and one diver per lane — the bounded-entity layout
    that vectorizes under vmap (same approach as Asterix above).

    Channels: 0 sub-front, 1 sub-trail (orientation), 2 friendly bullet,
    3 diver, 4 enemy bullet, 5 fish, 6 enemy sub, 7 oxygen gauge (row 9),
    8 diver gauge (row 9).
    """

    n_channels = 9

    def reset(self, key, params=None):
        z8 = jnp.zeros((8,), I32)
        f8 = jnp.zeros((8,), jnp.bool_)
        m = jnp.zeros((10, 10), jnp.uint8)
        s = SeaquestState(
            sub_x=jnp.asarray(5, I32), sub_y=jnp.asarray(0, I32),
            sub_or=jnp.asarray(1, I32),
            fb_l=m, fb_r=m, eb_l=m, eb_r=m,
            fish_x=z8, fish_dir=jnp.ones((8,), I32), fish_alive=f8,
            esub_x=z8, esub_dir=jnp.ones((8,), I32), esub_alive=f8,
            esub_shot_timer=z8,
            diver_x=z8, diver_dir=jnp.ones((8,), I32), diver_alive=f8,
            oxygen=jnp.asarray(_SQ_MAX_OXYGEN, I32),
            diver_count=jnp.asarray(0, I32),
            e_spawn_speed=jnp.asarray(_SQ_INIT_SPAWN_SPEED, I32),
            e_spawn_timer=jnp.asarray(_SQ_INIT_SPAWN_SPEED, I32),
            d_spawn_timer=jnp.asarray(_SQ_DIVER_SPAWN_SPEED, I32),
            move_speed=jnp.asarray(_SQ_INIT_MOVE_SPEED, I32),
            move_timer=jnp.asarray(_SQ_INIT_MOVE_SPEED, I32),
            diver_move_timer=jnp.asarray(_SQ_DIVER_MOVE_INTERVAL, I32),
            shot_timer=jnp.asarray(0, I32),
            surface=jnp.asarray(True),
            last_action=jnp.asarray(0, I32),
            t=jnp.asarray(0, I32),
        )
        return s, self._obs(s)

    def _obs(self, s: SeaquestState):
        obs = jnp.zeros((self.n_channels, 10, 10), jnp.uint8)
        obs = obs.at[0, s.sub_y, s.sub_x].set(1)
        back_x = jnp.clip(s.sub_x - s.sub_or, 0, 9)
        obs = obs.at[1, s.sub_y, back_x].set(1)
        obs = obs.at[2].set(s.fb_l | s.fb_r)
        rows = jnp.arange(8) + 1
        obs = obs.at[3, rows, s.diver_x].max(s.diver_alive.astype(jnp.uint8))
        obs = obs.at[4].set(s.eb_l | s.eb_r)
        obs = obs.at[5, rows, s.fish_x].max(s.fish_alive.astype(jnp.uint8))
        obs = obs.at[6, rows, s.esub_x].max(s.esub_alive.astype(jnp.uint8))
        # Gauges on row 9: oxygen left-to-right, divers right-to-left.
        cols = jnp.arange(10)
        ox_cells = (cols < (s.oxygen * 10) // _SQ_MAX_OXYGEN)
        obs = obs.at[7, 9, :].set(ox_cells.astype(jnp.uint8))
        dv_cells = (9 - cols) < s.diver_count
        obs = obs.at[8, 9, :].set(dv_cells.astype(jnp.uint8))
        return obs

    @staticmethod
    def _spawn_lane(key, free):
        """Uniform random index among free lanes (Asterix idiom)."""
        n_free = jnp.sum(free)
        u = jax.random.randint(key, (), 0, 1 << 30) % jnp.maximum(n_free, 1)
        return jnp.argmax(jnp.cumsum(free) > u), n_free > 0

    def step(self, key, s: SeaquestState, action, params=None):
        (k_sticky, k_elane, k_etype, k_edir,
         k_dlane, k_ddir) = jax.random.split(key, 6)
        a = self._sticky(k_sticky, action.astype(I32), s.last_action)
        reward = jnp.zeros((), F32)
        terminal = jnp.asarray(False)
        rows = jnp.arange(8) + 1

        # --- player: fire + move -------------------------------------
        fire = (a == FIRE) & (s.shot_timer == 0)
        fb_l = jnp.where(fire & (s.sub_or < 0),
                         s.fb_l.at[s.sub_y, s.sub_x].set(1), s.fb_l)
        fb_r = jnp.where(fire & (s.sub_or > 0),
                         s.fb_r.at[s.sub_y, s.sub_x].set(1), s.fb_r)
        shot_timer = jnp.where(fire, _SQ_SHOT_COOL,
                               jnp.maximum(s.shot_timer - 1, 0))
        sub_x = jnp.clip(s.sub_x + (a == RIGHT).astype(I32)
                         - (a == LEFT).astype(I32), 0, 9)
        sub_or = jnp.where(a == RIGHT, 1, jnp.where(a == LEFT, -1, s.sub_or))
        sub_y = jnp.clip(s.sub_y + (a == DOWN).astype(I32)
                         - (a == UP).astype(I32), 0, 8)

        # --- bullets advance (friendly then enemy) --------------------
        def shift(m, d):   # move all bullets one column; edge falls off
            return jnp.roll(m, d, axis=1).at[:, (0 if d > 0 else 9)].set(0)

        fb_l, fb_r = shift(fb_l, -1), shift(fb_r, 1)
        eb_l, eb_r = shift(s.eb_l, -1), shift(s.eb_r, 1)

        # friendly bullets kill fish / enemy subs (+1 each)
        fb = fb_l | fb_r
        fish_hit = s.fish_alive & (fb[rows, s.fish_x] == 1)
        esub_hit = s.esub_alive & (fb[rows, s.esub_x] == 1)
        reward = reward + jnp.sum(fish_hit).astype(F32) \
            + jnp.sum(esub_hit).astype(F32)
        fish_alive = s.fish_alive & ~fish_hit
        esub_alive = s.esub_alive & ~esub_hit
        # remove the bullets that struck
        strike = jnp.zeros((10, 10), jnp.bool_)
        strike = strike.at[rows, s.fish_x].max(fish_hit)
        strike = strike.at[rows, s.esub_x].max(esub_hit)
        fb_l = (fb_l.astype(jnp.bool_) & ~strike).astype(jnp.uint8)
        fb_r = (fb_r.astype(jnp.bool_) & ~strike).astype(jnp.uint8)

        # --- enemies march on the move period -------------------------
        move_now = s.move_timer == 0
        dxf = jnp.where(move_now, s.fish_dir, 0)
        fish_x = s.fish_x + jnp.where(fish_alive, dxf, 0)
        fish_off = (fish_x < 0) | (fish_x > 9)
        fish_alive = fish_alive & ~fish_off
        fish_x = jnp.clip(fish_x, 0, 9)
        dxs = jnp.where(move_now, s.esub_dir, 0)
        esub_x = s.esub_x + jnp.where(esub_alive, dxs, 0)
        esub_off = (esub_x < 0) | (esub_x > 9)
        esub_alive = esub_alive & ~esub_off
        esub_x = jnp.clip(esub_x, 0, 9)
        move_timer = jnp.where(move_now, s.move_speed, s.move_timer - 1)

        # divers drift on their own (slower) period
        d_move = s.diver_move_timer == 0
        diver_x = s.diver_x + jnp.where(s.diver_alive & d_move,
                                        s.diver_dir, 0)
        diver_off = (diver_x < 0) | (diver_x > 9)
        diver_alive = s.diver_alive & ~diver_off
        diver_x = jnp.clip(diver_x, 0, 9)
        diver_move_timer = jnp.where(d_move, _SQ_DIVER_MOVE_INTERVAL,
                                     s.diver_move_timer - 1)

        # --- enemy subs fire -------------------------------------------
        esub_shoot = esub_alive & (s.esub_shot_timer == 0)
        eb_l = jnp.where(
            jnp.any(esub_shoot & (s.esub_dir < 0)),
            eb_l.at[rows, jnp.clip(esub_x - 1, 0, 9)].max(
                (esub_shoot & (s.esub_dir < 0)).astype(jnp.uint8)), eb_l)
        eb_r = jnp.where(
            jnp.any(esub_shoot & (s.esub_dir > 0)),
            eb_r.at[rows, jnp.clip(esub_x + 1, 0, 9)].max(
                (esub_shoot & (s.esub_dir > 0)).astype(jnp.uint8)), eb_r)
        esub_shot_timer = jnp.where(
            esub_shoot, _SQ_ENEMY_SHOT_INTERVAL,
            jnp.maximum(s.esub_shot_timer - 1, 0))

        # --- contact: enemies / enemy bullets kill the player ----------
        eb = eb_l | eb_r
        in_lane = rows == sub_y
        terminal = terminal | (eb[sub_y, sub_x] == 1)
        terminal = terminal | jnp.any(
            in_lane & fish_alive & (fish_x == sub_x))
        terminal = terminal | jnp.any(
            in_lane & esub_alive & (esub_x == sub_x))

        # --- divers collected -------------------------------------------
        grab = in_lane & diver_alive & (diver_x == sub_x) \
            & (s.diver_count < 6)
        n_grab = jnp.sum(grab).astype(I32)
        diver_alive = diver_alive & ~grab
        diver_count = jnp.minimum(s.diver_count + n_grab, 6)

        # --- spawns ------------------------------------------------------
        e_spawn_now = s.e_spawn_timer == 0
        # fish 3:1 over enemy subs (spec's 1/3 sub probability)
        is_sub = jax.random.uniform(k_etype) < (1.0 / 3.0)
        e_dir = 2 * jax.random.randint(k_edir, (), 0, 2) - 1
        e_x0 = jnp.where(e_dir > 0, 0, 9)
        free_f = ~fish_alive
        free_s = ~esub_alive
        lane_f, ok_f = self._spawn_lane(k_elane, free_f)
        lane_s, ok_s = self._spawn_lane(k_elane, free_s)
        do_fish = e_spawn_now & ~is_sub & ok_f
        do_esub = e_spawn_now & is_sub & ok_s
        fish_x = jnp.where(do_fish, fish_x.at[lane_f].set(e_x0), fish_x)
        fish_dir = jnp.where(do_fish, s.fish_dir.at[lane_f].set(e_dir),
                             s.fish_dir)
        fish_alive = jnp.where(do_fish, fish_alive.at[lane_f].set(True),
                               fish_alive)
        esub_x = jnp.where(do_esub, esub_x.at[lane_s].set(e_x0), esub_x)
        esub_dir = jnp.where(do_esub, s.esub_dir.at[lane_s].set(e_dir),
                             s.esub_dir)
        esub_alive = jnp.where(do_esub, esub_alive.at[lane_s].set(True),
                               esub_alive)
        esub_shot_timer = jnp.where(
            do_esub, esub_shot_timer.at[lane_s].set(_SQ_ENEMY_SHOT_INTERVAL),
            esub_shot_timer)
        e_spawn_timer = jnp.where(e_spawn_now, s.e_spawn_speed,
                                  s.e_spawn_timer - 1)

        d_spawn_now = s.d_spawn_timer == 0
        d_dir = 2 * jax.random.randint(k_ddir, (), 0, 2) - 1
        d_x0 = jnp.where(d_dir > 0, 0, 9)
        lane_d, ok_d = self._spawn_lane(k_dlane, ~diver_alive)
        do_diver = d_spawn_now & ok_d
        diver_x = jnp.where(do_diver, diver_x.at[lane_d].set(d_x0), diver_x)
        diver_dir = jnp.where(do_diver, s.diver_dir.at[lane_d].set(d_dir),
                              s.diver_dir)
        diver_alive = jnp.where(do_diver, diver_alive.at[lane_d].set(True),
                                diver_alive)
        d_spawn_timer = jnp.where(d_spawn_now, _SQ_DIVER_SPAWN_SPEED,
                                  s.d_spawn_timer - 1)

        # --- oxygen & surfacing -------------------------------------------
        at_surface = sub_y == 0
        came_up = at_surface & ~s.surface
        # surfacing with no divers ends the game
        terminal = terminal | (came_up & (diver_count == 0))
        cash_all = came_up & (diver_count == 6)
        reward = reward + jnp.where(cash_all, 6.0, 0.0)
        # cash-in clears divers; a normal surface visit spends one diver
        diver_count = jnp.where(
            cash_all, 0,
            jnp.where(came_up & (diver_count > 0), diver_count - 1,
                      diver_count))
        oxygen = jnp.where(at_surface, _SQ_MAX_OXYGEN, s.oxygen - 1)
        terminal = terminal | (oxygen < 0)
        oxygen = jnp.maximum(oxygen, 0)

        # difficulty ramp on full cash-in
        e_spawn_speed = s.e_spawn_speed
        move_speed = s.move_speed
        if self.ramping:
            e_spawn_speed = jnp.where(
                cash_all & (e_spawn_speed > 5), e_spawn_speed - 1,
                e_spawn_speed)
            move_speed = jnp.where(
                cash_all & (move_speed > 2), move_speed - 1, move_speed)

        ns = SeaquestState(
            sub_x=sub_x, sub_y=sub_y, sub_or=sub_or,
            fb_l=fb_l, fb_r=fb_r, eb_l=eb_l, eb_r=eb_r,
            fish_x=fish_x, fish_dir=fish_dir, fish_alive=fish_alive,
            esub_x=esub_x, esub_dir=esub_dir, esub_alive=esub_alive,
            esub_shot_timer=esub_shot_timer,
            diver_x=diver_x, diver_dir=diver_dir, diver_alive=diver_alive,
            oxygen=oxygen, diver_count=diver_count,
            e_spawn_speed=e_spawn_speed, e_spawn_timer=e_spawn_timer,
            d_spawn_timer=d_spawn_timer,
            move_speed=move_speed, move_timer=move_timer,
            diver_move_timer=diver_move_timer,
            shot_timer=shot_timer, surface=at_surface,
            last_action=a, t=s.t + 1)
        return self._finish(ns, self._obs(ns), reward, terminal)


MINATAR_ENVS = {
    "breakout": Breakout,
    "space_invaders": SpaceInvaders,
    "asterix": Asterix,
    "freeway": Freeway,
    "seaquest": Seaquest,
}


def make_minatar(name: str, **kwargs) -> MinAtarEnv:
    """Factory (the Atari-path analogue of rlpyt AtariEnv(game=...))."""
    if name not in MINATAR_ENVS:
        raise ValueError(
            f"unknown minatar game {name!r}; have {sorted(MINATAR_ENVS)}")
    return MINATAR_ENVS[name](**kwargs)
