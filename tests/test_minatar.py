"""MinAtar game mechanics tests (deterministic: sticky_action_prob=0)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rlpyt_tpu.envs.minatar import (
    Asterix,
    Breakout,
    Freeway,
    SpaceInvaders,
    make_minatar,
    NOOP, LEFT, UP, RIGHT, DOWN, FIRE,
)


def rollout(env, key, actions):
    """Step a scripted action sequence; returns (obs, rewards, dones)."""
    state, obs = env.reset(jax.random.key(0))
    rewards, dones, obss = [], [], [obs]
    for i, a in enumerate(actions):
        state, step = env.step(jax.random.key(100 + i), state,
                               jnp.asarray(a), None)
        rewards.append(float(step.reward))
        dones.append(bool(step.done))
        obss.append(step.observation)
    return obss, rewards, dones, state


def test_factory():
    assert isinstance(make_minatar("breakout"), Breakout)
    with pytest.raises(ValueError):
        make_minatar("pitfall")


def test_breakout_shapes_and_determinism():
    env = Breakout(sticky_action_prob=0.0)
    s, obs = env.reset(jax.random.key(3))
    assert obs.shape == (4, 10, 10) and obs.dtype == jnp.uint8
    # 30 bricks in rows 1-3
    assert int(obs[3].sum()) == 30
    # paddle at row 9 col 4
    assert int(obs[0, 9, 4]) == 1
    # identical seeds → identical trajectories (deterministic env path)
    r1 = rollout(env, 0, [NOOP] * 20)
    r2 = rollout(env, 0, [NOOP] * 20)
    np.testing.assert_array_equal(np.asarray(r1[0][-1]),
                                  np.asarray(r2[0][-1]))
    assert r1[1] == r2[1]


def test_breakout_paddle_moves():
    env = Breakout(sticky_action_prob=0.0)
    s, _ = env.reset(jax.random.key(0))
    s1, st = env.step(jax.random.key(1), s, jnp.asarray(LEFT), None)
    assert int(s1.pos) == int(s.pos) - 1
    s2, _ = env.step(jax.random.key(2), s1, jnp.asarray(RIGHT), None)
    assert int(s2.pos) == int(s1.pos) + 1
    # clipping at wall
    for _ in range(12):
        s, _ = env.step(jax.random.key(5), s, jnp.asarray(LEFT), None)
    assert int(s.pos) == 0


def test_breakout_ball_breaks_bricks_and_dies():
    env = Breakout(sticky_action_prob=0.0, max_steps=10_000)
    s, _ = env.reset(jax.random.key(0))
    # Run with a stationary paddle until some bricks break and episode ends.
    total_r, done, steps = 0.0, False, 0
    while not done and steps < 400:
        s, st = env.step(jax.random.key(steps), s, jnp.asarray(NOOP), None)
        total_r += float(st.reward)
        done = bool(st.done)
        steps += 1
    assert total_r >= 1.0      # broke at least one brick on the way up
    assert int(s.brick_map.sum()) < 30
    assert done                # stationary paddle eventually misses


def test_breakout_learns_reward_is_bounded():
    # rewards are 0/1 per step
    env = Breakout(sticky_action_prob=0.0)
    _, rewards, _, _ = rollout(env, 0, [NOOP] * 100)
    assert all(r in (0.0, 1.0) for r in rewards)


def test_space_invaders_basics():
    env = SpaceInvaders(sticky_action_prob=0.0)
    s, obs = env.reset(jax.random.key(0))
    assert obs.shape == (6, 10, 10)
    assert int(s.alien_map.sum()) == 24   # 4 rows x 6 cols
    # firing spawns a friendly bullet that travels upward
    s1, _ = env.step(jax.random.key(1), s, jnp.asarray(FIRE), None)
    assert int(s1.f_bullet_map[8, 5]) == 1   # fired at row 9, rolled up
    # cooldown: immediate second fire is ignored
    s2, _ = env.step(jax.random.key(2), s1, jnp.asarray(FIRE), None)
    assert int(s2.f_bullet_map[8, 5]) == 0   # no new bullet at row 8->9
    assert int(s2.f_bullet_map[7, 5]) == 1   # first bullet advanced


def test_space_invaders_kills_score():
    env = SpaceInvaders(sticky_action_prob=0.0)
    s, _ = env.reset(jax.random.key(0))
    total_r, steps, done = 0.0, 0, False
    while steps < 200 and not done:
        a = FIRE if steps % 3 == 0 else NOOP
        s, st = env.step(jax.random.key(steps), s, jnp.asarray(a), None)
        total_r += float(st.reward)
        done = bool(st.done)
        steps += 1
    assert total_r >= 1.0   # shooting straight up kills aliens marching by


def test_asterix_spawn_and_gold():
    env = Asterix(sticky_action_prob=0.0, ramping=False)
    s, obs = env.reset(jax.random.key(0))
    assert obs.shape == (4, 10, 10)
    # after spawn_speed steps an entity must exist
    for i in range(11):
        s, st = env.step(jax.random.key(i), s, jnp.asarray(NOOP), None)
    assert int(s.ent_alive.sum()) >= 1
    # episode can terminate from enemy contact eventually (random policy)
    done, steps = False, 0
    key = jax.random.key(42)
    while not done and steps < 3000:
        key, k1, k2 = jax.random.split(key, 3)
        a = int(jax.random.randint(k1, (), 0, 5))
        s, st = env.step(k2, s, jnp.asarray(a), None)
        done = bool(st.done)
        steps += 1
    assert done


def test_freeway_crossing_scores():
    env = Freeway(sticky_action_prob=0.0)
    s, obs = env.reset(jax.random.key(1))
    assert obs.shape == (7, 10, 10)
    assert int(s.pos) == 9
    # one row from the goal with all traffic parked away from col 4:
    # stepping UP scores and respawns the chicken at the start row
    s = s._replace(pos=jnp.asarray(1), move_timer=jnp.asarray(0),
                   car_x=jnp.zeros((8,), jnp.int32))
    s, st = env.step(jax.random.key(7), s, jnp.asarray(UP), None)
    assert float(st.reward) == 1.0
    assert int(s.pos) == 9   # chicken respawned after scoring


def test_freeway_progress_under_traffic():
    env = Freeway(sticky_action_prob=0.0)
    s, _ = env.reset(jax.random.key(1))
    step = jax.jit(env.step)
    minpos = 9
    for i in range(500):
        s, st = step(jax.random.key(i), s, jnp.asarray(UP), None)
        minpos = min(minpos, int(s.pos))
    assert minpos <= 4   # the chicken makes it at least halfway


def test_freeway_time_limit():
    env = Freeway(sticky_action_prob=0.0, max_steps=50)
    s, _ = env.reset(jax.random.key(0))
    done, steps = False, 0
    while not done:
        s, st = env.step(jax.random.key(steps), s, jnp.asarray(NOOP), None)
        done = bool(st.done)
        steps += 1
        assert steps <= 51
    assert bool(st.info["timeout"])


def test_vmap_scan_compatibility():
    """All four games run under the rollout engine's vmap+scan."""
    from rlpyt_tpu.samplers.rollout import BatchSpec, Collector
    from rlpyt_tpu.agents.base import BaseAgent

    class RandomAgent(BaseAgent):
        def initialize(self, env_spaces):
            self.env_spaces = env_spaces

        def init_carry(self, B):
            return None

        def reset_carry_where(self, done, carry):
            return carry

        def step(self, params, key, observation, prev_action, prev_reward,
                 carry, ctx):
            from rlpyt_tpu.agents.base import AgentStep
            B = observation.shape[0]
            a = jax.random.randint(key, (B,), 0, 6)
            return AgentStep(a, {}), carry

    for name in ("breakout", "space_invaders", "asterix", "freeway",
                 "seaquest"):
        env = make_minatar(name)
        agent = RandomAgent()
        agent.initialize(env.spaces)
        col = Collector(env, agent, BatchSpec(T=8, B=4))
        state = col.init_state(jax.random.key(0))
        state, samples = jax.jit(col.collect)(None, state)
        assert samples.observation.shape == (8, 4, env.n_channels, 10, 10)
        assert bool(jnp.all(jnp.isfinite(samples.reward)))


def test_seaquest_mechanics():
    from rlpyt_tpu.envs.minatar import Seaquest, _SQ_MAX_OXYGEN

    env = Seaquest(sticky_action_prob=0.0)
    s, obs = env.reset(jax.random.key(0))
    assert obs.shape == (9, 10, 10) and obs.dtype == jnp.uint8
    # sub starts at surface (0, 5); oxygen gauge full on row 9
    assert int(obs[0, 0, 5]) == 1
    assert int(obs[7, 9].sum()) == 10
    # determinism
    r1 = rollout(env, 0, [DOWN] * 30)
    r2 = rollout(env, 0, [DOWN] * 30)
    np.testing.assert_array_equal(np.asarray(r1[0][-1]),
                                  np.asarray(r2[0][-1]))

    # oxygen depletes underwater and kills
    s, _ = env.reset(jax.random.key(0))
    s, _ = env.step(jax.random.key(1), s, jnp.asarray(DOWN), None)
    assert int(s.sub_y) == 1
    s = s._replace(oxygen=jnp.asarray(0, jnp.int32))
    # avoid other terminal causes: clear enemies
    s = s._replace(fish_alive=jnp.zeros(8, bool),
                   esub_alive=jnp.zeros(8, bool),
                   eb_l=jnp.zeros((10, 10), jnp.uint8),
                   eb_r=jnp.zeros((10, 10), jnp.uint8))
    s2, st = env.step(jax.random.key(2), s, jnp.asarray(NOOP), None)
    assert bool(st.done) and not bool(st.info["timeout"])

    # shooting a fish in the same lane scores
    s, _ = env.reset(jax.random.key(0))
    s = s._replace(sub_y=jnp.asarray(3, jnp.int32),
                   sub_x=jnp.asarray(2, jnp.int32),
                   sub_or=jnp.asarray(1, jnp.int32),
                   surface=jnp.asarray(False),
                   fish_alive=jnp.zeros(8, bool).at[2].set(True),
                   fish_x=jnp.zeros(8, jnp.int32).at[2].set(6),
                   fish_dir=jnp.zeros(8, jnp.int32).at[2].set(-1),
                   e_spawn_timer=jnp.asarray(100, jnp.int32),
                   move_timer=jnp.asarray(100, jnp.int32))
    s, st = env.step(jax.random.key(3), s, jnp.asarray(FIRE), None)
    total = float(st.reward)
    for i in range(6):
        s, st = env.step(jax.random.key(10 + i), s, jnp.asarray(NOOP), None)
        total += float(st.reward)
        if bool(st.done):
            break
    assert total >= 1.0  # bullet reached the fish

    # surfacing with zero divers is terminal
    s, _ = env.reset(jax.random.key(0))
    s, _ = env.step(jax.random.key(20), s, jnp.asarray(DOWN), None)
    s = s._replace(fish_alive=jnp.zeros(8, bool),
                   esub_alive=jnp.zeros(8, bool))
    s, st = env.step(jax.random.key(21), s, jnp.asarray(UP), None)
    assert bool(st.done)


def test_freeway_reference_cadences():
    """Pin the reference-exact dynamics (MinAtar freeway.py): chicken
    moves every 3 frames (cooldown decrements the same step it is set),
    cars advance every period+1 frames, and all cars (re)spawn at x=0."""
    env = Freeway(sticky_action_prob=0.0)
    s, _ = env.reset(jax.random.key(3))
    assert np.all(np.asarray(s.car_x) == 0)       # spawn wall at x=0

    # chicken cadence: park traffic far from col 4, hold UP
    s = s._replace(car_x=jnp.zeros((8,), jnp.int32),
                   car_dir=jnp.zeros((8,), jnp.int32),
                   car_period=jnp.full((8,), 5, jnp.int32),
                   car_timer=jnp.full((8,), 500, jnp.int32),
                   move_timer=jnp.asarray(0, jnp.int32))
    poss = []
    for i in range(9):
        s, st = env.step(jax.random.key(i), s, jnp.asarray(UP), None)
        poss.append(int(s.pos))
    # moves at steps 0, 3, 6 → pos 8, 7, 6
    assert poss == [8, 8, 8, 7, 7, 7, 6, 6, 6], poss

    # car cadence: period p advances every p+1 frames
    env2 = Freeway(sticky_action_prob=0.0)
    s2, _ = env2.reset(jax.random.key(5))
    s2 = s2._replace(car_x=jnp.zeros((8,), jnp.int32),
                     car_dir=jnp.ones((8,), jnp.int32),
                     car_period=jnp.asarray([1, 2, 3, 4, 5, 5, 5, 5],
                                            jnp.int32),
                     car_timer=jnp.asarray([1, 2, 3, 4, 5, 5, 5, 5],
                                           jnp.int32),
                     pos=jnp.asarray(9, jnp.int32))
    xs = []
    for i in range(10):
        s2, _ = env2.step(jax.random.key(i), s2, jnp.asarray(NOOP), None)
        xs.append(int(s2.car_x[0]))
    # period-1 car: first move when its timer hits 0 (after 1 decrement),
    # then every 2 frames
    assert xs == [0, 1, 1, 2, 2, 3, 3, 4, 4, 5], xs
