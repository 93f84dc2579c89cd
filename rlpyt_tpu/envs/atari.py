"""ALE Atari host environment (reference:
rlpyt/envs/atari/atari_env.py:AtariEnv ~L30-250).

Reproduces the reference's preprocessing exactly, over the host bridge
(envs/host.py) since the C++ emulator cannot run on-device:

- grayscale screen, 2x subsample to **104x80** (the reference's
  deliberate departure from the usual 84x84),
- ``frame_skip=4`` with max over the last two raw frames (the frame
  before the last act and the frame after it),
- in-env frame stack ``num_img_obs=4`` -> obs uint8 [4, 104, 80] (NCHW),
- ``episodic_lives``: done on life loss, but the emulator is NOT hard
  reset -- the env internally advances past the lost-life state (noop +
  optional FIRE) and zeroes the frame stack; the farm hard-resets only
  on ``traj_done`` (true game over / horizon), exactly like rlpyt's
  collectors which call ``env.reset()`` only when
  ``env_info.traj_done`` (samplers/parallel/cpu/collectors.py ~L40),
- ``clip_reward``: reward = sign(game_score); the raw unclipped score
  is always reported as ``info["game_score"]`` feeding the GameScore
  trajectory stat (rlpyt AtariTrajInfo),
- ``repeat_action_probability`` sticky actions (handled by the ALE),
- ``fire_on_reset`` option, ``max_start_noops`` decorrelation,
- ``horizon`` cap surfaced as truncation (+ traj_done).

The emulator object is injectable (``ale_factory``) so the full
preprocessing/lives/reset state machine is unit-tested against a
scripted fake (tests/fake_ale.py) even where ``ale_py`` is absent; with
``ale_py`` installed the default factory binds the real emulator and
the Pong/Breakout configs (experiments/configs/atari_dqn.py) run as-is.
"""
from __future__ import annotations

from typing import Any, Callable, Dict, Optional, Tuple

import numpy as np

from rlpyt_tpu.envs.base import EnvSpaces
from rlpyt_tpu.spaces import IntBox

H, W = 104, 80  # reference's 2x-subsampled frame (atari_env.py ~L60)
RAW_H, RAW_W = 210, 160


def _real_ale(game: str, repeat_action_probability: float,
              seed: Optional[int]):
    """Build a real ale_py emulator (import gated at use time)."""
    try:
        from ale_py import ALEInterface
    except ImportError as e:
        raise ImportError(
            "AtariEnv needs ale_py (the C++ Atari emulator). Install "
            "ale_py + ROMs, or pass ale_factory= (e.g. the FakeALE test "
            "double), or use the on-device MinAtar path "
            "(rlpyt_tpu.envs.minatar) / gymnasium host envs.") from e
    ale = ALEInterface()
    if seed is not None:
        ale.setInt("random_seed", int(seed) % (2 ** 31))
    ale.setFloat("repeat_action_probability", repeat_action_probability)
    import ale_py.roms as roms
    name = game.capitalize()
    ale.loadROM(getattr(roms, name) if hasattr(roms, name)
                else roms.get_rom_path(game))
    return ale


class AtariEnv:
    """Host-side env with the framework's host contract
    (reset(seed) -> obs; step(a) -> (obs, reward, terminated, truncated,
    info)); plug into SerialVecEnv/SharedMemVecEnv via
    ``lambda: AtariEnv(game)``.

    ``info`` carries the reference's EnvInfo fields: ``game_score`` (raw
    unclipped reward this step) and ``traj_done`` (true game over --
    controls env hard-reset and trajectory completion, while ``done``
    controls bootstrapping and rnn reset; rlpyt envs/atari/atari_env.py
    step ~L120).
    """

    # Static host-farm info schema (envs/host.py allocates one shared
    # block per key): name -> (dtype, shape).
    info_spec: Dict[str, Tuple[np.dtype, tuple]] = {
        "game_score": (np.dtype(np.float32), ()),
        "traj_done": (np.dtype(np.bool_), ()),
    }

    def __init__(self, game: str = "pong", frame_skip: int = 4,
                 num_img_obs: int = 4, clip_reward: bool = True,
                 episodic_lives: bool = True,
                 max_start_noops: int = 30,
                 repeat_action_probability: float = 0.25,
                 fire_on_reset: bool = False,
                 horizon: int = 27_000,
                 seed: Optional[int] = None,
                 ale_factory: Optional[Callable[[], Any]] = None):
        self.ale = (ale_factory() if ale_factory is not None
                    else _real_ale(game, repeat_action_probability, seed))
        if ale_factory is not None:
            # Configure the injected emulator like the real path does.
            if seed is not None:
                self.ale.setInt("random_seed", int(seed) % (2 ** 31))
            self.ale.setFloat("repeat_action_probability",
                              repeat_action_probability)
        self.game = game
        self.frame_skip = frame_skip
        self.num_img_obs = num_img_obs
        self.clip_reward = clip_reward
        self.episodic_lives = episodic_lives
        self.max_start_noops = max_start_noops
        self.fire_on_reset = fire_on_reset
        self.horizon = horizon
        self._actions = list(self.ale.getMinimalActionSet())
        self.action_space = IntBox(0, len(self._actions))
        self.observation_space = IntBox(0, 256,
                                        shape=(num_img_obs, H, W),
                                        dtype="uint8")
        raw_h, raw_w = getattr(self.ale, "raw_shape", (RAW_H, RAW_W))
        self._raw = np.zeros((2, raw_h, raw_w), np.uint8)
        self._obs = np.zeros((num_img_obs, H, W), np.uint8)
        self._rng = np.random.RandomState(seed)
        self._t = 0
        self._lives = 0

    @property
    def spaces(self) -> EnvSpaces:
        return EnvSpaces(self.observation_space, self.action_space)

    # ------------------------------------------------------------------

    def _subsample(self, raw: np.ndarray) -> np.ndarray:
        """Grayscale 2x subsample (atari_env.py:_get_screen ~L150):
        210x160 -> 104x80 via [1:-1:2, ::2]."""
        return raw[1:-1:2, ::2]

    def _push_frame(self, frame: np.ndarray):
        self._obs[:-1] = self._obs[1:]
        self._obs[-1] = frame

    def _fire(self):
        """FIRE (+UP for some games) to start play (atari_env.py
        fire_and_up ~L200); minimal action sets put FIRE at index 1."""
        if len(self._actions) > 1:
            self.ale.act(self._actions[1])

    def _life_reset(self):
        """Advance past the lost-life freeze (atari_env.py:_life_reset
        ~L210): one noop (+ optional FIRE), then re-latch lives."""
        self.ale.act(0)
        if self.fire_on_reset:
            self._fire()
        self._lives = self.ale.lives()

    def reset(self, seed: Optional[int] = None) -> np.ndarray:
        """Hard reset of the ALE game (atari_env.py:reset ~L100).  Only
        called by collectors at traj_done; life-loss dones are handled
        internally by step.  ``seed`` re-seeds the noop-start RNG (the
        emulator seed is fixed at construction -- the ALE only honors
        random_seed before loadROM)."""
        if seed is not None:
            self._rng = np.random.RandomState(seed)
            self.ale.setInt("random_seed", int(seed) % (2 ** 31))
        self.ale.reset_game()
        self._obs[:] = 0
        for _ in range(self._rng.randint(0, self.max_start_noops + 1)):
            self.ale.act(0)
        if self.fire_on_reset:
            self._fire()
        self._lives = self.ale.lives()
        self.ale.getScreenGrayscale(self._raw[0])
        self._push_frame(self._subsample(self._raw[0]))
        self._t = 0
        return self._obs.copy()

    def step(self, action):
        """(atari_env.py:step ~L110).  Order matters for parity:
        frame-skip acts (screen captured before the last act) -> life
        check (internal life reset advances the emulator) -> final
        screen + max-pool -> frame push (onto a zeroed stack if a life
        was lost)."""
        a = self._actions[int(action)]
        game_score = 0.0
        for k in range(self.frame_skip):
            game_score += self.ale.act(a)
            if k == self.frame_skip - 2:
                self.ale.getScreenGrayscale(self._raw[1])

        lives = self.ale.lives()
        lost_life = (lives < self._lives) and (lives > 0)
        if lost_life:
            self._life_reset()
        game_over = bool(self.ale.game_over())

        self.ale.getScreenGrayscale(self._raw[0])
        np.maximum(self._raw[0], self._raw[1], out=self._raw[0])
        if lost_life and self.episodic_lives:
            self._obs[:] = 0  # internal obs reset (_reset_obs ~L190)
        self._push_frame(self._subsample(self._raw[0]))

        self._t += 1
        truncated = (self._t >= self.horizon) and not game_over
        terminated = game_over or (self.episodic_lives and lost_life)
        traj_done = game_over or truncated
        reward = float(np.sign(game_score)) if self.clip_reward \
            else float(game_score)
        info = {"game_score": np.float32(game_score),
                "traj_done": traj_done}
        return (self._obs.copy(), reward, bool(terminated),
                bool(truncated), info)

    def close(self):
        pass
