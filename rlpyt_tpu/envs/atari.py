"""ALE Atari host environment (reference:
rlpyt/envs/atari/atari_env.py:AtariEnv ~L30-250).

Reproduces the reference's preprocessing exactly, over the host bridge
(envs/host.py) since the C++ emulator cannot run on-device:

- grayscale screen, 2× subsample to **104×80** (the reference's
  deliberate departure from the usual 84×84),
- ``frame_skip=4`` with max over the last two raw frames,
- in-env frame stack ``num_img_obs=4`` → obs uint8 [4, 104, 80] (NCHW),
- ``episodic_lives`` (done on life loss, reset only on true game over),
- ``repeat_action_probability`` sticky actions (handled by ALE),
- ``fire_on_reset`` option, ``max_start_noops`` decorrelation,
- ``horizon`` cap surfaced as ``timeout``.

Requires ``ale_py`` (not bundled in every image); constructing without
it raises ImportError with guidance.  The observation/replay path is
exercised in CI via the frame-compressed buffers and MinAtar; this
adapter is the exact-parity surface when ALE is installed.
"""
from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

from rlpyt_tpu.envs.base import EnvSpaces
from rlpyt_tpu.spaces import IntBox

H, W = 104, 80  # reference's 2x-subsampled frame (atari_env.py ~L60)


class AtariEnv:
    """Host-side env with the framework's host contract
    (reset(seed) -> obs; step(a) -> (obs, reward, terminated, truncated));
    plug into SerialVecEnv/SharedMemVecEnv via ``lambda: AtariEnv(game)``.
    """

    def __init__(self, game: str = "pong", frame_skip: int = 4,
                 num_img_obs: int = 4, episodic_lives: bool = True,
                 max_start_noops: int = 30,
                 repeat_action_probability: float = 0.25,
                 fire_on_reset: bool = False,
                 horizon: int = 27_000):
        try:
            import ale_py  # noqa: F401
            from ale_py import ALEInterface
        except ImportError as e:
            raise ImportError(
                "AtariEnv needs ale_py (the C++ Atari emulator). Install "
                "ale_py + ROMs, or use the on-device MinAtar path "
                "(rlpyt_tpu.envs.minatar) / gymnasium host envs.") from e
        self.ale = ALEInterface()
        self.ale.setFloat("repeat_action_probability",
                          repeat_action_probability)
        import ale_py.roms as roms
        self.ale.loadROM(getattr(roms, game.capitalize())
                         if hasattr(roms, game.capitalize())
                         else roms.get_rom_path(game))
        self.frame_skip = frame_skip
        self.num_img_obs = num_img_obs
        self.episodic_lives = episodic_lives
        self.max_start_noops = max_start_noops
        self.fire_on_reset = fire_on_reset
        self.horizon = horizon
        self._actions = self.ale.getMinimalActionSet()
        self.action_space = IntBox(0, len(self._actions))
        self.observation_space = IntBox(0, 256,
                                        shape=(num_img_obs, H, W),
                                        dtype="uint8")
        self._raw = np.zeros((2, 210, 160), np.uint8)
        self._obs = np.zeros((num_img_obs, H, W), np.uint8)
        self._rng = np.random.RandomState()
        self._t = 0
        self._lives = 0

    @property
    def spaces(self) -> EnvSpaces:
        return EnvSpaces(self.observation_space, self.action_space)

    # ------------------------------------------------------------------

    def _frame(self) -> np.ndarray:
        """Grayscale + 2x subsample (atari_env.py:_get_screen ~L150)."""
        self.ale.getScreenGrayscale(self._raw[0])
        return self._raw[0][1:-1:2, ::2]  # 210x160 -> 104x80

    def _update_obs(self):
        self._obs[:-1] = self._obs[1:]
        self._obs[-1] = self._frame()

    def reset(self, seed: Optional[int] = None) -> np.ndarray:
        if seed is not None:
            self._rng = np.random.RandomState(seed)
            self.ale.setInt("random_seed", int(seed) % (2**31))
        self.ale.reset_game()
        for _ in range(self._rng.randint(0, self.max_start_noops + 1)):
            self.ale.act(0)
        if self.fire_on_reset:
            self._fire()
        self._obs[:] = 0
        self._update_obs()
        self._t = 0
        self._lives = self.ale.lives()
        return self._obs.copy()

    def _fire(self):
        if 1 < len(self._actions):
            self.ale.act(self._actions[1])  # FIRE in minimal sets

    def step(self, action) -> Tuple[np.ndarray, float, bool, bool]:
        a = self._actions[int(action)]
        reward = 0.0
        for k in range(self.frame_skip):
            reward += self.ale.act(a)
            if k == self.frame_skip - 2:
                self.ale.getScreenGrayscale(self._raw[1])
        game_over = self.ale.game_over()
        # max over last two raw frames (flicker removal, ~L180)
        self.ale.getScreenGrayscale(self._raw[0])
        np.maximum(self._raw[0], self._raw[1], out=self._raw[0])
        self._obs[:-1] = self._obs[1:]
        self._obs[-1] = self._raw[0][1:-1:2, ::2]

        lives = self.ale.lives()
        life_lost = self.episodic_lives and (lives < self._lives) and (
            lives > 0)
        self._lives = lives
        self._t += 1
        truncated = self._t >= self.horizon and not game_over
        terminated = game_over or life_lost
        if game_over:
            pass  # caller resets
        elif life_lost and self.fire_on_reset:
            self._fire()
        return self._obs.copy(), float(reward), bool(terminated), bool(
            truncated)

    def close(self):
        pass
