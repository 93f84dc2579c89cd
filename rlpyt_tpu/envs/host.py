"""Host-environment bridge (reference: rlpyt/envs/gym.py:GymEnvWrapper +
rlpyt/samplers/parallel/ worker/shared-memory machinery —
samplers/parallel/base.py:ParallelSamplerBase, worker.py:sampling_process,
gpu/action_server.py:ActionServer).

Non-JAX environments (gymnasium MuJoCo, ALE, any C++ simulator) cannot
live inside jit.  This module is the host side of the actor loop:

- ``GymEnv``: one gymnasium env normalized to the framework contract —
  EnvStep(obs, reward, done, info) with a **static info schema**
  (``timeout`` for TimeLimit truncation, feeding the time-limit-aware
  replay path, as rlpyt's EnvInfoWrapper + TlReplay did).
- ``SharedMemVecEnv``: B envs across W forked worker processes writing
  observations into OS-shared numpy blocks, synchronized per step by
  per-worker event pairs — the same topology as rlpyt's GpuSampler
  (workers step envs; the master batches policy inference), with CPU
  pinning like rlpyt's affinity system.  The master never copies obs:
  the shared block is handed to ``jax.device_put`` directly.
- ``SerialVecEnv``: in-process fallback (rlpyt SerialSampler parity,
  and the debugging reference path).

The device side of this bridge is ``runners/host.py:HostMinibatchRl``.
"""
from __future__ import annotations

import multiprocessing as mp
import os
from typing import Any, Callable, Dict, Optional, Sequence, Tuple

import numpy as np

from rlpyt_tpu.envs.gym_space import convert_gym_space
from rlpyt_tpu.envs.base import EnvSpaces


def tmap(fn, tree, *rest):
    """Map over host observation pytrees (dict-of-arrays, possibly
    nested, or a bare array) — the host-side mirror of the device
    pytree observations that Composite spaces produce (reference:
    rlpyt's namedarraytuple indexing crossed nesting the same way,
    utils/collections.py ~L20)."""
    if isinstance(tree, dict):
        return {k: tmap(fn, tree[k], *[r[k] for r in rest]) for k in tree}
    return fn(tree, *rest)


def twrite(dst, b, src):
    """``dst[b] = src`` on every leaf of an obs pytree."""
    if isinstance(dst, dict):
        for k in dst:
            twrite(dst[k], b, src[k])
    else:
        dst[b] = src


def tconcat(trees):
    """Concatenate a list of obs pytrees along axis 0."""
    if isinstance(trees[0], dict):
        return {k: tconcat([t[k] for t in trees]) for k in trees[0]}
    return np.concatenate([np.asarray(t) for t in trees])


class GymEnv:
    """(rlpyt/envs/gym.py:GymEnvWrapper ~L10).  Wraps one gymnasium env:
    merges terminated/truncated into ``done`` + ``timeout`` info flag;
    auto-seeds per reset call.  Dict observation spaces pass through as
    dict-of-array pytrees (rlpyt/spaces/gym_wrapper.py:GymSpaceWrapper
    mapped gym Dict onto Composite/namedarraytuple the same way)."""

    def __init__(self, id_or_env, **kwargs):
        if isinstance(id_or_env, str):
            import gymnasium
            self.env = gymnasium.make(id_or_env, **kwargs)
        else:
            self.env = id_or_env
        self.observation_space = convert_gym_space(self.env.observation_space)
        self.action_space = convert_gym_space(self.env.action_space)

    @property
    def spaces(self) -> EnvSpaces:
        return EnvSpaces(self.observation_space, self.action_space)

    def reset(self, seed: Optional[int] = None) -> np.ndarray:
        obs, _ = self.env.reset(seed=seed)
        return tmap(np.asarray, dict(obs) if isinstance(obs, dict)
                    else obs)

    def step(self, action) -> Tuple[np.ndarray, float, bool, bool]:
        obs, reward, terminated, truncated, _ = self.env.step(action)
        obs = tmap(np.asarray, dict(obs) if isinstance(obs, dict) else obs)
        return obs, float(reward), bool(terminated), bool(truncated)

    def close(self):
        self.env.close()


# ---------------------------------------------------------------------------

CMD_STEP, CMD_RESET, CMD_CLOSE = 0, 1, 2


def _make_env(spec):
    """spec: a gym id string (picklable → spawn-safe) or a callable.
    Callables may return either a gymnasium env (wrapped in GymEnv) or
    any object already speaking the host contract (``.spaces`` +
    reset/step — e.g. envs/atari.py:AtariEnv), used as-is."""
    if isinstance(spec, str):
        return GymEnv(spec)
    env = spec()
    return env if hasattr(env, "spaces") else GymEnv(env)


def _info_spec(env) -> Dict[str, Tuple[np.dtype, tuple]]:
    """Static per-step info schema (rlpyt's EnvInfoWrapper made the
    schema static the same way); ``timeout`` has its own channel."""
    return dict(getattr(env, "info_spec", {}))


def _step5(env, action):
    """Normalize env.step to (obs, reward, terminated, truncated, info);
    envs without an info channel return 4-tuples."""
    out = env.step(action)
    if len(out) == 4:
        return out + ({},)
    return out


class _EventMasterSync:
    """multiprocessing.Event fallback sync (portable; 2·W syscalls/step).
    The fast path is the futex barrier in csrc/hostfarm.c."""

    def __init__(self, pairs, cmd_value):
        self._pairs = pairs
        self._cmd = cmd_value

    def signal(self, cmd: int):
        self._cmd.value = cmd
        for act_ready, _ in self._pairs:
            act_ready.set()

    def wait(self):
        for _, obs_ready in self._pairs:
            obs_ready.wait()
            obs_ready.clear()


class _EventWorkerSync:
    def __init__(self, act_ready, obs_ready, cmd_value):
        self._act = act_ready
        self._obs = obs_ready
        self._cmd = cmd_value

    def wait(self) -> int:
        self._act.wait()
        self._act.clear()
        return int(self._cmd.value)

    def post(self):
        self._obs.set()


def _worker(env_fns, lo, hi, shm, info_shm, sync, seed,
            cpu: Optional[int], ready_spec=None):
    """(rlpyt/samplers/parallel/worker.py:sampling_process ~L10): own a
    slice [lo, hi) of envs, loop on the step barrier, auto-reset on
    traj_done.  Envs exposing ``traj_done`` in info (episodic-lives
    Atari) are hard-reset only on true game over — life-loss dones
    leave the emulator mid-game, exactly rlpyt's CpuResetCollector
    which calls env.reset() only on ``env_info.traj_done`` (~L40)."""
    if cpu is not None:
        try:
            os.sched_setaffinity(0, {cpu})
        except OSError:
            pass
    envs = [_make_env(fn) for fn in env_fns[lo:hi]]
    obs_spec, act_spec, rew_spec, done_spec, timeout_spec = shm
    obs_np = tmap(lambda sp: sp.view(), obs_spec)
    act_np, rew_np, done_np, timeout_np = (
        spec.view() for spec in (act_spec, rew_spec, done_spec,
                                 timeout_spec))
    info_np = {k: spec.view() for k, spec in info_shm.items()}
    if ready_spec is not None:
        # startup handshake: the master polls this instead of blocking
        # on the step barrier, so a worker that dies during init (e.g.
        # spawn re-import failure) raises there instead of deadlocking.
        ready_spec.view()[lo:hi] = True
    while True:
        c = sync.wait()
        if c == CMD_CLOSE:
            for e in envs:
                e.close()
            sync.post()
            return
        for i, env in enumerate(envs):
            b = lo + i
            if c == CMD_RESET:
                twrite(obs_np, b, env.reset(seed=seed + b))
                rew_np[b] = 0.0
                done_np[b] = False
                timeout_np[b] = False
                for v in info_np.values():
                    v[b] = 0
            else:
                obs, rew, terminated, truncated, info = _step5(
                    env, act_np[b])
                done = terminated or truncated
                if info.get("traj_done", done):
                    obs = env.reset()
                twrite(obs_np, b, obs)
                rew_np[b] = rew
                done_np[b] = done
                timeout_np[b] = truncated and not terminated
                for k, v in info_np.items():
                    v[b] = info.get(k, 0)
        sync.post()


class _ShmSpec:
    """RawArray handle + shape/dtype — picklable for spawn workers, which
    rebuild numpy views over the same shared pages (the spawn-safe form
    of rlpyt's np_mp_array, utils/buffer.py ~L60)."""

    def __init__(self, shape, dtype, ctx):
        self.shape = tuple(shape)
        self.dtype = np.dtype(dtype)
        size = max(1, int(np.prod(shape)) * self.dtype.itemsize)
        self.raw = ctx.RawArray("b", size)

    def view(self) -> np.ndarray:
        return np.frombuffer(self.raw, dtype=self.dtype).reshape(self.shape)


class SharedMemVecEnv:
    """B host envs over W workers + shared-memory step buffers
    (rlpyt ParallelSamplerBase.initialize ~L40: n_envs_list, shared
    buffer, fork; synchronization per step like the GPU action server's
    obs_ready/act_ready semaphore pairs)."""

    def __init__(self, env_fns: Sequence, n_workers: int = 0,
                 seed: int = 0, cpus: Optional[Sequence[int]] = None,
                 start_method: Optional[str] = None, sync: str = "auto"):
        """``env_fns``: gym id strings (picklable → the farm uses
        ``spawn``, safe after JAX initializes) or callables (requires
        ``fork`` — create the farm BEFORE the first JAX computation).

        ``sync``: "c" = futex barrier (csrc/hostfarm.c, one C call per
        side per step), "events" = multiprocessing.Event pairs, "auto" =
        C when the library builds, else events."""
        self.B = len(env_fns)
        probe = _make_env(env_fns[0])
        self.spaces = probe.spaces
        obs_space = self.spaces.observation
        obs_null = tmap(np.asarray, obs_space.null_value())
        act_space = self.spaces.action
        act_shape = tuple(getattr(act_space, "shape", ()) or ())
        act_dtype = np.dtype(str(act_space.null_value().dtype))
        info_spec = _info_spec(probe)
        probe.close()

        W = n_workers or min(self.B, os.cpu_count() or 1)
        assert self.B % W == 0, f"B={self.B} must divide over {W} workers"
        per = self.B // W
        if start_method is None:
            start_method = ("spawn" if all(isinstance(f, str)
                                           for f in env_fns) else "fork")
        ctx = mp.get_context(start_method)

        obs_spec = tmap(
            lambda x: _ShmSpec((self.B,) + x.shape, x.dtype, ctx),
            obs_null)
        specs = (
            obs_spec,
            _ShmSpec((self.B,) + act_shape, act_dtype, ctx),
            _ShmSpec((self.B,), np.float32, ctx),
            _ShmSpec((self.B,), np.bool_, ctx),
            _ShmSpec((self.B,), np.bool_, ctx),
        )
        self.obs = tmap(lambda sp: sp.view(), obs_spec)
        self.act, self.rew, self.done, self.timeout = (
            sp.view() for sp in specs[1:])
        shm = specs
        info_shm = {k: _ShmSpec((self.B,) + tuple(shape), dtype, ctx)
                    for k, (dtype, shape) in info_spec.items()}
        self.info = {k: sp.view() for k, sp in info_shm.items()}

        from rlpyt_tpu.envs import hostfarm_c
        use_c = (sync == "c") or (sync == "auto"
                                  and hostfarm_c.get_lib() is not None)
        if use_c and hostfarm_c.get_lib() is None:
            raise RuntimeError("sync='c' requested but the hostfarm "
                               "library failed to build")
        if use_c:
            ctrl = _ShmSpec(
                (hostfarm_c.CTRL_SLOTS_BASE
                 + hostfarm_c.CTRL_SLOTS_PER_WORKER * W,),
                np.uint32, ctx)
            self._sync = hostfarm_c.CFarmMaster(ctrl, W)
            worker_syncs = [hostfarm_c.CFarmWorker(ctrl, w)
                            for w in range(W)]
        else:
            cmd_value = ctx.Value("i", CMD_STEP)
            pairs = [(ctx.Event(), ctx.Event()) for _ in range(W)]
            self._sync = _EventMasterSync(pairs, cmd_value)
            worker_syncs = [_EventWorkerSync(a, o, cmd_value)
                            for a, o in pairs]
        self.sync_impl = "c" if use_c else "events"

        ready_spec = _ShmSpec((self.B,), np.bool_, ctx)
        self._ready = ready_spec.view()
        self._procs = []
        for w in range(W):
            cpu = cpus[w % len(cpus)] if cpus else None
            p = ctx.Process(
                target=_worker,
                args=(list(env_fns), w * per, (w + 1) * per, shm,
                      info_shm, worker_syncs[w], seed, cpu, ready_spec),
                daemon=True)
            p.start()
            self._procs.append(p)
        self.closed = False
        self._await_workers(timeout=120.0)

    def _await_workers(self, timeout: float):
        """Fail fast instead of deadlocking on the step barrier when a
        worker dies during startup (rlpyt's known failure mode: a
        crashed worker hangs the barrier forever, SURVEY §5.3)."""
        import time as _time
        deadline = _time.monotonic() + timeout
        while not bool(self._ready.all()):
            dead = [p for p in self._procs if not p.is_alive()]
            if dead:
                self.closed = True  # workers gone; skip barrier close
                raise RuntimeError(
                    f"{len(dead)} farm worker(s) died during startup "
                    f"(exitcodes {[p.exitcode for p in dead]}). With "
                    "gym-id env_fns the farm uses the 'spawn' start "
                    "method, which cannot re-import an interactive or "
                    "stdin __main__ — run from a file, or pass env "
                    "callables (fork), or start_method='fork'.")
            if _time.monotonic() > deadline:
                # Mark closed before raising so the destructor's close()
                # does not signal the step barrier at wedged-but-alive
                # workers (which could hang interpreter shutdown).
                self.closed = True
                for p in self._procs:
                    p.terminate()
                raise RuntimeError("farm workers not ready within "
                                   f"{timeout}s")
            _time.sleep(0.02)

    def _signal_and_wait(self, cmd: int):
        self._sync.signal(cmd)
        self._sync.wait()

    def reset(self) -> np.ndarray:
        self._signal_and_wait(CMD_RESET)
        return self.obs

    def step(self, actions: np.ndarray):
        """Write actions, step all workers, return views into shared
        memory: (obs, reward, done, timeout)."""
        self.act[...] = actions
        self._signal_and_wait(CMD_STEP)
        return self.obs, self.rew, self.done, self.timeout

    def close(self):
        if not self.closed:
            self._signal_and_wait(CMD_CLOSE)
            for p in self._procs:
                p.join(timeout=5)
            self.closed = True

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass


class SerialVecEnv:
    """In-process vectorized host envs (rlpyt SerialSampler parity)."""

    def __init__(self, env_fns: Sequence[Callable], seed: int = 0, **_):
        self.envs = [_make_env(fn) for fn in env_fns]
        self.B = len(self.envs)
        self.spaces = self.envs[0].spaces
        self.seed = seed
        obs_null = tmap(np.asarray, self.spaces.observation.null_value())
        self.obs = tmap(
            lambda x: np.zeros((self.B,) + x.shape, x.dtype), obs_null)
        self.rew = np.zeros((self.B,), np.float32)
        self.done = np.zeros((self.B,), np.bool_)
        self.timeout = np.zeros((self.B,), np.bool_)
        self.info = {k: np.zeros((self.B,) + tuple(shape), dtype)
                     for k, (dtype, shape)
                     in _info_spec(self.envs[0]).items()}

    def reset(self) -> np.ndarray:
        for b, env in enumerate(self.envs):
            twrite(self.obs, b, env.reset(seed=self.seed + b))
        for v in self.info.values():
            v[:] = 0
        return self.obs

    def step(self, actions: np.ndarray):
        for b, env in enumerate(self.envs):
            obs, rew, terminated, truncated, info = _step5(env, actions[b])
            done = terminated or truncated
            if info.get("traj_done", done):  # see _worker on traj_done
                obs = env.reset()
            twrite(self.obs, b, obs)
            self.rew[b] = rew
            self.done[b] = done
            self.timeout[b] = truncated and not terminated
            for k, v in self.info.items():
                v[b] = info.get(k, 0)
        return self.obs, self.rew, self.done, self.timeout

    def close(self):
        for env in self.envs:
            env.close()


class PairedVecEnv:
    """Two env-farm halves stepped out of phase by the alternating host
    runner (rlpyt samplers/parallel/gpu/alternating_sampler.py:
    AlternatingSampler ~L15 — worker halves alternate so env simulation
    overlaps batched device inference).

    Presents the combined farm (B = B_a + B_b, lanes of half a first) so
    generic code (algo sizing, resets, eval) sees one vec env; the
    alternating collector reaches the halves via ``.halves``.
    """

    def __init__(self, vec_a, vec_b):
        self.halves = (vec_a, vec_b)
        self.B = vec_a.B + vec_b.B
        self.spaces = vec_a.spaces

    @property
    def obs(self) -> np.ndarray:
        return tconcat([h.obs for h in self.halves])

    @property
    def info(self) -> Dict[str, np.ndarray]:
        a, b = (getattr(h, "info", {}) for h in self.halves)
        return {k: np.concatenate([np.asarray(a[k]), np.asarray(b[k])])
                for k in a}

    def reset(self) -> np.ndarray:
        return tconcat([h.reset() for h in self.halves])

    def step(self, actions: np.ndarray):
        """Lock-step step of both halves (non-alternating fallback)."""
        b_a = self.halves[0].B
        out_a = self.halves[0].step(actions[:b_a])
        out_b = self.halves[1].step(actions[b_a:])
        return tuple(tconcat([a, b]) for a, b in zip(out_a, out_b))

    def close(self):
        for h in self.halves:
            h.close()
