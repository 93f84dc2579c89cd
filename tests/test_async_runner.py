"""Async (pipelined) runner: decoupled update rate + overlap correctness."""
import jax
import numpy as np

from rlpyt_tpu.agents.dqn import DqnAgent
from rlpyt_tpu.algos.dqn import DQN
from rlpyt_tpu.envs.classic import CartPole
from rlpyt_tpu.models.dqn import DqnMlpModel
from rlpyt_tpu.runners.async_rl import AsyncRl
from rlpyt_tpu.runners.train import MinibatchRl
from rlpyt_tpu.samplers.rollout import BatchSpec


def make(runner_cls, **kw):
    agent = DqnAgent(ModelCls=DqnMlpModel,
                     model_kwargs=dict(hidden_sizes=(32,)),
                     eps_steps=2_000)
    algo = DQN(batch_size=32, min_steps_learn=128, replay_size=4_096,
               replay_ratio=1.0, target_update_interval=50,
               learning_rate=1e-3)
    return runner_cls(algo=algo, agent=agent, env=CartPole(),
                      batch_spec=BatchSpec(T=16, B=8), n_steps=2_048,
                      seed=2, log_interval_steps=512,
                      max_decorrelation_steps=0, **kw)


def test_async_matches_sync_math():
    """Pipelining changes scheduling, not semantics."""
    c1 = make(MinibatchRl).train()
    c2 = make(AsyncRl, pipeline_depth=2).train()
    for a, b in zip(jax.tree.leaves(c1.train_state.params),
                    jax.tree.leaves(c2.train_state.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_async_update_throttle():
    """updates_per_interval overrides the replay-ratio arithmetic."""
    runner = make(AsyncRl, updates_per_interval=64)
    carry = runner.train()
    # 64 updates/interval over 4 intervals, min_steps_learn gates the first
    # itrs; counter reflects the explicit throttle (64/itrs_per_interval
    # per itr, itrs with cum_steps >= min_steps_learn)
    assert runner.algo.updates_per_optimize == 64 // runner.itrs_per_interval
    assert int(carry.train_state.update_counter) > 0


def test_async_pipeline_dispatch_before_drain():
    """With pipeline_depth=2 the runner dispatches interval k+1 BEFORE
    reading interval k's diagnostics (the round-2 lazy-drain rewrite,
    runners/async_rl.py:train ~L90-114) — the host never blocks the
    device queue on logging."""
    runner = make(AsyncRl, pipeline_depth=2)
    events = []
    orig_startup = runner.startup

    def spying_startup():
        carry = orig_startup()
        orig_interval = runner._run_interval

        def spy_interval(c, _n=[0]):
            events.append(("dispatch", _n[0]))
            _n[0] += 1
            return orig_interval(c)

        runner._run_interval = spy_interval
        return carry

    runner.startup = spying_startup
    orig_log = runner._log_diagnostics

    def spy_log(itr, cum, infos, stats, dt, total):
        events.append(("log", itr // runner.itrs_per_interval - 1))
        return orig_log(itr, cum, infos, stats, dt, total)

    runner._log_diagnostics = spy_log
    runner.train()

    n = sum(1 for e in events if e[0] == "dispatch")
    assert n >= 4
    # every interval was eventually logged, in order
    logged = [k for (e, k) in events if e == "log"]
    assert logged == list(range(n))
    # pipeline property: dispatch of k+1 precedes log of k for all k
    for k in range(n - 1):
        assert (events.index(("dispatch", k + 1))
                < events.index(("log", k))), events


def test_async_eval_param_attribution():
    """Eval stats logged for interval k must come from interval k's own
    params (round-2 fix: eval dispatched at enqueue time against the
    interval's params; regression guard for VERDICT r1's stale-eval
    defect)."""
    from rlpyt_tpu.envs.classic import CartPole

    runner = make(AsyncRl, pipeline_depth=3, eval_env=CartPole(),
                  eval_n_envs=4, eval_max_steps=64,
                  eval_max_trajectories=4)
    interval_params = []
    eval_params = []
    orig_startup = runner.startup

    def probe(params):
        return np.asarray(jax.tree_util.tree_leaves(params)[0]).copy()

    def spying_startup():
        carry = orig_startup()
        orig_interval = runner._run_interval

        def spy_interval(c):
            out = orig_interval(c)
            interval_params.append(probe(out[0].train_state.params))
            return out

        runner._run_interval = spy_interval
        orig_eval = runner._run_eval

        def spy_eval(params, key):
            eval_params.append(probe(params))
            return orig_eval(params, key)

        runner._run_eval = spy_eval
        return carry

    runner.startup = spying_startup
    runner.train()

    assert len(eval_params) == len(interval_params) >= 4
    for k, (ip, ep) in enumerate(zip(interval_params, eval_params)):
        np.testing.assert_array_equal(
            ip, ep, err_msg=f"eval {k} used params from another interval")


def test_async_checkpoint_cadence(tmp_path, monkeypatch):
    """Checkpointing is amortized to every ``checkpoint_every``
    intervals plus once at the end (round-2 fix: no pipeline-draining
    block_until_ready per interval; runners/async_rl.py ~L115-129)."""
    import rlpyt_tpu.utils.checkpoint as ckpt_mod

    calls = []
    orig_save = ckpt_mod.save_checkpoint

    def spy_save(path, carry, meta):
        calls.append(dict(meta))
        return orig_save(path, carry, meta)

    monkeypatch.setattr(ckpt_mod, "save_checkpoint", spy_save)
    runner = make(AsyncRl, pipeline_depth=2, checkpoint_every=3,
                  checkpoint_dir=str(tmp_path))
    runner.train()

    n_intervals = 4  # n_steps=2048 / (16*8*4 per interval of 512)
    # cadence: interval 3 mid-run + the final one — NOT one per interval
    assert len(calls) == 2, calls
    assert calls[0]["interval"] == 3
    assert calls[-1]["interval"] == n_intervals
    import pickle
    with open(tmp_path / "checkpoint.pkl", "rb") as f:
        assert pickle.load(f) is not None
