"""Checkpoint/resume: bitwise-deterministic continuation."""
import jax
import numpy as np

from rlpyt_tpu.agents.dqn import DqnAgent
from rlpyt_tpu.algos.dqn import DQN
from rlpyt_tpu.envs.classic import CartPole
from rlpyt_tpu.models.dqn import DqnMlpModel
from rlpyt_tpu.runners.train import MinibatchRl
from rlpyt_tpu.samplers.rollout import BatchSpec
from rlpyt_tpu.utils.checkpoint import load_checkpoint, save_checkpoint


def make_runner(n_steps, checkpoint_dir=None):
    agent = DqnAgent(ModelCls=DqnMlpModel,
                     model_kwargs=dict(hidden_sizes=(32,)),
                     eps_steps=2_000)
    algo = DQN(batch_size=32, min_steps_learn=128, replay_size=4_096,
               replay_ratio=1.0, target_update_interval=50,
               learning_rate=1e-3)
    return MinibatchRl(algo=algo, agent=agent, env=CartPole(),
                       batch_spec=BatchSpec(T=16, B=8), n_steps=n_steps,
                       seed=9, log_interval_steps=512,
                       max_decorrelation_steps=0,
                       checkpoint_dir=checkpoint_dir)


def test_save_load_roundtrip(tmp_path):
    runner = make_runner(512)
    carry = runner.train()
    p = str(tmp_path / "ck.pkl")
    save_checkpoint(p, carry, {"interval": 1})
    restored, meta = load_checkpoint(p, like=carry)
    assert meta["interval"] == 1

    def as_np(x):
        if jax.dtypes.issubdtype(x.dtype, jax.dtypes.prng_key):
            return np.asarray(jax.random.key_data(x))
        return np.asarray(x)

    for a, b in zip(jax.tree.leaves(carry), jax.tree.leaves(restored)):
        np.testing.assert_array_equal(as_np(a), as_np(b))


def test_bitwise_deterministic_resume(tmp_path):
    # Uninterrupted run: 4 intervals (2048 steps at 512/interval).
    full = make_runner(2_048).train()

    # Interrupted: run 2 intervals with checkpointing, then resume.
    ck_dir = str(tmp_path / "ck")
    make_runner(1_024, checkpoint_dir=ck_dir).train()
    resumed_runner = make_runner(2_048)
    resumed = resumed_runner.train(resume_from=ck_dir + "/checkpoint.pkl")

    for a, b in zip(jax.tree.leaves(full.train_state.params),
                    jax.tree.leaves(resumed.train_state.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # env/rollout state equal too (exact trajectory continuation)
    np.testing.assert_array_equal(
        np.asarray(full.rollout_state.observation),
        np.asarray(resumed.rollout_state.observation))
