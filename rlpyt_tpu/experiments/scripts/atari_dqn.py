"""ALE-Atari DQN-family train script over the host bridge (reference:
rlpyt/experiments/scripts/atari/dqn/train/atari_dqn.py:build_and_train).

``python -m rlpyt_tpu.experiments.scripts.atari_dqn [log_dir] [run_id]
[config_key]`` — config keys: dqn / ernbw / r2d1
(experiments/configs/atari_dqn.py).  The ale_py import is gated at env
construction; with ``env.fake=True`` the scripted FakeALE backend runs
the identical pipeline without ROMs (smoke/CI mode).
"""
from __future__ import annotations

import copy
import os
import sys

from rlpyt_tpu.agents.dqn import CatDqnAgent, DqnAgent, R2d1Agent
from rlpyt_tpu.algos.cat_dqn import CategoricalDQN
from rlpyt_tpu.algos.dqn import DQN
from rlpyt_tpu.algos.r2d1 import R2D1
from rlpyt_tpu.envs.atari import AtariEnv
from rlpyt_tpu.envs.host import SerialVecEnv, SharedMemVecEnv
from rlpyt_tpu.experiments.configs.atari_dqn import configs
from rlpyt_tpu.models.dqn import (
    AtariCatDqnModel,
    AtariDqnModel,
    AtariR2d1Model,
)
from rlpyt_tpu.runners.host import HostMinibatchRl
from rlpyt_tpu.utils.logging import logger_context
from rlpyt_tpu.utils.variant import load_variant, update_config


def make_env_fn(env_config: dict, seed: int = 0):
    """Build one AtariEnv factory; ``fake=True`` injects FakeALE."""
    kw = dict(env_config)
    fake = kw.pop("fake", False)
    if fake:
        from rlpyt_tpu.envs.fake_ale import FakeALE
        kw["ale_factory"] = FakeALE
    kw.setdefault("seed", seed)
    return lambda: AtariEnv(**kw)


def build_agent_algo(config_key: str, config: dict):
    if config_key == "r2d1":
        agent = R2d1Agent(ModelCls=AtariR2d1Model,
                          model_kwargs=config["model"], **config["agent"])
        algo = R2D1(**config["algo"])
    elif "n_atoms" in config.get("agent", {}):
        agent_kwargs = dict(config["agent"])
        model_kwargs = dict(config["model"])
        model_kwargs["n_atoms"] = agent_kwargs.get("n_atoms", 51)
        agent = CatDqnAgent(ModelCls=AtariCatDqnModel,
                            model_kwargs=model_kwargs, **agent_kwargs)
        algo = CategoricalDQN(**config["algo"])
    else:
        agent = DqnAgent(ModelCls=AtariDqnModel,
                         model_kwargs=config["model"], **config["agent"])
        algo = DQN(**config["algo"])
    return agent, algo


def build_and_train(config_key: str = "dqn", log_dir=None, run_id: int = 0,
                    seed: int = 0, variant=None, config_overrides=None,
                    serial: bool = False):
    config = copy.deepcopy(configs[config_key])
    if variant is not None:
        config = update_config(config, variant)
    if config_overrides:
        config = update_config(config, config_overrides)

    sampler = config["sampler"]
    VecCls = SerialVecEnv if serial else SharedMemVecEnv
    B = sampler["batch_B"]
    farm = VecCls([make_env_fn(config["env"], seed + b)
                   for b in range(B)],
                  n_workers=sampler.get("n_workers", 0), seed=seed)
    eval_farm = None
    if sampler.get("eval_n_envs", 0) > 0:
        eval_farm = VecCls(
            [make_env_fn(config["eval_env"], seed + 10_000 + b)
             for b in range(sampler["eval_n_envs"])],
            n_workers=sampler.get("n_workers", 0), seed=seed + 10_000)

    agent, algo = build_agent_algo(config_key, config)
    runner_kwargs = dict(algo=algo, agent=agent, vec_env=farm,
                         batch_T=sampler["batch_T"], seed=seed,
                         eval_vec_env=eval_farm,
                         eval_max_steps=sampler.get(
                             "eval_max_steps", 2_500),
                         eval_max_trajectories=sampler.get(
                             "eval_max_trajectories"),
                         **config["runner"])
    try:
        if log_dir is not None:
            name = f"atari_{config['env']['game']}_{config_key}"
            with logger_context(log_dir, run_id, name,
                                config=config) as logger:
                runner = HostMinibatchRl(logger=logger, **runner_kwargs)
                result = runner.train()
        else:
            runner = HostMinibatchRl(**runner_kwargs)
            result = runner.train()
    finally:
        farm.close()
        if eval_farm is not None:
            eval_farm.close()
    return runner, result


if __name__ == "__main__":
    args = sys.argv[1:]
    log_dir = args[0] if len(args) > 0 else None
    run_id = int(args[1]) if len(args) > 1 else 0
    config_key = args[2] if len(args) > 2 else "dqn"
    variant = (load_variant(log_dir)
               if log_dir and os.path.exists(
                   os.path.join(log_dir, "variant.json")) else None)
    build_and_train(config_key, log_dir, run_id, variant=variant)
