"""MuJoCo SAC/TD3/DDPG train script over the host bridge (reference:
rlpyt/experiments/scripts/mujoco/qpg/train/mujoco_sac.py)."""
from __future__ import annotations

import copy
import os
import sys

from rlpyt_tpu.agents.qpg import DdpgAgent, SacAgent, Td3Agent
from rlpyt_tpu.algos.qpg import DDPG, SAC, TD3
from rlpyt_tpu.envs.host import (PairedVecEnv, SerialVecEnv,
                                 SharedMemVecEnv)
from rlpyt_tpu.experiments.configs.mujoco_qpg import configs
from rlpyt_tpu.runners.host import AsyncHostRl, HostMinibatchRl
from rlpyt_tpu.utils.logging import logger_context
from rlpyt_tpu.utils.variant import load_variant, update_config

AGENTS = {"sac": SacAgent, "td3": Td3Agent, "ddpg": DdpgAgent}
ALGOS = {"sac": SAC, "td3": TD3, "ddpg": DDPG}


def build_and_train(config_key: str = "sac", log_dir=None, run_id: int = 0,
                    seed: int = 0, variant=None, config_overrides=None,
                    serial: bool = False, runner: str = "sync",
                    alternating: bool = False):
    """``runner``: "sync" (HostMinibatchRl) or "async" (AsyncHostRl —
    learner thread overlaps env stepping, the reference AsyncRl
    topology, rlpyt/runners/async_rl.py ~L20-400).  ``alternating``:
    paired farm halves stepped out of phase so each half's env
    simulation overlaps the other half's batched device inference
    (rlpyt AlternatingSampler)."""
    config = copy.deepcopy(configs[config_key])
    if variant is not None:
        config = update_config(config, variant)
    if config_overrides:
        config = update_config(config, config_overrides)

    sampler = config["sampler"]
    VecCls = SerialVecEnv if serial else SharedMemVecEnv
    if alternating:
        half = sampler["batch_B"] // 2
        n_w = max(1, sampler.get("n_workers", 0) // 2)
        farm = PairedVecEnv(
            VecCls([config["env"]["id"]] * half, n_workers=n_w,
                   seed=seed),
            VecCls([config["env"]["id"]] * (sampler["batch_B"] - half),
                   n_workers=n_w, seed=seed + 5_000))
    else:
        farm = VecCls([config["env"]["id"]] * sampler["batch_B"],
                      n_workers=sampler.get("n_workers", 0), seed=seed)
    eval_farm = None
    if sampler.get("eval_n_envs", 0) > 0:
        eval_farm = VecCls(
            [config["eval_env"]["id"]] * sampler["eval_n_envs"],
            n_workers=sampler.get("n_workers", 0), seed=seed + 10_000)
    agent = AGENTS[config_key](model_kwargs=config["model"],
                               **config["agent"])
    algo = ALGOS[config_key](**config["algo"])
    runner_kwargs = dict(algo=algo, agent=agent, vec_env=farm,
                         batch_T=sampler["batch_T"], seed=seed,
                         eval_vec_env=eval_farm,
                         eval_max_steps=sampler.get("eval_max_steps", 2_500),
                         eval_max_trajectories=sampler.get(
                             "eval_max_trajectories"),
                         **config["runner"])
    RunnerCls = AsyncHostRl if runner == "async" else HostMinibatchRl
    try:
        if log_dir is not None:
            name = f"mujoco_{config['env']['id']}_{config_key}"
            with logger_context(log_dir, run_id, name,
                                config=config) as logger:
                runner = RunnerCls(logger=logger, **runner_kwargs)
                result = runner.train()
        else:
            runner = RunnerCls(**runner_kwargs)
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
    config_key = args[2] if len(args) > 2 else "sac"
    variant = (load_variant(log_dir)
               if log_dir and os.path.exists(
                   os.path.join(log_dir, "variant.json")) else None)
    build_and_train(config_key, log_dir, run_id, variant=variant)
