"""MinAtar A2C/PPO train script (reference:
rlpyt/experiments/scripts/atari/pg/train/atari_ff_a2c.py)."""
from __future__ import annotations

import copy
import sys

from rlpyt_tpu.agents.pg import CategoricalPgAgent
from rlpyt_tpu.algos.pg import A2C, PPO
from rlpyt_tpu.envs.minatar import make_minatar
from rlpyt_tpu.experiments.configs.minatar_pg import configs
from rlpyt_tpu.models.pg import AtariFfModel
from rlpyt_tpu.runners.sync import SyncRl
from rlpyt_tpu.runners.train import MinibatchRl
from rlpyt_tpu.samplers.rollout import BatchSpec
from rlpyt_tpu.utils.logging import logger_context
from rlpyt_tpu.utils.variant import load_variant, update_config


def build_and_train(config_key: str = "ppo", log_dir=None, run_id: int = 0,
                    mesh=None, seed: int = 0, variant=None,
                    config_overrides=None):
    config = copy.deepcopy(configs[config_key])
    if variant is not None:
        config = update_config(config, variant)
    if config_overrides:
        config = update_config(config, config_overrides)

    game = config["env"].pop("game")
    env = make_minatar(game, **config["env"])
    agent = CategoricalPgAgent(ModelCls=AtariFfModel,
                               model_kwargs=config["model"],
                               **config["agent"])
    AlgoCls = PPO if config_key == "ppo" else A2C
    algo = AlgoCls(**config["algo"])

    sampler = config["sampler"]
    RunnerCls = MinibatchRl if mesh is None else SyncRl
    runner_kwargs = dict(
        algo=algo, agent=agent, env=env,
        batch_spec=BatchSpec(sampler["batch_T"], sampler["batch_B"]),
        max_decorrelation_steps=sampler.get("max_decorrelation_steps", 100),
        seed=seed, **config["runner"])
    if mesh is not None:
        runner_kwargs["mesh"] = mesh

    if log_dir is not None:
        with logger_context(log_dir, run_id, f"minatar_{game}_{config_key}",
                            config=config) as logger:
            runner = RunnerCls(logger=logger, **runner_kwargs)
            carry = runner.train()
    else:
        runner = RunnerCls(**runner_kwargs)
        carry = runner.train()
    return runner, carry


if __name__ == "__main__":
    args = sys.argv[1:]
    log_dir = args[0] if len(args) > 0 else None
    run_id = int(args[1]) if len(args) > 1 else 0
    config_key = args[2] if len(args) > 2 else "ppo"
    import os
    variant = (load_variant(log_dir)
               if log_dir and os.path.exists(
                   os.path.join(log_dir, "variant.json")) else None)
    build_and_train(config_key, log_dir, run_id, variant=variant)
