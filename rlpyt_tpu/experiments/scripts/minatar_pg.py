"""MinAtar A2C/PPO train script (reference:
rlpyt/experiments/scripts/atari/pg/train/atari_ff_a2c.py)."""
from __future__ import annotations

import copy
import sys

from rlpyt_tpu.agents.pg import (
    CategoricalPgAgent,
    RecurrentCategoricalPgAgent,
)
from rlpyt_tpu.algos.pg import A2C, PPO
from rlpyt_tpu.envs.minatar import make_minatar
from rlpyt_tpu.experiments.configs.minatar_pg import configs
from rlpyt_tpu.models.pg import AtariFfModel, AtariLstmModel
from rlpyt_tpu.runners.sync import SyncRl
from rlpyt_tpu.runners.train import MinibatchRl
from rlpyt_tpu.samplers.rollout import BatchSpec
from rlpyt_tpu.utils.logging import logger_context
from rlpyt_tpu.utils.variant import load_variant, update_config


def _eval_kwargs(config):
    """Offline-eval wiring (reference: rlpyt/runners/minibatch_rl.py
    MinibatchRlEval ~L300; eval caps from
    rlpyt/samplers/base.py:BaseSampler.__init__)."""
    sampler = config.get("sampler", {})
    if sampler.get("eval_n_envs", 0) <= 0 or "eval_env" not in config:
        return {}
    eval_cfg = dict(config["eval_env"])
    game = eval_cfg.pop("game")
    return dict(
        eval_env=make_minatar(game, **eval_cfg),
        eval_n_envs=sampler["eval_n_envs"],
        eval_max_steps=sampler.get("eval_max_steps", 2_500),
        eval_max_trajectories=sampler.get("eval_max_trajectories"),
    )


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
    recurrent = config_key.startswith("lstm")
    if recurrent:
        agent = RecurrentCategoricalPgAgent(
            ModelCls=AtariLstmModel, model_kwargs=config["model"],
            **config["agent"])
    else:
        agent = CategoricalPgAgent(ModelCls=AtariFfModel,
                                   model_kwargs=config["model"],
                                   **config["agent"])
    AlgoCls = PPO if config_key.endswith("ppo") else A2C
    algo = AlgoCls(**config["algo"])

    sampler = config["sampler"]
    RunnerCls = MinibatchRl if mesh is None else SyncRl
    runner_kwargs = dict(
        algo=algo, agent=agent, env=env,
        batch_spec=BatchSpec(sampler["batch_T"], sampler["batch_B"]),
        max_decorrelation_steps=sampler.get("max_decorrelation_steps", 100),
        seed=seed, **_eval_kwargs(config), **config["runner"])
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
