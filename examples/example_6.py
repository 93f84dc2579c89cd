"""Example 6: variant sweeps with the local launcher (reference: rlpyt
examples/example_6*.py — launch/variant workflow via run_experiments)."""
import os

from rlpyt_tpu.utils.launching import run_experiments
from rlpyt_tpu.utils.variant import VariantLevel, make_variants


def main():
    lr_level = VariantLevel(
        keys=[("algo", "learning_rate")],
        values=[[1e-4], [3e-4], [1e-3]],
        dir_names=["lr1e-4", "lr3e-4", "lr1e-3"])
    game_level = VariantLevel(
        keys=[("env", "game"), ("eval_env", "game")],
        values=[["breakout"] * 2, ["space_invaders"] * 2],
        dir_names=["breakout", "space_invaders"])
    variants, log_dirs = make_variants(lr_level, game_level)

    script = os.path.join(os.path.dirname(__file__), os.pardir,
                          "rlpyt_tpu", "experiments", "scripts",
                          "minatar_dqn.py")
    run_experiments(
        script=os.path.abspath(script),
        experiment_title="minatar_dqn_lr_sweep",
        variants=variants,
        log_dirs=log_dirs,
        runs_per_setting=1,
        common_args=("dqn",),
        n_slots=1,
    )


if __name__ == "__main__":
    main()
