"""Experiment launcher: slot-queued subprocess runs."""
import json
import os
import textwrap

from rlpyt_tpu.utils.launching import run_experiments
from rlpyt_tpu.utils.variant import VariantLevel, make_variants


def test_run_experiments_slots(tmp_path):
    # stub "train script" obeying the launcher argv contract
    script = tmp_path / "train_stub.py"
    script.write_text(textwrap.dedent("""
        import json, os, sys
        log_dir, run_id = sys.argv[1], sys.argv[2]
        with open(os.path.join(log_dir, "variant.json")) as f:
            variant = json.load(f)
        with open(os.path.join(log_dir, f"done_{run_id}.json"), "w") as f:
            json.dump({"lr": variant["algo"]["lr"], "extra": sys.argv[3]}, f)
    """))
    level = VariantLevel(keys=[("algo", "lr")],
                         values=[[1e-3], [1e-4]],
                         dir_names=["lr3", "lr4"])
    variants, log_dirs = make_variants(level)
    results = run_experiments(
        script=str(script), experiment_title="stub",
        variants=variants, log_dirs=log_dirs, runs_per_setting=2,
        common_args=("argA",), n_slots=2,
        root_log_dir=str(tmp_path / "data"), poll_s=0.1)
    assert results == [0, 0, 0, 0]
    for vdir, lr in [("lr3", 1e-3), ("lr4", 1e-4)]:
        d = tmp_path / "data" / "stub" / vdir
        for run_id in (0, 1):
            out = json.loads((d / f"done_{run_id}.json").read_text())
            assert out == {"lr": lr, "extra": "argA"}
        assert (d / "variant.json").exists()
        assert (d / "stdout_0.log").exists()


def test_mujoco_script_importable():
    from rlpyt_tpu.experiments.configs.mujoco_qpg import configs
    assert set(configs) == {"sac", "td3", "ddpg"}
    from rlpyt_tpu.experiments.scripts.mujoco_qpg import build_and_train
    assert callable(build_and_train)
