"""The examples are the user-facing API surface (reference:
rlpyt examples/example_1..9); importing each pins every symbol they
wire, and example_1 runs end to end at a tiny budget."""
import importlib
import os
import sys

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.parametrize("n", range(1, 10))
def test_example_imports(n):
    sys.path.insert(0, os.path.join(ROOT, "examples"))
    try:
        mod = importlib.import_module(f"example_{n}")
    finally:
        sys.path.pop(0)
    assert hasattr(mod, "build_and_train") or hasattr(mod, "main") or (
        # thin __main__ wrappers re-export the script entry point
        "build_and_train" in open(mod.__file__).read())


def test_example_1_trains(tmp_path):
    sys.path.insert(0, os.path.join(ROOT, "examples"))
    try:
        mod = importlib.import_module("example_1")
    finally:
        sys.path.pop(0)
    mod.build_and_train(n_steps=4_096, log_dir=str(tmp_path))
