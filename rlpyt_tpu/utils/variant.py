"""Config-sweep system (reference: rlpyt/utils/launching/variant.py:
VariantLevel, make_variants, load_variant, save_variant, update_config
~L10-150).

Same semantics as the reference: nested plain-dict configs, deep-merged
with sweep variants; variants are cross-products of keyed value lists
with human-readable directory names.
"""
from __future__ import annotations

import json
import os
from typing import Any, Dict, List, NamedTuple, Sequence, Tuple


class VariantLevel(NamedTuple):
    """One sweep axis: ``keys`` are nested key-paths into the config dict,
    ``values`` the per-variant value tuples, ``dir_names`` the run-dir
    names (rlpyt/utils/launching/variant.py:VariantLevel)."""

    keys: Sequence[Tuple[str, ...]]
    values: Sequence[Sequence[Any]]
    dir_names: Sequence[str]


def make_variants(*levels: VariantLevel):
    """Cross-product of levels → (variants, log_dirs)
    (rlpyt variant.py:make_variants)."""
    variants: List[Dict] = [{}]
    log_dirs: List[str] = [""]
    for level in levels:
        assert len(level.values) == len(level.dir_names)
        new_variants, new_dirs = [], []
        for variant, log_dir in zip(variants, log_dirs):
            for vals, name in zip(level.values, level.dir_names):
                assert len(vals) == len(level.keys)
                v = json.loads(json.dumps(variant))  # deep copy
                for key_path, val in zip(level.keys, vals):
                    d = v
                    for k in key_path[:-1]:
                        d = d.setdefault(k, {})
                    d[key_path[-1]] = val
                new_variants.append(v)
                new_dirs.append(os.path.join(log_dir, name) if log_dir
                                else name)
        variants, log_dirs = new_variants, new_dirs
    return variants, log_dirs


def update_config(default: Dict, variant: Dict) -> Dict:
    """Deep-merge ``variant`` into a copy of ``default``
    (rlpyt variant.py:update_config).  Unknown keys are allowed (new keys
    may be introduced by variants), matching the reference."""
    out = dict(default)
    for k, v in variant.items():
        if isinstance(v, dict) and isinstance(out.get(k), dict):
            out[k] = update_config(out[k], v)
        else:
            out[k] = v
    return out


def save_variant(variant: Dict, log_dir: str):
    """(rlpyt variant.py:save_variant) → variant.json."""
    os.makedirs(log_dir, exist_ok=True)
    with open(os.path.join(log_dir, "variant.json"), "w") as f:
        json.dump(variant, f, indent=2, default=str)


def load_variant(log_dir: str) -> Dict:
    """(rlpyt variant.py:load_variant)."""
    with open(os.path.join(log_dir, "variant.json")) as f:
        return json.load(f)
