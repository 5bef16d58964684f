"""Orbax checkpointing: params + optimizer state + step + data rng.

The reference only ever *saves* model weights (train.py:285-299,
train_only_inner_loop.py:370-385) — no optimizer/step/RNG state, so a crash
loses training progress. Here a checkpoint is the full TrainState plus the
host-side rng seed state, restorable into an exact resume.

Layout: <dir>/<step>/  (orbax PyTree checkpoint), plus <dir>/config.json.
"""

from __future__ import annotations

import json
import os
from typing import Any, Optional

import jax
import numpy as np


def _checkpointer():
    import orbax.checkpoint as ocp
    return ocp.PyTreeCheckpointer()


def save_checkpoint(ckpt_dir: str, state: Any, step: int, *,
                    config_json: Optional[str] = None,
                    extra: Optional[dict] = None) -> str:
    """Write a checkpoint at `ckpt_dir/step`. Returns the path."""
    ckpt_dir = os.path.abspath(ckpt_dir)
    os.makedirs(ckpt_dir, exist_ok=True)
    path = os.path.join(ckpt_dir, str(int(step)))
    payload = {"state": jax.device_get(state)}
    if extra:
        payload["extra"] = jax.device_get(extra)
    _checkpointer().save(path, payload, force=True)
    if config_json is not None:
        with open(os.path.join(ckpt_dir, "config.json"), "w") as f:
            f.write(config_json)
    return path


def latest_step(ckpt_dir: str) -> Optional[int]:
    if not os.path.isdir(ckpt_dir):
        return None
    steps = [int(d) for d in os.listdir(ckpt_dir) if d.isdigit()]
    return max(steps) if steps else None


def restore_checkpoint(ckpt_dir: str, target_state: Any, *,
                       step: Optional[int] = None,
                       with_extra: bool = False):
    """Restore into the structure of `target_state` (latest step if None)."""
    if step is None:
        step = latest_step(ckpt_dir)
        if step is None:
            raise FileNotFoundError(f"no checkpoints under {ckpt_dir}")
    path = os.path.join(os.path.abspath(ckpt_dir), str(int(step)))
    target = {"state": jax.device_get(target_state)}
    if with_extra:
        target["extra"] = None
    # Restore into the target structure so custom pytree nodes (flax structs,
    # optax states) keep their types and leaf order.
    restored = _checkpointer().restore(path, item=target)
    if with_extra:
        return restored["state"], restored.get("extra")
    return restored["state"]


def save_params_npz(path: str, params: Any) -> None:
    """Flat .npz export of a param pytree (portable, torch-free interchange)."""
    flat = {}

    def walk(prefix, tree):
        if isinstance(tree, dict):
            for k, v in tree.items():
                walk(f"{prefix}/{k}" if prefix else str(k), v)
        elif isinstance(tree, (list, tuple)):
            for i, v in enumerate(tree):
                walk(f"{prefix}/{i}", v)
        else:
            flat[prefix] = np.asarray(tree)

    walk("", jax.device_get(params))
    np.savez(path, **flat)


def load_params_npz(path: str, target: Any) -> Any:
    """Load a flat .npz export back into the structure of `target`."""
    data = np.load(path)

    def walk(prefix, tree):
        if isinstance(tree, dict):
            return {k: walk(f"{prefix}/{k}" if prefix else str(k), v)
                    for k, v in tree.items()}
        if isinstance(tree, (list, tuple)):
            vals = [walk(f"{prefix}/{i}", v) for i, v in enumerate(tree)]
            return type(tree)(vals)
        return data[prefix]

    return walk("", target)
