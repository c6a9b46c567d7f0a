"""Checkpointing: Orbax full train-state + msgpack final artifacts.

The reference only ever does `torch.save(model.state_dict(), path)` at
stage ends — no optimizer state, no resume, best weights never captured
(/root/reference/src/train.py:688-691,762-765; SURVEY.md §5).  The TPU
build keeps those two named final artifacts for CLI parity
(``unet_baseline.msgpack`` / ``unet_pde_regularized.msgpack``) and adds
what the reference lacks: full train-state checkpoints
(params + optimizer + step + PRNG) via Orbax with mid-training resume.
"""

from __future__ import annotations

from pathlib import Path
from typing import Optional

import jax
import numpy as np
from flax import serialization

__all__ = [
    "save_params",
    "load_params",
    "save_train_state",
    "restore_train_state",
    "latest_checkpoint_step",
]


def save_params(params, path) -> Path:
    """Final-artifact save: params only, flax msgpack (the `.pth` analogue)."""
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    path.write_bytes(serialization.to_bytes(jax.device_get(params)))
    return path


def load_params(path, template=None):
    """Load a msgpack params artifact; validated against ``template`` if given."""
    data = Path(path).read_bytes()
    if template is not None:
        return serialization.from_bytes(template, data)
    return serialization.msgpack_restore(data)


def _state_pytree(state):
    return {
        "step": state.step,
        "params": state.params,
        "opt_state": state.opt_state,
        "dropout_key": jax.random.key_data(state.dropout_key),
    }


def save_train_state(
    state, ckpt_dir, step: Optional[int] = None, keep: Optional[int] = None
) -> Path:
    """Full-state checkpoint (resume-capable) under ``ckpt_dir/step_N``.

    ``keep``: retention — after saving, delete all but the newest
    ``keep`` ``step_*`` checkpoints in ``ckpt_dir`` (a full train state
    is ~3× params ≈ 250 MB at base_channels=64, so per-epoch
    checkpointing needs bounding).  ``None`` keeps everything.
    """
    import orbax.checkpoint as ocp

    ckpt_dir = Path(ckpt_dir).resolve()
    ckpt_dir.mkdir(parents=True, exist_ok=True)
    step = int(state.step) if step is None else step
    path = ckpt_dir / f"step_{step}"
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, jax.device_get(_state_pytree(state)), force=True)
    if keep is not None and keep > 0:
        import shutil

        for old in _checkpoint_steps(ckpt_dir)[:-keep]:
            shutil.rmtree(ckpt_dir / f"step_{old}", ignore_errors=True)
    return path


def _checkpoint_steps(ckpt_dir: Path) -> list[int]:
    """Sorted complete ``step_N`` checkpoints; ignores non-numeric
    suffixes such as Orbax's ``step_N.orbax-checkpoint-tmp-*`` left by
    an interrupted save."""
    return sorted(
        int(p.name[5:])
        for p in ckpt_dir.iterdir()
        if p.is_dir() and p.name.startswith("step_") and p.name[5:].isdigit()
    )


def latest_checkpoint_step(ckpt_dir) -> Optional[int]:
    ckpt_dir = Path(ckpt_dir)
    if not ckpt_dir.exists():
        return None
    steps = _checkpoint_steps(ckpt_dir)
    return steps[-1] if steps else None


def restore_train_state(state, ckpt_dir, step: Optional[int] = None):
    """Restore a full train state saved by :func:`save_train_state`.

    ``state`` provides the pytree structure (create a fresh one first).
    """
    import orbax.checkpoint as ocp

    ckpt_dir = Path(ckpt_dir).resolve()
    if step is None:
        step = latest_checkpoint_step(ckpt_dir)
        if step is None:
            raise FileNotFoundError(f"no checkpoints under {ckpt_dir}")
    target = jax.device_get(_state_pytree(state))
    with ocp.StandardCheckpointer() as ckptr:
        restored = ckptr.restore(ckpt_dir / f"step_{step}", target)
    return state.replace(
        step=restored["step"],
        params=restored["params"],
        opt_state=restored["opt_state"],
        dropout_key=jax.random.wrap_key_data(np.asarray(restored["dropout_key"])),
    )
