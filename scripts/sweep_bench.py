"""Batched-vs-serial sensitivity-sweep benchmark on TPU (full 16-member
S1+S2+S3 grid — VERDICT r1 item 5).

Serial = 16 sequential single-member Stage-II trainings (the
reference's run_ablation loop shape, /root/reference/run_ablation.py:120-224);
batched = ONE vmapped 16-member launch (`run_batched_sweep`).  Both use
identical data, epochs, early stopping and hyper-parameter grids (S1
a-sweep 5, S2 D-sweep 6, S3 eps-sweep 5).  Each mode is timed twice:
cold (includes trace+compile) and warm (persistent compile cache).
"""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
if str(REPO) not in sys.path:
    sys.path.insert(0, str(REPO))

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_bench_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

EPOCHS = 8
BATCH = 8


def main() -> None:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from physics_informed_image_segmentation_tpu.data import DeviceDataset, make_blobs
    from physics_informed_image_segmentation_tpu.experiments.studies import ALL_STUDIES as STUDIES
    from physics_informed_image_segmentation_tpu.experiments.sweep import (
        run_batched_sweep,
        sweep_scalars_from_variants,
    )
    from physics_informed_image_segmentation_tpu.models import UNet

    variants = (
        STUDIES["S1"]() + STUDIES["S2"]() + STUDIES["S3"]()
    )
    print(f"{len(variants)} members", flush=True)
    scalars = sweep_scalars_from_variants(variants)

    tr = DeviceDataset.from_numpy(*make_blobs(200, 128, 128, seed=0))
    va = DeviceDataset.from_numpy(*make_blobs(50, 128, 128, seed=1))
    model = UNet(base_channels=64, dtype=jnp.bfloat16)
    params = model.init(jax.random.key(0), jnp.zeros((1, 128, 128, 1)))

    def batched():
        out = run_batched_sweep(
            model, params, scalars, tr, va,
            num_epochs=EPOCHS, batch_size=BATCH, learning_rate=1e-4,
            early_stopping_patience=10, seed=42,
        )
        return float(np.sum(out["best_val_dice"]))  # forces full sync

    def serial():
        acc = 0.0
        for m in range(len(variants)):
            sc = {k: v[m : m + 1] for k, v in scalars.items()}
            out = run_batched_sweep(
                model, params, sc, tr, va,
                num_epochs=EPOCHS, batch_size=BATCH, learning_rate=1e-4,
                early_stopping_patience=10, seed=42,
            )
            acc += float(out["best_val_dice"][0])
        return acc

    for name, fn in (("batched", batched), ("serial", serial)):
        t0 = time.perf_counter()
        v1 = fn()
        cold = time.perf_counter() - t0
        t0 = time.perf_counter()
        v2 = fn()
        warm = time.perf_counter() - t0
        print(
            f"{name}: cold={cold:.1f}s warm={warm:.1f}s (sum dice {v1:.3f}/{v2:.3f})",
            flush=True,
        )


if __name__ == "__main__":
    main()
