"""Megapixel training step on REAL TPU hardware (single chip).

Companion to megapixel_demo.py (which proves the space-sharded memory
story on the virtual CPU mesh): this compiles the FULL flagship train
step — 20.5M-param bf16 U-Net + fused physics loss + AdamW — at
1024x1024 on one chip with rematerialisation and runs it, reporting
XLA's exact memory accounting and the measured step time.

    python scripts/megapixel_tpu.py [H] [steps]

Numbers land in BASELINE.md / DESIGN.md §4.
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


def gib(n) -> str:
    return f"{n / 2**30:.2f} GiB"


def main() -> None:
    h = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    steps = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    backend = sys.argv[3] if len(sys.argv) > 3 else "auto"

    import jax
    import jax.numpy as jnp

    from physics_informed_image_segmentation_tpu.models import UNet
    from physics_informed_image_segmentation_tpu.train import (
        LossConfig,
        create_train_state,
        make_train_step_fn,
    )

    for remat in (True, False):
        model = UNet(
            in_channels=1, out_channels=1, base_channels=64,
            remat=remat, dtype=jnp.bfloat16,
        )
        cfg = LossConfig(
            pde_weight=1e-4, phase_field_weight=1e-4, diffusion_coeff=5.0,
            backend=backend,
        )
        step = make_train_step_fn(model, cfg, compute_metrics=False)
        state = create_train_state(
            model, jax.random.key(0), 1e-4, input_shape=(1, 64, 64, 1)
        )
        x = jnp.zeros((1, h, h, 1), jnp.float32)
        y = jnp.zeros((1, h, h, 1), jnp.float32)
        v = jnp.ones((1,), jnp.float32)

        label = f"H={h} bc=64 bf16 remat={int(remat)} physics={backend}"
        try:
            compiled = step.lower(state, x, y, v).compile()
        except Exception as e:  # noqa: BLE001 — OOM at compile is a result
            print(f"MEGAPIXEL-TPU {label}: compile failed: {str(e)[:200]}",
                  flush=True)
            continue
        m = compiled.memory_analysis()
        if m is not None:
            print(
                f"MEGAPIXEL-TPU {label}: temp={gib(m.temp_size_in_bytes)} "
                f"args={gib(m.argument_size_in_bytes)} "
                f"peak(temp+args)="
                f"{gib(m.temp_size_in_bytes + m.argument_size_in_bytes)}",
                flush=True,
            )
        state, r = compiled(state, x, y, v)
        _ = float(r["loss"])  # sync (axon: block_until_ready lies)
        t0 = time.perf_counter()
        for _ in range(steps):
            state, r = compiled(state, x, y, v)
        _ = float(r["loss"])
        dt = (time.perf_counter() - t0) / steps
        mpix = h * h / 1e6
        print(
            f"MEGAPIXEL-TPU {label}: {dt * 1e3:8.1f} ms/step "
            f"({mpix / dt:.1f} Mpix/s trained), loss={float(r['loss']):.4f}",
            flush=True,
        )


if __name__ == "__main__":
    main()
