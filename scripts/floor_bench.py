"""Component-ladder floor measurement on real TPU (VERDICT r2 item 1a).

DESIGN.md §8's roofline rests on an ANALYTIC "structural conv floor
≈2.4 ms" — this script measures it.  Five programs, each the bench
workload's shape (20.5M-param bf16 U-Net, bs=8, 128², dropout active)
with successive components added, each run as ONE lax.scan dispatch of
64 steps (so dispatch overhead is amortised exactly like bench.py's
multi-epoch program):

  fwd        forward pass only
  fwdbwd     + backward (grad of sum(pred) — conv fwd + input-grad +
             weight-grad, no loss math).  THE conv-floor number.
  loss       + full physics loss (Dice/BCE/RD/PF fused) fwd+bwd
  opt        + AdamW update (f32 master params, bf16 carry, like bench)
  full       + on-device Dice/IoU/Boundary-F1 metrics == bench program

Derived per-component costs (each line minus the previous) give the
measured attribution that replaces DESIGN.md §1's estimates.

    python scripts/floor_bench.py            # whole ladder
    python scripts/floor_bench.py fwdbwd     # one rung
"""

from __future__ import annotations

import os
import sys
import time
from functools import partial
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
if str(REPO) not in sys.path:
    sys.path.insert(0, str(REPO))

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_bench_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

BATCH = 8
SIZE = 128
STEPS = 64  # scan length per dispatch
WARMUP = 2
TIMED = 5


def _setup():
    import jax
    import jax.numpy as jnp

    from physics_informed_image_segmentation_tpu.data import make_blobs
    from physics_informed_image_segmentation_tpu.models import UNet
    from physics_informed_image_segmentation_tpu.train import (
        LossConfig,
        create_train_state,
    )
    from physics_informed_image_segmentation_tpu.train.engine import cast_float_tree
    from physics_informed_image_segmentation_tpu.train.objective import (
        make_loss_and_components,
    )

    images, masks = make_blobs(STEPS * BATCH, SIZE, SIZE, seed=0)
    x = jnp.asarray(images).reshape(STEPS, BATCH, SIZE, SIZE, 1)
    y = jnp.asarray(masks).reshape(STEPS, BATCH, SIZE, SIZE, 1)
    model = UNet(in_channels=1, out_channels=1, base_channels=64,
                 dtype=jnp.bfloat16)
    cfg = LossConfig(pde_weight=1e-4, phase_field_weight=1e-4,
                     diffusion_coeff=5.0, reaction_threshold=0.5, epsilon=0.05)
    state = create_train_state(model, jax.random.key(0), 1e-4,
                               input_shape=(1, SIZE, SIZE, 1))
    loss_fn = make_loss_and_components(cfg)
    return jax, jnp, model, cfg, state, loss_fn, cast_float_tree, x, y


def _time_one(jax, fn, *args) -> float:
    """Median-of-TIMED seconds per dispatch; scalar fetch is the sync."""
    for _ in range(WARMUP):
        out = fn(*args)
        _ = float(jax.tree_util.tree_leaves(out)[0].ravel()[0])
    times = []
    for _ in range(TIMED):
        t0 = time.perf_counter()
        out = fn(*args)
        _ = float(jax.tree_util.tree_leaves(out)[0].ravel()[0])
        times.append(time.perf_counter() - t0)
    times.sort()
    return times[len(times) // 2]


def run_rung(name: str) -> float:
    jax, jnp, model, cfg, state, loss_fn, cast_float_tree, x, y = _setup()

    params_bf16 = cast_float_tree(state.params, jnp.bfloat16)
    key0 = state.dropout_key

    def dropout_key(i):
        return jax.random.fold_in(key0, i)

    if name == "fwd":
        @jax.jit
        def prog(params, x):
            def body(acc, batch):
                i, xb = batch
                pred = model.apply(params, xb, deterministic=False,
                                   rngs={"dropout": dropout_key(i)})
                return acc + jnp.sum(pred), None

            acc, _ = jax.lax.scan(body, 0.0, (jnp.arange(STEPS), x))
            return acc

        sec = _time_one(jax, prog, params_bf16, x)

    elif name in ("fwdbwd", "fwdbwd_nodrop"):
        deterministic = name.endswith("nodrop")

        @jax.jit
        def prog(params, x):
            def body(acc, batch):
                i, xb = batch

                def f(p):
                    pred = model.apply(
                        p, xb, deterministic=deterministic,
                        rngs={} if deterministic else {"dropout": dropout_key(i)},
                    )
                    return jnp.sum(pred)

                val, grads = jax.value_and_grad(f)(params)
                gsum = sum(jnp.sum(g) for g in jax.tree_util.tree_leaves(grads))
                return acc + val + gsum.astype(jnp.float32), None

            acc, _ = jax.lax.scan(body, 0.0, (jnp.arange(STEPS), x))
            return acc

        sec = _time_one(jax, prog, params_bf16, x)

    elif name == "loss":
        @jax.jit
        def prog(params, x, y):
            def body(acc, batch):
                i, xb, yb = batch

                def f(p):
                    pred = model.apply(p, xb, deterministic=False,
                                       rngs={"dropout": dropout_key(i)})
                    total, _ = loss_fn(pred, yb, None)
                    return total

                val, grads = jax.value_and_grad(f)(params)
                gsum = sum(jnp.sum(g) for g in jax.tree_util.tree_leaves(grads))
                return acc + val + gsum.astype(jnp.float32), None

            acc, _ = jax.lax.scan(body, 0.0, (jnp.arange(STEPS), x, y))
            return acc

        sec = _time_one(jax, prog, params_bf16, x, y)

    elif name in ("opt", "full"):
        from physics_informed_image_segmentation_tpu.train import (
            make_train_epochs_fn,
        )
        from physics_informed_image_segmentation_tpu.data import (
            epoch_batch_indices,
        )

        compute_metrics = name == "full"
        fn = make_train_epochs_fn(model, cfg, compute_metrics=compute_metrics,
                                  param_carry_dtype=jnp.bfloat16)
        idx, valid = epoch_batch_indices(STEPS * BATCH, BATCH, shuffle=False)
        idx, valid = idx[None], valid[None]
        flat_x = x.reshape(STEPS * BATCH, SIZE, SIZE, 1)
        flat_y = y.reshape(STEPS * BATCH, SIZE, SIZE, 1)

        # the epoch program donates its state — thread it through the
        # timing loop (bench.py pattern) instead of using _time_one
        for _ in range(WARMUP):
            state, r = fn(state, flat_x, flat_y, idx, valid)
            _ = float(r["loss"][-1])
        times = []
        for _ in range(TIMED):
            t0 = time.perf_counter()
            state, r = fn(state, flat_x, flat_y, idx, valid)
            _ = float(r["loss"][-1])
            times.append(time.perf_counter() - t0)
        times.sort()
        sec = times[len(times) // 2]
    else:
        raise SystemExit(f"unknown rung {name}")

    ms = sec / STEPS * 1e3
    print(f"FLOOR {name:7s}: {ms:7.3f} ms/step  "
          f"({STEPS * BATCH / sec:7.1f} img/s)", flush=True)
    return ms


if __name__ == "__main__":
    rungs = sys.argv[1:] or ["fwd", "fwdbwd", "loss", "opt", "full"]
    results = {}
    for r in rungs:
        results[r] = run_rung(r)
    if len(results) > 1:
        prev = 0.0
        print("\ncomponent attribution (delta vs previous rung):")
        for r, ms in results.items():
            print(f"  {r:7s}: {ms:7.3f} ms/step  (+{ms - prev:6.3f} ms)")
            prev = ms
