"""Member-scaling probe: DEVICE-side aggregate throughput of the
vmapped sweep engine.

DESIGN.md §8 establishes the single-run step is conv-chain
latency-bound (fwd+bwd alone equals the full step), which raises an
obvious question: if the chain leaves the chip under-occupied, can M
independent trainings vmapped into one program (`run_batched_sweep`,
experiments/sweep.py) exceed the ~1,510 img/s single-run ceiling in
AGGREGATE?  DESIGN.md §7's flat batch-size scaling (bs 8→64 holds
~1,500 img/s aggregate) predicts NO — added concurrent work converts
the latency-bound chain into a bandwidth/FLOP-bound one at the same
throughput, and each vmapped member is strictly costlier than plain
batch growth (it adds its own weight-gradient + optimizer traffic).
This script measures it directly instead of leaving it an inference.

Method — differential, to cancel host overhead: every
`run_batched_sweep` call pays a per-call host cost (re-trace of the
whole-study program, compile-cache lookup, tunnel dispatch) that on
this 1-vCPU host is ~30 s — 30× the device time of the work itself, and
the reason BASELINE.md's serial sweep column reads ~52 img/s aggregate.
Timing one call therefore measures the host, not the chip.  Instead,
for each member count M the SAME program shape is run at two epoch
budgets E_LO and E_HI (scan over epochs: identical trace, identical
per-call overhead) and the device rate is taken from the difference:

    device img/s ≈ M * n_train * (E_HI - E_LO) / (wall_HI - wall_LO)

Each (M, E) cell is compiled/warmed once, then timed over the median of
3 calls.  Validation sweeps run every epoch in both budgets, so the
difference also nets out to whole training epochs + their validation —
like-for-like with bench.py's per-epoch accounting.

    python scripts/member_bench.py            # M in {1, 4, 16}
    python scripts/member_bench.py 1 8        # a subset
"""

from __future__ import annotations

import os
import statistics
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
if str(REPO) not in sys.path:
    sys.path.insert(0, str(REPO))

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_bench_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

BATCH_SIZE = 8
IMAGE_SIZE = 128
N_TRAIN = 200
N_VAL = 50
E_LO = 4
E_HI = 12
REPEATS = 3


def _setup():
    import jax
    import jax.numpy as jnp

    from physics_informed_image_segmentation_tpu.data import (
        DeviceDataset,
        make_blobs,
    )
    from physics_informed_image_segmentation_tpu.models import UNet

    tr = DeviceDataset.from_numpy(*make_blobs(N_TRAIN, IMAGE_SIZE, IMAGE_SIZE, seed=0))
    va = DeviceDataset.from_numpy(*make_blobs(N_VAL, IMAGE_SIZE, IMAGE_SIZE, seed=1))
    model = UNet(base_channels=64, dtype=jnp.bfloat16)
    params = model.init(jax.random.key(0), jnp.zeros((1, IMAGE_SIZE, IMAGE_SIZE, 1)))
    return model, params, tr, va


def _time_cell(model, params, tr, va, m: int, epochs: int) -> float:
    """Median wall seconds of a full M-member E-epoch sweep call."""
    import jax.numpy as jnp
    import numpy as np

    from physics_informed_image_segmentation_tpu.experiments.sweep import (
        run_batched_sweep,
    )

    # S2-shape scalars, identical across members: the probe measures the
    # engine's scaling, not member-to-member divergence.
    scalars = {
        "pde_weight": np.full(m, 1e-3),
        "phase_field_weight": np.zeros(m),
        "diffusion_coeff": np.full(m, 5.0),
        "reaction_threshold": np.full(m, 0.5),
        "epsilon": np.full(m, 0.05),
    }

    def once() -> None:
        out = run_batched_sweep(
            model, params, scalars, tr, va,
            num_epochs=epochs, batch_size=BATCH_SIZE, learning_rate=1e-4,
            early_stopping_patience=10_000,  # fixed budget: no member freezes
            seed=42, param_carry_dtype=jnp.bfloat16,
        )
        float(np.sum(out["best_val_dice"]))  # scalar fetch = real sync

    walls = []
    once()  # compile + warm
    for _ in range(REPEATS):
        t0 = time.perf_counter()
        once()
        walls.append(time.perf_counter() - t0)
    return statistics.median(walls)


def main() -> None:
    wanted = [int(a) for a in sys.argv[1:]] or [1, 4, 16]
    model, params, tr, va = _setup()
    print(
        f"workload: {N_TRAIN} train imgs, bs={BATCH_SIZE}, val sweep every "
        f"epoch; device rate from wall({E_HI}ep) - wall({E_LO}ep), "
        f"median of {REPEATS}",
        flush=True,
    )
    base_rate = None
    for m in wanted:
        lo = _time_cell(model, params, tr, va, m, E_LO)
        hi = _time_cell(model, params, tr, va, m, E_HI)
        d_imgs = m * N_TRAIN * (E_HI - E_LO)
        d_sec = hi - lo
        rate = d_imgs / d_sec if d_sec > 0 else float("nan")
        if base_rate is None:
            base_rate = rate / m
        print(
            f"members={m:2d}: wall {lo:6.2f}s@{E_LO}ep {hi:6.2f}s@{E_HI}ep"
            f"  -> device aggregate {rate:7.1f} img/s"
            f"  ({rate / base_rate:5.2f}x of single-member rate;"
            f" per-call host overhead ~{lo - d_sec / 2:4.1f}s)",
            flush=True,
        )


if __name__ == "__main__":
    main()
