"""A/B throughput measurement of the round-2 perf variants on TPU.

Times the real bench epoch program (bench.py workload: 20.5M U-Net,
bs=8, 128x128, full PDE loss, on-device metrics) for each combination
of {pool: fused|xla} x {flat params: on|off}.

    python scripts/ab_bench.py            # all 4 variants
    python scripts/ab_bench.py fused 1    # one variant
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

BATCH_SIZE = 8
IMAGE_SIZE = 128
N_IMAGES = 512
WARMUP = 2
TIMED = 5


def run_variant(
    pool: str,
    flat: bool,
    opt: str = "adamw",
    upsample: str = "einsum6",
    carry: bool = False,
) -> float:
    import jax
    import jax.numpy as jnp

    from physics_informed_image_segmentation_tpu.data import (
        DeviceDataset,
        epoch_batch_indices,
        make_blobs,
    )
    from physics_informed_image_segmentation_tpu.models import UNet
    from physics_informed_image_segmentation_tpu.train import (
        LossConfig,
        create_train_state,
        make_train_epoch_fn,
    )

    images, masks = make_blobs(N_IMAGES, IMAGE_SIZE, IMAGE_SIZE, seed=0)
    data = DeviceDataset.from_numpy(images, masks)
    model = UNet(
        in_channels=1, out_channels=1, base_channels=64, dtype=jnp.bfloat16,
        pool=pool, upsample_variant=upsample,
    )
    cfg = LossConfig(
        pde_weight=1e-4, phase_field_weight=1e-4, diffusion_coeff=5.0,
        reaction_threshold=0.5, epsilon=0.05,
    )
    import json as _json

    copts = os.environ.get("AB_COMPILER_OPTIONS")
    copts = _json.loads(copts) if copts else None
    epoch_fn = make_train_epoch_fn(
        model, cfg, compute_metrics=True, compiler_options=copts,
        param_carry_dtype=jnp.bfloat16 if carry else None,
    )
    state = create_train_state(
        model, jax.random.key(0), 1e-4,
        input_shape=(1, IMAGE_SIZE, IMAGE_SIZE, 1), flat=flat, optimizer=opt,
    )
    idx, valid = epoch_batch_indices(
        data.n, BATCH_SIZE, shuffle=True, key=jax.random.key(1)
    )

    for _ in range(WARMUP):
        state, r = epoch_fn(state, data.images, data.masks, idx, valid)
        _ = float(r["loss"])  # scalar fetch = the only real sync on axon
    t0 = time.perf_counter()
    for _ in range(TIMED):
        state, r = epoch_fn(state, data.images, data.masks, idx, valid)
        _ = float(r["loss"])
    dt = (time.perf_counter() - t0) / TIMED
    ips = data.n / dt
    print(
        f"VARIANT pool={pool} flat={int(flat)} opt={opt} up={upsample} carry={int(carry)}: "
        f"{ips:8.1f} img/s "
        f"({dt / (N_IMAGES // BATCH_SIZE) * 1e3:.3f} ms/step), loss={float(r['loss']):.4f}",
        flush=True,
    )
    return ips



def run_multi_epoch(
    pool: str = "fused", opt: str = "adamw", carry: bool = False,
    batch_size: int = BATCH_SIZE, decoder: str = "concat",
) -> float:
    """Same workload, E epochs per dispatch (make_train_epochs_fn)."""
    import jax
    import jax.numpy as jnp

    from physics_informed_image_segmentation_tpu.data import (
        DeviceDataset, epoch_batch_indices, make_blobs)
    from physics_informed_image_segmentation_tpu.models import UNet
    from physics_informed_image_segmentation_tpu.train import (
        LossConfig, create_train_state, make_train_epochs_fn)

    images, masks = make_blobs(N_IMAGES, IMAGE_SIZE, IMAGE_SIZE, seed=0)
    data = DeviceDataset.from_numpy(images, masks)
    model = UNet(in_channels=1, out_channels=1, base_channels=64,
                 dtype=jnp.bfloat16, pool=pool, decoder=decoder)
    cfg = LossConfig(pde_weight=1e-4, phase_field_weight=1e-4,
                     diffusion_coeff=5.0, reaction_threshold=0.5, epsilon=0.05)
    import jax.numpy as _jnp

    fn = make_train_epochs_fn(
        model, cfg, compute_metrics=True,
        param_carry_dtype=_jnp.bfloat16 if carry else None,
    )
    state = create_train_state(model, jax.random.key(0), 1e-4,
                               input_shape=(1, IMAGE_SIZE, IMAGE_SIZE, 1),
                               optimizer=opt)
    plans = [epoch_batch_indices(data.n, batch_size, shuffle=True,
                                 key=jax.random.key(e)) for e in range(TIMED)]
    idx = jnp.stack([p[0] for p in plans])
    valid = jnp.stack([p[1] for p in plans])

    state, r = fn(state, data.images, data.masks, idx, valid)  # compile+warm
    _ = float(r["loss"][-1])
    t0 = time.perf_counter()
    state, r = fn(state, data.images, data.masks, idx, valid)
    _ = float(r["loss"][-1])
    dt = (time.perf_counter() - t0) / TIMED
    ips = N_IMAGES / dt
    print(f"VARIANT multi-epoch pool={pool} opt={opt} carry={int(carry)} "
          f"decoder={decoder} bs={batch_size}: {ips:8.1f} img/s "
          f"({dt / (N_IMAGES // batch_size) * 1e3:.3f} ms/step)", flush=True)
    return ips


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "multi":
        bs = [int(a[3:]) for a in sys.argv[2:] if a.startswith("bs=")]
        opt = [a[4:] for a in sys.argv[2:] if a.startswith("opt=")]
        run_multi_epoch(carry="carry" in sys.argv[2:],
                        batch_size=bs[0] if bs else BATCH_SIZE,
                        opt=opt[0] if opt else "adamw",
                        decoder="split" if "split" in sys.argv[2:] else "concat")
    elif len(sys.argv) > 2:
        run_variant(sys.argv[1], bool(int(sys.argv[2])),
                    sys.argv[3] if len(sys.argv) > 3 else "adamw",
                    sys.argv[4] if len(sys.argv) > 4 else "einsum6",
                    len(sys.argv) > 5 and sys.argv[5] == "carry")
    else:
        run_variant("fused", False, "flat_adamw")
        run_variant("fused", False, "adamw")
