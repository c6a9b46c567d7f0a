"""Serving-path throughput on TPU: device-resident batched inference + TTA.

Measures `Predictor.predict_device` (serve.py) with the bf16 flagship
U-Net: images resident in HBM, ONE dispatch for the whole set, sync via
a scalar fetch.  This is the chip's inference rate; the host-facing
`predict()` adds transfer costs that on THIS dev setup are dominated by
the remote-execution tunnel (~2 MB/s — measured 8.4 s per 17 MB
round trip), which no host-attached deployment would see.

    python scripts/serve_bench.py            # both
    python scripts/serve_bench.py plain      # subset

Numbers land in BASELINE.md "Serving throughput".
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

N_IMAGES = 1024
BATCH = 128
REPEATS = 3


def main() -> None:
    which = set(sys.argv[1:]) or {"plain", "tta"}
    import jax
    import jax.numpy as jnp

    from physics_informed_image_segmentation_tpu.data import make_blobs
    from physics_informed_image_segmentation_tpu.models import UNet
    from physics_informed_image_segmentation_tpu.serve import Predictor
    from physics_informed_image_segmentation_tpu.train.checkpoint import save_params

    tmpdir = Path("/tmp/serve_bench")
    tmpdir.mkdir(exist_ok=True)
    model = UNet(in_channels=1, out_channels=1, base_channels=64, dtype=jnp.bfloat16)
    params = model.init(jax.random.key(0), jnp.zeros((1, 128, 128, 1), jnp.float32))
    ckpt = save_params(params, tmpdir / "serve_bench.msgpack")
    p = Predictor(ckpt, batch_size=BATCH, precision="bf16")

    images, _ = make_blobs(N_IMAGES, 128, 128, seed=0)  # (N, H, W, 1)
    x_dev = jnp.asarray(images)  # one upload, stays in HBM

    def timed(tta: bool, n: int) -> float:
        xs = x_dev[:n]
        for _ in range(2):  # compile + warm
            preds = p.predict_device(xs, tta=tta)
            _ = float(preds[0, 0, 0, 0])  # scalar fetch = the sync
        t0 = time.perf_counter()
        for _ in range(REPEATS):
            preds = p.predict_device(xs, tta=tta)
            _ = float(preds[0, 0, 0, 0])
        return (time.perf_counter() - t0) / REPEATS

    # two-size timing separates the per-image device rate from the fixed
    # dispatch+fetch overhead, which on this dev setup is ~1 s of
    # remote-execution tunnel round trips that a host-attached chip
    # would not pay.
    if "plain" in which:
        d_small, d_big = timed(False, BATCH), timed(False, N_IMAGES)
        per_img = (d_big - d_small) / (N_IMAGES - BATCH)
        fixed = d_small - BATCH * per_img
        print(f"SERVE device-resident bs={BATCH}: {1 / per_img:8.1f} img/s "
              f"device rate ({per_img * 1e6:.0f} us/img; fixed dispatch "
              f"overhead {fixed * 1e3:.0f} ms/call on the tunnel)", flush=True)

    if "tta" in which:
        n = N_IMAGES // 2
        d_small, d_big = timed(True, BATCH), timed(True, n)
        per_img = (d_big - d_small) / (n - BATCH)
        print(f"SERVE device-resident tta(x8) bs={BATCH}: "
              f"{1 / per_img:8.1f} img/s device rate", flush=True)


if __name__ == "__main__":
    main()
