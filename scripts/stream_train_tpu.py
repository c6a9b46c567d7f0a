"""Streaming-fed training on the real chip (VERDICT r3 item 7).

Rounds 2–3 measured the host feed rate (8,554 img/s,
`scripts/data_bench.py`) and the device-resident training rate
(1,511 img/s, `bench.py`) separately.  This closes the loop: one real
training stage at the flagship workload (20.5M-param U-Net, bf16, full
PDE loss, on-device metrics, bs=8 @128²) fed FROM HOST RAM through
`data/streaming.py`, timed three ways on the real TPU:

  resident       make_train_epochs_fn — data in HBM, all timed epochs
                 one dispatch (the bench.py path; the ceiling)
  stream-step    batch_iterator -> prefetch_to_device(depth 4) ->
                 make_train_step_fn — one dispatch per optimizer step
                 (the canonical streaming path; on this tunnelled dev
                 TPU every dispatch pays ~200 ms RTT that a real
                 host-attached chip does not)
  stream-chunk   chunk_batches(K) -> make_train_chunk_fn — K steps per
                 dispatch, data still streamed from host RAM per chunk

    python scripts/stream_train_tpu.py            # all rows
    python scripts/stream_train_tpu.py resident   # one row

Appends results to artifacts/stream_train.json.
"""

from __future__ import annotations

import json
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

N_IMAGES, IMAGE_SIZE, BATCH = 512, 128, 8
CHUNK_K = 16


def main(only: str | None = None) -> None:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from physics_informed_image_segmentation_tpu.data import (
        DeviceDataset,
        epoch_batch_indices,
        make_blobs,
    )
    from physics_informed_image_segmentation_tpu.data.streaming import (
        HostDataset,
        batch_iterator,
        chunk_batches,
        prefetch_to_device,
    )
    from physics_informed_image_segmentation_tpu.models import UNet
    from physics_informed_image_segmentation_tpu.train import (
        LossConfig,
        create_train_state,
        make_train_chunk_fn,
        make_train_epochs_fn,
        make_train_step_fn,
    )

    print(f"backend: {jax.default_backend()}", flush=True)
    images, masks = make_blobs(N_IMAGES, IMAGE_SIZE, IMAGE_SIZE, seed=0)
    host = HostDataset(n=N_IMAGES, images=np.asarray(images),
                       masks=np.asarray(masks))
    steps_per_epoch = N_IMAGES // BATCH

    model = UNet(in_channels=1, out_channels=1, base_channels=64,
                 dtype=jnp.bfloat16)
    cfg = LossConfig(pde_weight=1e-4, phase_field_weight=1e-4,
                     diffusion_coeff=5.0, reaction_threshold=0.5,
                     epsilon=0.05)

    def fresh_state():
        return create_train_state(
            model, jax.random.key(0), 1e-4,
            input_shape=(1, IMAGE_SIZE, IMAGE_SIZE, 1))

    results = {}

    def record(name, n_img, dt, epochs):
        rate = n_img / dt
        results[name] = dict(img_per_s=round(rate, 1), epochs=epochs,
                             images=n_img, seconds=round(dt, 3))
        print(f"{name:14s} {rate:9.1f} img/s sustained "
              f"({epochs} epochs, {n_img} images, {dt:.2f}s)", flush=True)

    want = lambda n: only in (None, n)

    def counting(it, acc):
        """Accumulate the true valid-sample count host-side (ADVICE r4:
        padded batches/chunks must not inflate img/s) without touching
        device buffers inside the timed window."""
        for x, y, v in it:
            acc[0] += int(np.sum(v))
            yield x, y, v

    if want("resident"):
        data = DeviceDataset.from_numpy(images, masks)
        epochs_fn = make_train_epochs_fn(
            model, cfg, compute_metrics=True, param_carry_dtype=jnp.bfloat16)
        # Measurement rules learned the hard way (round 5):
        # 1. warmup MUST use the same epoch count — the stacked index
        #    plan's leading dim is a traced shape, so a different-shape
        #    warmup leaves the timed program uncompiled;
        # 2. the state must be created ONCE and threaded warmup->timed
        #    (as bench.py does): `create_train_state` executes eagerly,
        #    which on the axon tunnel costs ~13.6 s of per-op RTTs that
        #    async dispatch otherwise hides inside the timed window
        #    (measured: the 4-epoch program itself runs in ~1.7 s).
        state = fresh_state()
        for tag, n_ep in (("warmup", 4), ("timed", 4)):
            plans = [epoch_batch_indices(data.n, BATCH, shuffle=True,
                                         key=jax.random.key(e))
                     for e in range(n_ep)]
            idx = jnp.stack([p[0] for p in plans])
            valid = jnp.stack([p[1] for p in plans])
            t0 = time.perf_counter()
            state, metrics = epochs_fn(state, data.images, data.masks,
                                       idx, valid)
            _ = float(jax.tree_util.tree_leaves(metrics)[0].ravel()[0])
            dt = time.perf_counter() - t0
            if tag == "timed":
                record("resident", n_ep * steps_per_epoch * BATCH, dt, n_ep)

    if want("stream-step"):
        step = make_train_step_fn(model, cfg)
        state = fresh_state()
        for tag, n_ep in (("warmup", 1), ("timed", 2)):
            t0 = time.perf_counter()
            n_img = [0]
            for e in range(n_ep):
                it = prefetch_to_device(
                    counting(batch_iterator(host, BATCH, shuffle=True, seed=e),
                             n_img), size=4)
                for x, y, v in it:
                    state, out = step(state, x, y, v)
            _ = float(out["n"])  # sync (tunnel ignores block_until_ready)
            dt = time.perf_counter() - t0
            if tag == "timed":
                record("stream-step", n_img[0], dt, n_ep)

    if want("stream-chunk"):
        chunk_fn = make_train_chunk_fn(model, cfg)
        state = fresh_state()
        for tag, n_ep in (("warmup", 1), ("timed", 4)):
            t0 = time.perf_counter()
            n_img = [0]
            for e in range(n_ep):
                it = prefetch_to_device(
                    chunk_batches(
                        counting(batch_iterator(host, BATCH, shuffle=True,
                                                seed=e), n_img),
                        CHUNK_K),
                    size=2)
                for xs, ys, vs in it:
                    state, outs = chunk_fn(state, xs, ys, vs)
            _ = float(jax.tree_util.tree_leaves(outs)[0].ravel()[0])
            dt = time.perf_counter() - t0
            if tag == "timed":
                record(f"stream-chunk-{CHUNK_K}", n_img[0], dt, n_ep)

    out = REPO / "artifacts" / "stream_train.json"
    out.parent.mkdir(exist_ok=True)
    existing = json.loads(out.read_text()) if out.exists() else {}
    existing.update(results)
    out.write_text(json.dumps(existing, indent=1))
    print(f"-> {out}")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else None)
