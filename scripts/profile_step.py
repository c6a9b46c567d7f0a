"""Profile the benchmark train-epoch program on TPU.

Modes:
    python scripts/profile_step.py trace   # xplane trace -> per-op table
    python scripts/profile_step.py hlo     # compiled HLO -> multiply/copy census

Used to chase the ~1.9 ms/step non-conv tail (VERDICT round 1): the
trace mode attributes device time per op name; the hlo mode lists every
standalone (non-fused) elementwise op with its shape so the tail can be
matched to source operations.

Run with a timeout — the axon tunnel hangs intermittently.
"""

from __future__ import annotations

import os
import sys
from collections import defaultdict
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
if str(REPO) not in sys.path:
    sys.path.insert(0, str(REPO))

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_bench_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")

BATCH_SIZE = 8
IMAGE_SIZE = 128
N_IMAGES = 512  # matches bench.py so the persistent compile cache hits


def _build():
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
    model = UNet(in_channels=1, out_channels=1, base_channels=64, dtype=jnp.bfloat16)
    cfg = LossConfig(
        pde_weight=1e-4,
        phase_field_weight=1e-4,
        diffusion_coeff=5.0,
        reaction_threshold=0.5,
        epsilon=0.05,
    )
    epoch_fn = make_train_epoch_fn(model, cfg, compute_metrics=True)
    state = create_train_state(
        model, jax.random.key(0), 1e-4, input_shape=(1, IMAGE_SIZE, IMAGE_SIZE, 1)
    )
    idx, valid = epoch_batch_indices(
        data.n, BATCH_SIZE, shuffle=True, key=jax.random.key(1)
    )
    return epoch_fn, state, data, idx, valid


def run_trace() -> None:
    import glob

    import jax

    epoch_fn, state, data, idx, valid = _build()
    # compile + warm
    state, r = epoch_fn(state, data.images, data.masks, idx, valid)
    print("warm loss", float(r["loss"]), flush=True)

    logdir = "/tmp/profile_step"
    os.system(f"rm -rf {logdir}")
    jax.profiler.start_trace(logdir)
    for _ in range(3):
        state, r = epoch_fn(state, data.images, data.masks, idx, valid)
        _ = float(r["loss"])  # scalar fetch = real sync on the tunnel
    jax.profiler.stop_trace()

    pbs = glob.glob(f"{logdir}/**/*.xplane.pb", recursive=True)
    print("xplane files:", pbs, flush=True)
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    for pb in pbs:
        xs = xplane_pb2.XSpace()
        xs.ParseFromString(open(pb, "rb").read())
        for plane in xs.planes:
            if "TPU" not in plane.name and "tpu" not in plane.name:
                continue
            # resolve metadata
            ev_name = {m.id: m.name for m in plane.event_metadata.values()}
            print(f"\n==== plane {plane.name} ====")
            for line in plane.lines:
                total = sum(ev.duration_ps for ev in line.events)
                print(
                    f"\n-- line {line.id} {line.name!r}: {len(line.events)} events,"
                    f" {total/1e9:.3f} ms summed --"
                )
                agg = defaultdict(lambda: [0, 0.0])  # name -> [count, total_ps]
                for ev in line.events:
                    n = ev_name.get(ev.metadata_id, str(ev.metadata_id))
                    agg[n][0] += 1
                    agg[n][1] += ev.duration_ps
                rows = sorted(agg.items(), key=lambda kv: -kv[1][1])
                for name, (cnt, ps) in rows[:45]:
                    print(f"{ps/1e9:9.4f} ms  x{cnt:4d}  {name[:120]}")


def run_hlo() -> None:
    import re

    epoch_fn, state, data, idx, valid = _build()
    compiled = epoch_fn.lower(state, data.images, data.masks, idx, valid).compile()
    txt = compiled.as_text()
    Path("/tmp/epoch_hlo.txt").write_text(txt)
    print(f"HLO dumped to /tmp/epoch_hlo.txt ({len(txt)} bytes)")

    # census of top-level (non-fused) ops in the entry/while-body region
    op_re = re.compile(r"^\s*(?:ROOT )?%?[\w.-]+ = ([a-z0-9\[\],{}() ]+?) ([a-z-]+)\(")
    counts = defaultdict(int)
    for line in txt.splitlines():
        m = op_re.match(line)
        if m:
            counts[m.group(2)] += 1
    for op, c in sorted(counts.items(), key=lambda kv: -kv[1])[:40]:
        print(f"{c:5d}  {op}")

    # standalone multiplies with shapes
    print("\n-- standalone multiply/convert/copy lines (first 120) --")
    n = 0
    for line in txt.splitlines():
        s = line.strip()
        if re.match(r"^(ROOT )?%?[\w.-]+ = [^=]*\b(multiply|copy|convert)\(", s):
            print(s[:160])
            n += 1
            if n >= 120:
                break


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "trace"
    {"trace": run_trace, "hlo": run_hlo}[mode]()
