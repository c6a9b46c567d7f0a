"""Custom-conv probe (VERDICT r3 item 2): put a number on the declined
"custom conv kernels" claim in DESIGN.md §8.

Times the worst lane-limited conv of the bench workload — 3×3, 64→64,
128², bs=8, bf16 storage / f32 accum — three ways on the real TPU:

  xla             lax.conv_general_dilated (what the U-Net runs today)
  pallas          ops/pallas_conv.py 9-tap kernel (K=64 contractions)
  pallas-paired   paired-tap kernel (K=128 full-MXU contractions)

Each timed program is ONE jitted lax.scan of STEPS conv fwd+bwd steps
(value_and_grad of sum(conv²) wrt x and w), so dispatch overhead is
amortised exactly like bench.py / floor_bench.py.  Forward-only rows
run the same scan without grad.

    python scripts/conv_probe.py            # all rows
    python scripts/conv_probe.py xla        # one impl
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

BATCH, SIZE, C = 8, 128, 64
# 512 scan steps ≈ 0.5–3 s of device work per timed call, so the axon
# tunnel's ~200 ms dispatch+fetch latency perturbs us/step by <5%.
STEPS = int(os.environ.get("CONV_PROBE_STEPS", "512"))
WARMUP, TIMED = 2, 5
# fwd conv FLOPs: 2 * B*H*W * 9*Cin * Cout; bwd adds dx (same) + dw (same)
FWD_FLOPS = 2 * BATCH * SIZE * SIZE * 9 * C * C


def _time(jax, fn, *args) -> float:
    for _ in range(WARMUP):
        out = fn(*args)
        _ = float(jax.tree_util.tree_leaves(out)[0].ravel()[0])
    ts = []
    for _ in range(TIMED):
        t0 = time.perf_counter()
        out = fn(*args)
        _ = float(jax.tree_util.tree_leaves(out)[0].ravel()[0])
        ts.append(time.perf_counter() - t0)
    ts.sort()
    return ts[len(ts) // 2]


def main(only: str | None = None) -> None:
    import jax
    import jax.numpy as jnp

    from physics_informed_image_segmentation_tpu.ops.pallas_conv import (
        conv3x3_same,
    )

    print(f"backend: {jax.default_backend()}", flush=True)
    k1, k2 = jax.random.split(jax.random.key(0))
    x = jax.random.normal(k1, (BATCH, SIZE, SIZE, C), jnp.bfloat16)
    w = (jax.random.normal(k2, (3, 3, C, C), jnp.float32) * 0.05).astype(
        jnp.bfloat16)

    def xla_conv(x, w):
        return jax.lax.conv_general_dilated(
            x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))

    impls = {
        "xla": xla_conv,
        "pallas": lambda x, w: conv3x3_same(x, w, False),
        "pallas-paired": lambda x, w: conv3x3_same(x, w, True),
    }
    if only:
        impls = {only: impls[only]}

    results = {}
    for name, conv in impls.items():
        @jax.jit
        def fwd_prog(x, w, conv=conv):
            def body(acc, i):
                xi = x + acc * 0  # keep the scan honest (no CSE across steps)
                return acc + jnp.sum(conv(xi, w).astype(jnp.float32)), None
            acc, _ = jax.lax.scan(body, 0.0, jnp.arange(STEPS))
            return acc

        @jax.jit
        def fwdbwd_prog(x, w, conv=conv):
            def loss(x, w):
                return jnp.sum(conv(x, w).astype(jnp.float32) ** 2)

            def body(acc, i):
                xi = x + acc * 0
                l, (dx, dw) = jax.value_and_grad(loss, argnums=(0, 1))(xi, w)
                acc = acc + l + jnp.sum(dx.astype(jnp.float32)) \
                    + jnp.sum(dw.astype(jnp.float32))
                return acc, None

            acc, _ = jax.lax.scan(body, 0.0, jnp.arange(STEPS))
            return acc

        row = {}
        for label, prog in (("fwd", fwd_prog), ("fwdbwd", fwdbwd_prog)):
            sec = _time(jax, prog, x, w)
            us = sec / STEPS * 1e6
            flops = FWD_FLOPS * (1 if label == "fwd" else 3)
            row[label] = dict(us_per_step=round(us, 2),
                              tflops=round(flops / (sec / STEPS) / 1e12, 1))
            print(f"{name:14s} {label:7s} {us:9.2f} us/step  "
                  f"{row[label]['tflops']:6.1f} TF/s", flush=True)
        results[name] = row

    if "xla" in results and len(results) > 1:
        for name in results:
            if name == "xla":
                continue
            for label in ("fwd", "fwdbwd"):
                r = results["xla"][label]["us_per_step"] / \
                    results[name][label]["us_per_step"]
                print(f"{name} vs xla ({label}): {r:.2f}x", flush=True)

    out = REPO / "artifacts" / "conv_probe.json"
    out.parent.mkdir(exist_ok=True)
    existing = json.loads(out.read_text()) if out.exists() else {}
    existing.update(results)
    out.write_text(json.dumps(existing, indent=1))
    print(f"-> {out}")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else None)
