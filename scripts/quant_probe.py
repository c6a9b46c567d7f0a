"""Measured negative: int8 post-training-quantized serving, evaluated
and declined (docs/DESIGN.md §9).

TPU v5e advertises 2× int8 MXU throughput over bf16 (394 TOPS vs 197
TFLOP/s), so an int8 PTQ inference path (per-channel weight scales +
dynamic activation quantization) looked like a candidate 2× serving
win.  This probe gates it: s8×s8→s32 `lax.conv_general_dilated` at the
U-Net's four stage shapes (bs=128, NHWC) against the bf16 conv XLA
actually runs in `serve.py`.

Result on the real chip (2026-08-18, TPU v5 lite):

    int8 conv ok, max err vs f32: 0.0
    b128 128x128  64->64 : bf16 4.175 ms, int8 4.797 ms, 0.87x
    b128  64x64  128->128: bf16 2.655 ms, int8 2.700 ms, 0.98x
    b128  32x32  256->256: bf16 2.183 ms, int8 2.232 ms, 0.98x
    b128  16x16  512->512: bf16 2.220 ms, int8 2.034 ms, 1.09x

int8 convs lower correctly (bit-exact vs f32 at small integer values)
but XLA does not reach the int8 MXU rate for these conv shapes from
user space: 0.87–1.09× end-to-end, i.e. a whole-model quantized path
would be ~neutral at best while paying quantization error on a model
whose headline claim is numeric parity.  Declined; re-probe if XLA's
TPU backend gains int8 conv codegen or resolutions grow.
"""
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

dev = jax.devices()[0]
print("platform:", dev.platform, dev.device_kind)


def conv(x, k, out_dtype):
    return lax.conv_general_dilated(
        x, k, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=out_dtype,
    )


# 1. correctness: int8 x int8 -> int32 conv
rng = np.random.default_rng(0)
x8 = jnp.asarray(rng.integers(-4, 5, (2, 16, 16, 8), dtype=np.int8))
k8 = jnp.asarray(rng.integers(-4, 5, (3, 3, 8, 16), dtype=np.int8))
y = jax.jit(lambda a, b: conv(a, b, jnp.int32))(x8, k8)
ref = conv(x8.astype(jnp.float32), k8.astype(jnp.float32), jnp.float32)
err = float(jnp.abs(y.astype(jnp.float32) - ref).max())
print("int8 conv ok, max err vs f32:", err)

# 2. speed at the serving-heavy shapes (bs=128 equivalents per stage)
shapes = [
    (128, 128, 128, 64, 64),     # enc1 conv2 (lane-limited)
    (128, 64, 64, 128, 128),     # enc2
    (128, 32, 32, 256, 256),     # enc3
    (128, 16, 16, 512, 512),     # enc4/bottleneck
]


def bench(fn, *args, iters=20):
    r = fn(*args)
    jax.tree.map(lambda a: a.block_until_ready(), r)
    float(jnp.asarray(r).ravel()[0].astype(jnp.float32))  # tunnel sync
    t0 = time.perf_counter()
    for _ in range(iters):
        r = fn(*args)
    float(jnp.asarray(r).ravel()[0].astype(jnp.float32))
    return (time.perf_counter() - t0) / iters


for b, s, s2, cin, cout in shapes:
    xb = jnp.asarray(rng.standard_normal((b, s, s2, cin)), jnp.bfloat16)
    kb = jnp.asarray(rng.standard_normal((3, 3, cin, cout)), jnp.bfloat16)
    xq = jnp.asarray(rng.integers(-127, 128, (b, s, s2, cin), dtype=np.int8))
    kq = jnp.asarray(rng.integers(-127, 128, (3, 3, cin, cout), dtype=np.int8))
    f_bf = jax.jit(lambda a, k: conv(a, k, jnp.bfloat16))
    f_i8 = jax.jit(lambda a, k: conv(a, k, jnp.int32))
    t_bf = bench(f_bf, xb, kb)
    t_i8 = bench(f_i8, xq, kq)
    print(f"b{b} {s}x{s2} {cin}->{cout}: bf16 {t_bf*1e3:.3f} ms, "
          f"int8 {t_i8*1e3:.3f} ms, speedup {t_bf/t_i8:.2f}x")
