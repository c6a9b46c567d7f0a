"""Flax U-Net for PDE-constrained cell segmentation (TPU-native, NHWC).

Same topology / channel plan / dropout schedule / activation zoo as the
reference PyTorch model (/root/reference/src/unet.py:19-216):

* 4-level encoder 64→128→256→512 with 2×2 max-pool downsampling,
* 512-channel bottleneck (NOT 1024 — quirk of the reference,
  /root/reference/src/unet.py:129),
* ConvTranspose(k=2, s=2) upsampling + channel-concat skip connections,
* DoubleConv = Conv3×3 → act → (spatial Dropout) → Conv3×3 → act, with
  **no normalisation layers**,
* graded dropout 0 / 0.5·d / d by depth,
* 1×1 output conv + sigmoid (or tanh rescaled to (0,1)),
* 7 selectable intermediate activations incl. Mish and PReLU.  As in the
  reference, a single PReLU weight is shared by both convs of a block
  (/root/reference/src/unet.py:26-40 shares one activation module).

Parameter count parity: 20,543,809 trainable parameters at
``base_channels=64`` (checked in ``tests/test_unet.py``).

TPU-first choices: NHWC layout end-to-end (MXU-friendly), configurable
compute dtype (bfloat16 by default for training speed, float32 params),
`jax.nn.gelu(approximate=False)` to match torch's exact-erf GELU.
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

__all__ = ["UNet", "DoubleConv", "mish", "count_parameters", "ACTIVATIONS"]


def mish(x: jnp.ndarray) -> jnp.ndarray:
    """Mish activation ``x * tanh(softplus(x))`` (/root/reference/src/unet.py:70-76)."""
    return x * jnp.tanh(jax.nn.softplus(x))


# Activation zoo of /root/reference/src/unet.py:44-64.  PReLU is handled
# separately inside DoubleConv because it carries a learnable parameter.
ACTIVATIONS: dict[str, Callable[[jnp.ndarray], jnp.ndarray]] = {
    "relu": jax.nn.relu,
    "leaky_relu": lambda x: jax.nn.leaky_relu(x, negative_slope=0.01),
    "leakyrelu": lambda x: jax.nn.leaky_relu(x, negative_slope=0.01),
    "elu": lambda x: jax.nn.elu(x, alpha=1.0),
    "gelu": lambda x: jax.nn.gelu(x, approximate=False),
    "swish": jax.nn.silu,
    "silu": jax.nn.silu,
    "mish": mish,
}


def _check_activation(name: str) -> str:
    lower = name.lower()
    if lower not in ACTIVATIONS and lower != "prelu":
        raise ValueError(
            f"Unsupported activation: {name}. Must be one of: relu, leaky_relu, "
            "elu, gelu, swish/silu, mish, prelu"
        )
    return lower


# ---------------------------------------------------------------------------
# Initialisation families.
#
# Default ("lecun"): flax-idiomatic lecun_normal kernels + zero biases.
# "torch": the distribution family torch's Conv2d/ConvTranspose2d resets to
# (kaiming_uniform(a=sqrt(5)) kernels — uniform with variance 1/(3*fan) —
# and uniform ±1/sqrt(fan) biases; torch.nn.modules.conv._ConvNd
# .reset_parameters).  The families differ most in the BIAS: torch draws a
# random bias, lecun zeroes it — so at init the torch-family output conv
# emits sigmoid(b)≠0.5, giving a non-degenerate thresholded prediction at
# epoch 0, while the zero-bias family starts at exactly 0.5 everywhere.
# The HD-gap attribution probe (scripts/hd_gap_probe.py) measures how much
# of the low-data Stage-I trajectory difference this explains.
#
# fan conventions (matching torch's _calculate_fan_in_and_fan_out):
#   Conv2d weight (out, in, kh, kw)          -> fan = in  * kh * kw
#   ConvTranspose2d weight (in, out, kh, kw) -> fan = out * kh * kw
# ---------------------------------------------------------------------------

# uniform kernel with variance scale/fan: bound = sqrt(3*scale/fan);
# scale=1/3 gives torch's kaiming_uniform(a=sqrt(5)) bound of 1/sqrt(fan).
_TORCH_KERNEL_INIT = nn.initializers.variance_scaling(1.0 / 3.0, "fan_in", "uniform")
_TORCH_KERNEL_INIT_T = nn.initializers.variance_scaling(1.0 / 3.0, "fan_out", "uniform")


def _torch_bias_init(fan: int):
    bound = 1.0 / (fan ** 0.5)
    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)
    return init


class _SplitFirstConv(nn.Module):
    """3×3 conv over the channel-concat of ``(a, b)`` WITHOUT
    materialising the concat.

    The parameter is the full ``(3, 3, Ca+Cb, F)`` kernel (same tree as
    ``nn.Conv`` over the concatenated input — checkpoints interchange),
    applied as two partial convs summed:
    ``conv(concat(a, b), K) == conv(a, K[:, :, :Ca]) + conv(b, K[:, :, Ca:])``.
    This removes the concat buffer write + read in the forward AND the
    concat-backward slice copies — pure HBM-traffic savings at every
    decoder level.  Numerically EQUIVALENT, not bit-identical: the
    channel reduction is accumulated in two halves then added (same
    tolerance class as FastUpsample's "taps" variant).
    """

    features: int
    dtype: Any = jnp.float32
    torch_init: bool = False

    @nn.compact
    def __call__(self, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
        ca, cb = a.shape[-1], b.shape[-1]
        kernel = self.param(
            "kernel",
            _TORCH_KERNEL_INIT if self.torch_init else nn.initializers.lecun_normal(),
            (3, 3, ca + cb, self.features),
        )
        bias = self.param(
            "bias",
            _torch_bias_init(9 * (ca + cb))
            if self.torch_init
            else nn.initializers.zeros_init(),
            (self.features,),
        )
        k = kernel.astype(self.dtype)
        dn = ("NHWC", "HWIO", "NHWC")
        ya = jax.lax.conv_general_dilated(
            a.astype(self.dtype), k[:, :, :ca], (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=dn,
        )
        yb = jax.lax.conv_general_dilated(
            b.astype(self.dtype), k[:, :, ca:], (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=dn,
        )
        return ya + yb + bias.astype(self.dtype)


class DoubleConv(nn.Module):
    """Conv3×3 → act → (spatial dropout) → Conv3×3 → act
    (/root/reference/src/unet.py:19-67).

    Dropout is channel-wise (torch ``Dropout2d`` semantics): the same
    mask is broadcast over H and W.

    When ``skip`` is given, the first conv consumes the implicit
    channel-concat ``[x, skip]`` via :class:`_SplitFirstConv` (identical
    parameter tree, no concat materialisation).
    """

    features: int
    dropout: float = 0.0
    activation: str = "relu"
    dtype: Any = jnp.float32
    torch_init: bool = False

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        deterministic: bool = True,
        skip: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        act_name = _check_activation(self.activation)
        if act_name == "prelu":
            # One shared weight for both convs of the block, matching the
            # reference's shared nn.PReLU() module instance.
            alpha = self.param("prelu_alpha", nn.initializers.constant(0.25), (1,))
            alpha = alpha.astype(self.dtype)
            act = lambda v: jnp.where(v >= 0, v, alpha * v)
        else:
            act = ACTIVATIONS[act_name]

        def conv(feats, in_ch, name):
            if self.torch_init:
                return nn.Conv(
                    feats, (3, 3), padding=1, dtype=self.dtype, name=name,
                    kernel_init=_TORCH_KERNEL_INIT,
                    bias_init=_torch_bias_init(9 * in_ch),
                )
            return nn.Conv(feats, (3, 3), padding=1, dtype=self.dtype, name=name)

        if skip is not None:
            x = _SplitFirstConv(
                self.features, self.dtype, self.torch_init, name="conv1"
            )(x, skip)
        else:
            x = conv(self.features, x.shape[-1], "conv1")(x)
        x = act(x)
        if self.dropout > 0:
            # broadcast over (H, W) => channel dropout, like nn.Dropout2d.
            x = nn.Dropout(
                rate=self.dropout, broadcast_dims=(1, 2), deterministic=deterministic
            )(x)
        x = conv(self.features, self.features, "conv2")(x)
        return act(x)


class FastUpsample(nn.Module):
    """2× upsampling numerically IDENTICAL to ``nn.ConvTranspose(k=2, s=2)``
    but ~2× faster on TPU.

    ConvTranspose lowers to a fractionally-strided conv; for the
    non-overlapping k=s=2 case the same map is one MXU matmul
    ``(B·H·W, C) × (C, 4F)`` followed by a depth-to-space reshape.
    Parameters keep the ConvTranspose structure — kernel ``(2, 2, in, F)``
    and bias ``(F,)`` — so checkpoints are interchangeable between the
    two implementations (verified to 0 ULP in ``tests/test_unet.py``).
    """

    features: int
    dtype: Any = jnp.float32
    # depth-to-space formulation (same math, different XLA lowering):
    #   "einsum6"  one 6-D einsum -> reshape (profiled: XLA inserts a
    #              ~0.1 ms relayout copy at the 128x128 level);
    #   "taps"     one matmul per kernel tap + jnp.stack interleave;
    #   "convtranspose"  native lax.conv_transpose lowering, the A/B
    #              control the matmul formulations were built against.
    variant: str = "einsum6"
    torch_init: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        if self.variant not in ("einsum6", "taps", "convtranspose"):
            raise ValueError(
                f"Unsupported FastUpsample variant: {self.variant!r}. "
                "Must be 'einsum6', 'taps' or 'convtranspose'"
            )
        in_ch = x.shape[-1]
        kernel = self.param(
            "kernel",
            # torch ConvTranspose2d fans over weight dim 1 = out channels
            _TORCH_KERNEL_INIT_T if self.torch_init else nn.initializers.lecun_normal(),
            (2, 2, in_ch, self.features),
        )
        bias = self.param(
            "bias",
            _torch_bias_init(4 * self.features)
            if self.torch_init
            else nn.initializers.zeros_init(),
            (self.features,),
        )
        # lax.conv_transpose applies the kernel spatially flipped
        k = kernel[::-1, ::-1].astype(self.dtype)
        xc = x.astype(self.dtype)
        b_, h, w, _ = x.shape
        if self.variant == "taps":
            # one (B*H*W, C) x (C, F) matmul per output-pixel parity.
            # Numerically EQUIVALENT to "einsum6", not bit-identical:
            # different dot blocking can round differently at ULP level
            # (tests/test_perf_equiv.py::TestFastUpsampleVariants uses
            # tolerance); the 0-ULP ConvTranspose-compatibility
            # invariant holds for the DEFAULT variant only.
            y = [
                jnp.einsum(
                    "bhwc,cf->bhwf", xc, k[i, j],
                    preferred_element_type=self.dtype,
                )
                for i in (0, 1)
                for j in (0, 1)
            ]
            row0 = jnp.stack(y[0:2], axis=3)  # (B, H, W, 2, F)
            row1 = jnp.stack(y[2:4], axis=3)
            out = jnp.stack([row0, row1], axis=2)  # (B, H, 2, W, 2, F)
        elif self.variant == "convtranspose":
            # native XLA conv_transpose lowering (fractionally-strided
            # conv) — the A/B control for the matmul formulations.
            y = jax.lax.conv_transpose(
                xc,
                kernel.astype(self.dtype),
                strides=(2, 2),
                padding="VALID",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
            return y + bias.astype(self.dtype)
        else:
            # output spec "bhiwjf" puts the depth-to-space interleave
            # directly in the einsum's output index order
            out = jnp.einsum(
                "bhwc,ijcf->bhiwjf", xc, k, preferred_element_type=self.dtype
            )
        y = out.reshape(b_, h * 2, w * 2, self.features)
        return y + bias.astype(self.dtype)


class UNet(nn.Module):
    """Standard U-Net (/root/reference/src/unet.py:79-216), NHWC.

    Args:
      in_channels / out_channels / base_channels / dropout /
      output_activation / intermediate_activation: as in the reference.
      dtype: compute dtype (params stay float32).  The returned
        probability map is always cast back to float32 so loss/metric
        accumulation stays full precision.
    """

    in_channels: int = 1
    out_channels: int = 1
    base_channels: int = 64
    dropout: float = 0.2
    output_activation: str = "sigmoid"
    intermediate_activation: str = "relu"
    dtype: Any = jnp.float32
    # rematerialise DoubleConv activations in the backward pass
    # (jax.checkpoint): trades ~1/3 more FLOPs for O(depth) less
    # activation HBM — enables much larger batch/resolution per chip.
    remat: bool = False
    # matmul+depth-to-space upsampling: numerically identical to
    # ConvTranspose(k=2, s=2) with the same parameter structure, ~2×
    # faster on TPU (see FastUpsample).
    fast_upsample: bool = True
    # FastUpsample lowering variant ("einsum6" | "taps" | "convtranspose"),
    # see FastUpsample.
    upsample_variant: str = "einsum6"
    # decoder skip-connection lowering: "concat" materialises
    # [up, skip] before each decoder block (reference semantics,
    # bit-path default); "split" computes the block's first conv as two
    # partial convs on up/skip directly (_SplitFirstConv) — same param
    # tree, no concat buffers, numerically equivalent (not bit-identical).
    decoder: str = "concat"
    # "fused": reshape-max pool with hand-written first-match backward
    # (bit-compatible with select-and-scatter/torch incl. ties, ~0.4 ms
    # per step faster — see ops/pool.py); "xla": flax nn.max_pool.
    pool: str = "fused"
    # "lecun" (flax-idiomatic default) | "torch" (torch's reset_parameters
    # family: kaiming_uniform(a=sqrt(5)) kernels + uniform ±1/sqrt(fan)
    # biases).  Same parameter tree either way — checkpoints interchange.
    # "torch" matters in the low-data regime: the zero-bias default makes
    # the epoch-0 thresholded prediction degenerate (sigmoid(0)=0.5
    # everywhere), see the init-family note above and HD_GAP.md.
    param_init: str = "lecun"

    def setup(self):
        if self.output_activation.lower() not in ("sigmoid", "tanh"):
            raise ValueError(
                f"Unsupported output_activation: {self.output_activation}. "
                "Must be 'sigmoid' or 'tanh'"
            )
        if self.decoder not in ("concat", "split"):
            raise ValueError(
                f"Unsupported decoder mode: {self.decoder!r}. "
                "Must be 'concat' or 'split'"
            )
        _check_activation(self.intermediate_activation)
        if self.param_init not in ("lecun", "torch"):
            raise ValueError(
                f"Unsupported param_init: {self.param_init!r}. "
                "Must be 'lecun' or 'torch'"
            )
        ti = self.param_init == "torch"
        c, act, d, dt = (
            self.base_channels,
            self.intermediate_activation,
            self.dropout,
            self.dtype,
        )
        Block = (
            nn.remat(DoubleConv, static_argnums=(2,)) if self.remat else DoubleConv
        )
        if self.fast_upsample:
            Up = lambda feats: FastUpsample(feats, dt, self.upsample_variant, ti)
        elif ti:
            Up = lambda feats: nn.ConvTranspose(
                feats, (2, 2), strides=(2, 2), padding="VALID", dtype=dt,
                kernel_init=_TORCH_KERNEL_INIT_T,
                bias_init=_torch_bias_init(4 * feats),
            )
        else:
            Up = lambda feats: nn.ConvTranspose(
                feats, (2, 2), strides=(2, 2), padding="VALID", dtype=dt
            )
        # Dropout schedule of /root/reference/src/unet.py:120-154.
        self.enc1 = Block(c, 0.0, act, dt, ti)
        self.enc2 = Block(c * 2, d * 0.5, act, dt, ti)
        self.enc3 = Block(c * 4, d, act, dt, ti)
        self.enc4 = Block(c * 8, d, act, dt, ti)
        self.bottleneck = Block(c * 8, d, act, dt, ti)
        self.up4 = Up(c * 8)
        self.dec4 = Block(c * 8, d, act, dt, ti)
        self.up3 = Up(c * 4)
        self.dec3 = Block(c * 4, d * 0.5, act, dt, ti)
        self.up2 = Up(c * 2)
        self.dec2 = Block(c * 2, d * 0.5, act, dt, ti)
        self.up1 = Up(c)
        self.dec1 = Block(c, 0.0, act, dt, ti)
        if ti:
            self.out_conv = nn.Conv(
                self.out_channels, (1, 1), dtype=dt,
                kernel_init=_TORCH_KERNEL_INIT,
                bias_init=_torch_bias_init(c),
            )
        else:
            self.out_conv = nn.Conv(self.out_channels, (1, 1), dtype=dt)

    def __call__(self, x: jnp.ndarray, *, deterministic: bool = True) -> jnp.ndarray:
        """(B, H, W, C_in) → probability map (B, H, W, out_channels) in (0, 1)."""
        x = x.astype(self.dtype)
        if self.pool == "fused":
            from ..ops.pool import max_pool_2x2 as pool
        else:
            pool = lambda v: nn.max_pool(v, (2, 2), strides=(2, 2))

        e1 = self.enc1(x, deterministic)
        e2 = self.enc2(pool(e1), deterministic)
        e3 = self.enc3(pool(e2), deterministic)
        e4 = self.enc4(pool(e3), deterministic)

        b = self.bottleneck(pool(e4), deterministic)

        if self.decoder == "split":
            d4 = self.dec4(self.up4(b), deterministic, e4)
            d3 = self.dec3(self.up3(d4), deterministic, e3)
            d2 = self.dec2(self.up2(d3), deterministic, e2)
            d1 = self.dec1(self.up1(d2), deterministic, e1)
        else:
            d4 = self.dec4(jnp.concatenate([self.up4(b), e4], axis=-1), deterministic)
            d3 = self.dec3(jnp.concatenate([self.up3(d4), e3], axis=-1), deterministic)
            d2 = self.dec2(jnp.concatenate([self.up2(d3), e2], axis=-1), deterministic)
            d1 = self.dec1(jnp.concatenate([self.up1(d2), e1], axis=-1), deterministic)

        out = self.out_conv(d1).astype(jnp.float32)
        if self.output_activation.lower() == "sigmoid":
            return jax.nn.sigmoid(out)
        # tanh rescaled to (0, 1) (/root/reference/src/unet.py:211-214)
        return (jnp.tanh(out) + 1.0) / 2.0


def count_parameters(params) -> int:
    """Number of trainable parameters (/root/reference/src/unet.py:220-230)."""
    return sum(p.size for p in jax.tree_util.tree_leaves(params))
