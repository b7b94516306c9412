"""Subpixel (phase-decomposed) nearest-2x-upsample + 3x3 conv.

The reference upsamples with `F.interpolate(mode='nearest')` then runs a
3x3 conv (`openaimodel.py` Upsample, `ldm/modules/diffusionmodules/
model.py` VAE Upsample). Computing the conv on the upsampled tensor redoes
every input product ~2.25x: for output phase (di, dj) in {0,1}^2 the three
taps along each axis collapse onto TWO distinct source pixels
(floor((d+a)/2) for a in {-1,0,1} hits {-1,0} for d=0 and {0,1} for d=1),
so the 3x3 kernel folds into four 2x2 phase kernels:

  rows(d=0) = (W[0], W[1]+W[2])        rows(d=1) = (W[0]+W[1], W[2])
  (same combination along columns)

Each phase is a 2x2 conv on the ORIGINAL tensor (asymmetric padding), and
the phases interleave into the 2x output — 16 tap-applications instead of
36 (0.44x flops), and the upsampled tensor never hits HBM. Gradients flow
through the kernel folding as plain jnp ops — no custom VJP needed.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _phase_rows(w, d):
    # w: [3, kw, C, C'] -> [2, kw, C, C'] combined row taps for output phase d
    if d == 0:
        return jnp.stack([w[0], w[1] + w[2]], axis=0)
    return jnp.stack([w[0] + w[1], w[2]], axis=0)


def upsample2x_conv(x: jnp.ndarray, kernel: jnp.ndarray,
                    bias: jnp.ndarray | None = None) -> jnp.ndarray:
    """nearest-2x upsample of NHWC `x` followed by a 3x3 'SAME' conv with
    HWIO `kernel` [3, 3, C, C'] — computed as 4 phase convs (see module
    docstring). Bit-equivalent reduction ordering differences vs the naive
    path are at float-rounding level (taps that hit the same source pixel
    are pre-summed in the kernel)."""
    b, h, w, c = x.shape
    outs = []
    for di in (0, 1):
        wr = _phase_rows(kernel, di)          # [2, 3, C, C']
        pr = (1, 0) if di == 0 else (0, 1)
        for dj in (0, 1):
            k2 = _phase_rows(jnp.swapaxes(wr, 0, 1), dj)  # cols -> [2, 2, C, C']
            k2 = jnp.swapaxes(k2, 0, 1)
            pc = (1, 0) if dj == 0 else (0, 1)
            # NOTE: no preferred_element_type here — jax's conv VJP feeds
            # the fp32 cotangent into a bf16-kernel conv and trips the
            # dtype check, which broke every bf16 training path through an
            # Upsample. The MXU accumulates bf16 convs in fp32 regardless,
            # and the output is cast to x.dtype either way.
            y = jax.lax.conv_general_dilated(
                x, k2, window_strides=(1, 1), padding=(pr, pc),
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            outs.append(y)
    # interleave phases: outs order (di, dj) = (0,0),(0,1),(1,0),(1,1)
    y = jnp.stack(outs, axis=0).reshape(2, 2, b, h, w, -1)
    y = y.transpose(2, 3, 0, 4, 1, 5).reshape(b, 2 * h, 2 * w, -1)
    if bias is not None:
        y = y + bias.astype(y.dtype)
    return y


class ConvParams:
    """flax shadow module owning nn.Conv-compatible kernel+bias params (so
    upsample2x_conv can consume them while checkpoints keep the nn.Conv
    param paths). Defined lazily to avoid a flax import at ops level."""


def make_conv_params_module():
    from flax import linen as nn

    class _ConvParams(nn.Module):
        features: int
        kernel_size: int = 3
        zero_init: bool = False

        @nn.compact
        def __call__(self, in_ch: int):
            kinit = (nn.initializers.zeros if self.zero_init
                     else nn.initializers.lecun_normal())
            k = self.param("kernel", kinit,
                           (self.kernel_size, self.kernel_size, in_ch,
                            self.features))
            b = self.param("bias", nn.initializers.zeros, (self.features,))
            return k, b

    return _ConvParams


def nearest_upsample2x_conv_reference(x, kernel, bias=None):
    """Naive path for parity tests: resize nearest 2x then 3x3 conv."""
    b, h, w, c = x.shape
    up = jax.image.resize(x, (b, 2 * h, 2 * w, c), method="nearest")
    y = jax.lax.conv_general_dilated(
        up, kernel, window_strides=(1, 1), padding=((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    if bias is not None:
        y = y + bias.astype(y.dtype)
    return y
