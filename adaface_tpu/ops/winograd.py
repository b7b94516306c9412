"""Fused Pallas Winograd F(2x2, 3x3) convolution for the ResBlock hot path.

The SD U-Net / VAE spend most of their conv budget in stride-1 SAME 3x3
convs (reference `openaimodel.py` ResBlock, `ldm/modules/diffusionmodules/
model.py` ResnetBlock). XLA's direct conv runs them at ~82% of the bf16 MXU
peak — capped by Cout=320 padding to 128-lane panels — so the only way to
go meaningfully faster is to do fewer MXU flops: Winograd F(2x2, 3x3)
computes each 2x2 output tile with 16 multiplies instead of 36 (2.25x).

STATUS: measured NEGATIVE result, kept as an off-by-default A/B arm.
On-chip (v5e, bf16, scripts/perf_winograd.py, n=200 chained):
  B8 64x64 C320:  direct 0.393 ms (76.8 TMAC/s) | wino 0.513 ms (0.77x)
  B8 32x32 C640:  direct 0.312 ms (96.7 TMAC/s) | wino 0.340 ms (0.92x)
  B8 16x16 C1280: direct 0.322 ms (93.8 TMAC/s) | wino 0.518 ms (0.62x)
XLA's direct conv already runs at 78-98% of the 98.5 TMAC/s bf16 peak
(~94% of the lane-padded ceiling at C=320), so the 2.25x flop saving is
fully eaten by the phase-grid HBM round-trip + VPU transform sums. No
conv headroom remains on this chip; nothing dispatches here by default.

A pure-XLA Winograd loses even worse (PERF.md round-3: 4-6x SLOWER — the
16 phase transforms materialize 4x the input bytes in HBM each way). This
kernel keeps every transform in VMEM:

  host:   xp = pad(x, 1); four phase grids xs[u,v] = xp[:, u::2, v::2, :]
          (the only HBM cost: ~1x extra input-read+write, amortized)
  kernel: per batch element, for each of the 16 Winograd positions (i, j):
            t_ij = sum_pq BT[i,p] BT[j,q] xs[p%2,q%2][rowshift p//2,
                   colshift q//2]                       (VPU adds, +-1 coeffs)
            m_ij = t_ij[tiles, Cin] @ U_ij[Cin, Cout]   (MXU, fp32 acc)
            y_ab += AT[a,i] AT[b,j] m_ij                (VPU adds)
          y written as [4, tiles, Cout] phase panels
  host:   depth-to-space interleave to [B, H, W, Cout]

U = G g G^T is transformed from the HWIO kernel at trace time (loop-
invariant inside the DDIM scan; XLA hoists it).

Numerics: the transforms are exact in fp32 (coefficients +-1 and 0.5); in
bf16 the t-sums round once more than direct conv taps — same class of
reassociation as the subpixel upsample path. fp32 accumulation throughout
the MXU and the 9-term output sum.

Backward: Winograd is the same linear map as the direct conv, so the VJP
is taken through the direct conv (exact, and keeps training numerics on
the XLA path).
"""

from __future__ import annotations

import functools
from adaface_tpu import knobs

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# F(2x2, 3x3) transform matrices (Lavin & Gray, arXiv:1509.09308):
#   y = AT [ (G g GT) * (BT d B) ] A  for a 4x4 input tile d, 3x3 filter g
_BT = ((1, 0, -1, 0),
       (0, 1, 1, 0),
       (0, -1, 1, 0),
       (0, 1, 0, -1))
_AT = ((1, 1, 1, 0),
       (0, 1, -1, -1))
_G = np.array([[1.0, 0.0, 0.0],
               [0.5, 0.5, 0.5],
               [0.5, -0.5, 0.5],
               [0.0, 0.0, 1.0]])


def transform_weights(kernel: jnp.ndarray) -> jnp.ndarray:
    """HWIO [3, 3, Cin, Cout] -> U [16, Cin, Cout] (U_ij = (G g GT)_ij)."""
    g32 = kernel.astype(jnp.float32)
    gg = np.asarray(_G, dtype=np.float32)
    u = jnp.einsum("pa,qb,abio->pqio", gg, gg, g32)
    ci, co = kernel.shape[2], kernel.shape[3]
    return u.reshape(16, ci, co).astype(kernel.dtype)


def _wino_kernel(x00_ref, x01_ref, x10_ref, x11_ref, u_ref, b_ref, o_ref, *,
                 hh: int, wh: int, cin: int):
    """One batch element. x??_ref: [1, hh+1, wh+1, cin] phase grids;
    u_ref: [16, cin, cout]; b_ref: [1, cout]; o_ref: [1, 4, hh*wh, cout]."""
    xs = ((x00_ref[0], x01_ref[0]), (x10_ref[0], x11_ref[0]))

    def P(p, q):
        # phase (p, q) of the 4x4 tile grid: xs[p%2][q%2] shifted by
        # (p//2, q//2). Row shift rides the leading dim (free); col shift
        # is a sublane-offset slice.
        return xs[p % 2][q % 2][p // 2:p // 2 + hh, q // 2:q // 2 + wh, :]

    bias = b_ref[0].astype(jnp.float32)
    y = [[None, None], [None, None]]
    for i in range(4):
        for j in range(4):
            t = None
            for p in range(4):
                cp = _BT[i][p]
                if cp == 0:
                    continue
                for q in range(4):
                    cq = _BT[j][q]
                    if cq == 0:
                        continue
                    term = P(p, q) if cp * cq > 0 else -P(p, q)
                    t = term if t is None else t + term
            tm = t.reshape(hh * wh, cin)
            m = jax.lax.dot_general(
                tm, u_ref[4 * i + j], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            for a in range(2):
                ca = _AT[a][i]
                if ca == 0:
                    continue
                for b2 in range(2):
                    cb = _AT[b2][j]
                    if cb == 0:
                        continue
                    term = m if ca * cb > 0 else -m
                    y[a][b2] = term if y[a][b2] is None else y[a][b2] + term
    for a in range(2):
        for b2 in range(2):
            o_ref[0, 2 * a + b2] = (y[a][b2] + bias[None, :]).astype(o_ref.dtype)


def _phase_grids(x: jnp.ndarray):
    """SAME-pad and split into the four stride-2 phase grids
    [B, H/2+1, W/2+1, C] (xs[u][v][r, s] = xp[2r+u, 2s+v])."""
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    return [xp[:, u::2, v::2, :] for u in (0, 1) for v in (0, 1)]


def _wino_impl(x: jnp.ndarray, kernel: jnp.ndarray,
               bias: jnp.ndarray | None) -> jnp.ndarray:
    b, h, w, cin = x.shape
    cout = kernel.shape[-1]
    hh, wh = h // 2, w // 2
    u = transform_weights(kernel)
    x00, x01, x10, x11 = _phase_grids(x)
    b2d = (bias if bias is not None
           else jnp.zeros((cout,), x.dtype)).reshape(1, cout)

    interpret = jax.devices()[0].platform != "tpu"
    par = pltpu.GridDimensionSemantics.PARALLEL
    xspec = pl.BlockSpec((1, hh + 1, wh + 1, cin), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_wino_kernel, hh=hh, wh=wh, cin=cin),
        interpret=interpret,
        grid=(b,),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=(par,),
            vmem_limit_bytes=100 * 1024 * 1024),
        in_specs=[
            xspec, xspec, xspec, xspec,
            pl.BlockSpec((16, cin, cout), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cout), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 4, hh * wh, cout), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, 4, hh * wh, cout), x.dtype),
    )(x00, x01, x10, x11, u, b2d)
    # depth-to-space: [B, (a b), hh*wh, C] -> [B, 2r+a, 2s+b, C]
    y = out.reshape(b, 2, 2, hh, wh, cout)
    return y.transpose(0, 3, 1, 4, 2, 5).reshape(b, h, w, cout)


def direct_conv3x3(x: jnp.ndarray, kernel: jnp.ndarray,
                   bias: jnp.ndarray | None = None) -> jnp.ndarray:
    """Reference/fallback path: XLA stride-1 SAME conv (+ bias)."""
    y = jax.lax.conv_general_dilated(
        x, kernel.astype(x.dtype), window_strides=(1, 1),
        padding=((1, 1), (1, 1)), dimension_numbers=("NHWC", "HWIO", "NHWC"))
    if bias is not None:
        y = y + bias.astype(y.dtype)
    return y


@jax.custom_vjp
def winograd_conv3x3(x: jnp.ndarray, kernel: jnp.ndarray,
                     bias: jnp.ndarray) -> jnp.ndarray:
    """stride-1 SAME 3x3 conv via the fused Winograd kernel. H, W even."""
    return _wino_impl(x, kernel, bias)


def _wino_fwd(x, kernel, bias):
    return _wino_impl(x, kernel, bias), (x, kernel)


def _wino_bwd(res, g):
    # Winograd computes the same linear map as the direct conv; its exact
    # VJP is the direct conv's VJP (and keeps training on the XLA path —
    # the kernel above is forward/inference-tuned).
    x, kernel = res
    _, vjp = jax.vjp(lambda xx, kk: direct_conv3x3(xx, kk, None), x, kernel)
    dx, dk = vjp(g)
    dbias = g.astype(jnp.float32).sum(axis=(0, 1, 2)).astype(g.dtype)
    return dx, dk, dbias


winograd_conv3x3.defvjp(_wino_fwd, _wino_bwd)


def _vmem_estimate(h, w, cin, cout, itemsize) -> int:
    hh, wh = h // 2, w // 2
    tiles = hh * wh
    grids = 20 * (hh + 1) * (wh + 1) * cin * itemsize  # 4 blocks + 16 P slices
    weights = 16 * cin * cout * itemsize
    acc = 5 * tiles * cout * 4  # 4 y accumulators + live m, fp32
    out = 4 * tiles * cout * itemsize
    return grids + weights + acc + out


# dispatch gates. The kernel is a measured NEGATIVE result at SD shapes
# (0.62-0.92x vs XLA's direct conv, PERF.md), so it is OFF unless
# explicitly opted in:
#   ADAFACE_WINOGRAD unset or =0 — never dispatches (the default)
#   ADAFACE_WINOGRAD=1    — force wherever legal (shape + VMEM fit)
#   ADAFACE_WINOGRAD=auto — heuristic gates (min-tiles + lane width), for
#     re-measuring on future hardware
#   ADAFACE_WINOGRAD_MIN_TILES: min hh*wh (GEMM M dim) for auto — small
#     panels underfill the MXU and the direct conv wins
_DEF_MIN_TILES = 256
_DEF_VMEM_BUDGET = 72 * 1024 * 1024


def winograd_eligible(x_shape, cout: int, itemsize: int = 2) -> bool:
    mode = knobs.get("ADAFACE_WINOGRAD", "0")
    if mode not in ("1", "auto"):
        return False
    b, h, w, cin = x_shape
    if h % 2 or w % 2:
        return False
    forced = mode == "1"
    min_tiles = int(knobs.get("ADAFACE_WINOGRAD_MIN_TILES",
                                   str(_DEF_MIN_TILES)))
    if not forced and (h // 2) * (w // 2) < min_tiles:
        return False
    if not forced and (cin < 128 or cout < 128):  # lanes too thin
        return False
    budget = int(knobs.get("ADAFACE_WINOGRAD_VMEM",
                                str(_DEF_VMEM_BUDGET)))
    return _vmem_estimate(h, w, cin, cout, itemsize) <= budget


def conv3x3_same(x: jnp.ndarray, kernel: jnp.ndarray,
                 bias: jnp.ndarray | None = None,
                 enabled: bool = True) -> jnp.ndarray:
    """stride-1 SAME 3x3 conv; dispatches to the fused Winograd kernel when
    `enabled` and the shape clears the eligibility gates, else XLA conv."""
    if enabled and winograd_eligible(x.shape, kernel.shape[-1],
                                     jnp.dtype(x.dtype).itemsize):
        b = bias if bias is not None else jnp.zeros(
            (kernel.shape[-1],), x.dtype)
        return winograd_conv3x3(x, kernel.astype(x.dtype), b.astype(x.dtype))
    return direct_conv3x3(x, kernel, bias)
