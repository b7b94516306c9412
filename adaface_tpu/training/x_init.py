"""Host-side compositional x_start initialization.

Re-derivation of `init_x_with_fg_from_training_image`
(`/root/reference/ldm/util.py:2403-2457`) + `rand_annealed`
(`ldm/util.py:1727-1733`) on numpy/NHWC: fresh compositional-distillation
iterations start from the fg of the training image scaled down onto a
noise background, with an annealed amount of fg noise — instead of the
plain VAE-encoded training latent (`ddpm.py:2645-2660`). Runs on host
(numpy), before the batch ships to the device: this is per-iteration data
prep with data-dependent resize shapes, not jit territory.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np

from adaface_tpu.training.iter_plan import anneal_value


def rand_annealed(rng: np.random.Generator, training_percent: float,
                  final_percent: float, mean_range: Tuple[float, float],
                  fluct_range: Tuple[float, float] = (0.8, 1.2),
                  legal_range: Tuple[float, float] = (0.0, 1.0)) -> float:
    """Annealed-mean uniform draw (`rand_annealed`, `ldm/util.py:1727-1733`)."""
    mean = anneal_value(training_percent, final_percent, mean_range)
    lb = max(mean * fluct_range[0], legal_range[0])
    ub = min(mean * fluct_range[1], legal_range[1])
    return float(rng.uniform(lb, ub))


def _resize_bilinear_nhwc(x: np.ndarray, oh: int, ow: int,
                          scale: float | None = None) -> np.ndarray:
    """Bilinear resize [B, H, W, C] -> [B, oh, ow, C] with torch
    F.interpolate(align_corners=False) semantics: src = (dst+0.5)*scale-0.5,
    clamped. When the caller resized via `scale_factor` (the reference's
    path), torch maps coordinates with the EXACT factor, not the realized
    oh/h ratio (recompute_scale_factor=False) — pass `scale` to match;
    the feather ring at the fg boundary differs otherwise."""
    b, h, w, c = x.shape
    inv_h = (1.0 / scale) if scale else (h / oh)
    inv_w = (1.0 / scale) if scale else (w / ow)
    ys = np.clip((np.arange(oh) + 0.5) * inv_h - 0.5, 0, h - 1)
    xs = np.clip((np.arange(ow) + 0.5) * inv_w - 0.5, 0, w - 1)
    y0 = np.floor(ys).astype(np.int64)
    x0 = np.floor(xs).astype(np.int64)
    y1 = np.minimum(y0 + 1, h - 1)
    x1 = np.minimum(x0 + 1, w - 1)
    wy = (ys - y0).astype(x.dtype)[None, :, None, None]
    wx = (xs - x0).astype(x.dtype)[None, None, :, None]
    top = x[:, y0][:, :, x0] * (1 - wx) + x[:, y0][:, :, x1] * wx
    bot = x[:, y1][:, :, x0] * (1 - wx) + x[:, y1][:, :, x1] * wx
    return top * (1 - wy) + bot * wy


def init_x_with_fg_from_training_image(
    rng: np.random.Generator,
    x_start: np.ndarray,  # [B, h, w, 4] VAE-encoded training latents
    fg_mask: np.ndarray,  # [B, h, w, 1] latent-res fg mask
    training_percent: float,
    base_scale_range: Tuple[float, float] = (0.7, 1.0),
    fg_noise_anneal_mean_range: Tuple[float, float] = (0.1, 0.4),
) -> Tuple[np.ndarray, np.ndarray]:
    """Fg-initialized compositional x_start (`init_x_with_fg_from_training_
    image`, `ldm/util.py:2403-2457`):

    1. background -> unit gaussian noise;
    2. the fg content (and its mask) is bilinearly scaled down by a random
       factor — more aggressively when the fg covers > 10% of the image
       ((0.1/pct)^0.35 extra scale) — and center-padded back;
    3. an annealed fraction (mean 0.1 -> 0.4 over training) of fg content
       is replaced by noise.

    Returns (x_start, filtered_fg_mask), both numpy. `fg_mask` should
    already be zeroed for instances without a real mask (the reference's
    `filtered_fg_mask = fg_mask * batch_have_fg_mask`)."""
    x_start = np.asarray(x_start, np.float32)
    fgm = (np.asarray(fg_mask, np.float32) > 1e-6).astype(np.float32)
    b, h, w, _ = x_start.shape

    x_orig = np.where(fgm > 0, x_start,
                      rng.standard_normal(x_start.shape).astype(np.float32))
    fg_pct = float(fgm.sum()) / fgm.size
    lb, ub = base_scale_range
    if fg_pct > 0.1:
        extra = (0.1 / fg_pct) ** 0.35
        scale = rng.uniform(lb * extra, max(0.5, ub * extra))
    else:
        scale = rng.uniform(lb, ub)

    sh, sw = max(int(h * scale), 1), max(int(w * scale), 1)
    packed = np.concatenate([x_orig, fgm], axis=-1)
    scaled = _resize_bilinear_nhwc(packed, sh, sw, scale=scale)
    ph1, pw1 = (h - sh) // 2, (w - sw) // 2
    padded = np.zeros((b, h, w, packed.shape[-1]), np.float32)
    padded[:, ph1:ph1 + sh, pw1:pw1 + sw] = scaled
    x_scaled, fgm_scaled = padded[..., :4], padded[..., 4:]
    # .bool() semantics (`ldm/util.py:2450`): ANY nonzero interpolated
    # pixel counts as foreground — a >0.5 cut would erase the bilinear
    # feather ring of small fg regions at aggressive down-scales
    fgm_scaled = (fgm_scaled > 0).astype(np.float32)

    x_new = np.where(fgm_scaled > 0, x_scaled,
                     rng.standard_normal(x_start.shape).astype(np.float32))
    amt = rand_annealed(rng, training_percent, 1.0, fg_noise_anneal_mean_range)
    x_new = (rng.standard_normal(x_start.shape).astype(np.float32) * amt
             + x_new * (1.0 - amt))
    return x_new, fgm_scaled
