"""CLIP teacher filtering for compositional distillation.

Re-design of `calc_clip_losses` + the teacher-filter control flow
(`ddpm.py:3039-3180,3593-3700`): before paying the grad-enabled
distillation pass, denoise `num_candidate_teachers` candidate
(x_start, noise, t) twins WITHOUT grad, CFG-reconstruct their images, and
CLIP-score them against the class-comp prompt. An instance is teachable
when the teacher (mix-comp) image clears `0.5 - CLIP-T <= 0.28` and beats
the student (subj-comp) by `> 0.002`; the best candidate (largest
teacher-student gap) seeds the grad pass, and its reconstruction is cached
for a follow-up reuse-init iteration (`cached_inits`, `:3156-3180`).

The data-dependent branch stays a host round-trip (SURVEY.md §7.3): the
candidate denoise is one jitted call, the decision is two floats on host.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from adaface_tpu.models.vae import SD_VAE_SCALE_FACTOR, AutoencoderKL

# Default student/teacher CFG scales for the filter pass. The reference
# calls `gen_cfg_scales_for_stu_tea(6, 5, ...)` (`ddpm.py:3113-3116`) whose
# signature is `(tea_scale, stu_scale, ...)` (`ldm/util.py:2459-2464`):
# teacher (mix-comp) rows get 6, student (subj-comp) rows get 5.
STUDENT_CFG_SCALE = 5.0
TEACHER_CFG_SCALE = 6.0


@dataclasses.dataclass
class FilterVerdict:
    is_teachable: bool
    best_cand_idx: int
    losses_subj_comp: np.ndarray  # [N]
    losses_mix_comp: np.ndarray  # [N]
    images: np.ndarray  # [2N, H, W, 3] uint8 (subj-comp, mix-comp rows)
    # CFG-denoised latent reconstructions [2N, h, w, 4]; the best
    # candidate's SUBJECT row (`x_recon.chunk(2)[0]`, `ddpm.py:3144`) is
    # what reuse-init must cache — the teacher's composition, not the
    # pre-noise training latent
    x_recons: np.ndarray = None


class TeacherFilter:
    def __init__(self, clip_scorer, unet, unet_params, vae, vae_params,
                 sched, clip_loss_thres: float = 0.28,
                 cls_subj_clip_margin: float = 0.002,
                 student_cfg_scale: float = STUDENT_CFG_SCALE,
                 teacher_cfg_scale: float = TEACHER_CFG_SCALE):
        self.clip_scorer = clip_scorer
        self.sched = sched
        self.clip_loss_thres = clip_loss_thres
        self.cls_subj_clip_margin = cls_subj_clip_margin
        self.student_cfg_scale = student_cfg_scale
        self.teacher_cfg_scale = teacher_cfg_scale

        @jax.jit
        def _denoise(x_start, noise, t, ctx_v, ctx_k, uncond_ctx, cfg_scales):
            """One no-grad candidate denoise: eps at t under the comp
            contexts + CFG x0 reconstruction + VAE decode."""
            x_noisy = sched.q_sample(x_start, t, noise)
            eps_c = unet.apply({"params": unet_params}, x_noisy, t, ctx_v,
                               context_k=ctx_k)
            eps_u = unet.apply({"params": unet_params}, x_noisy, t, uncond_ctx)
            eps = eps_u + cfg_scales[:, None, None, None] * (eps_c - eps_u)
            x0 = sched.predict_x0_from_eps(x_noisy, t, eps)
            imgs = vae.apply({"params": vae_params}, x0 / SD_VAE_SCALE_FACTOR,
                             method=AutoencoderKL.decode)
            return jnp.clip((imgs + 1.0) / 2.0, 0.0, 1.0), x0

        self._denoise = _denoise

    def filter(
        self,
        x_start: jnp.ndarray,  # [N, h, w, 4] candidate starts
        noise: jnp.ndarray,  # [N, h, w, 4]
        t: jnp.ndarray,  # [N]
        subj_comp_ctx: Tuple[jnp.ndarray, jnp.ndarray],  # (v, k) [L, N, T, D]
        mix_comp_ctx: Tuple[jnp.ndarray, jnp.ndarray],
        uncond_ctx: jnp.ndarray,  # [1 or L, N, T, D]
        cls_comp_prompt,  # str, or per-instance list of N strs (CB>1 blocks)
    ) -> FilterVerdict:
        N = x_start.shape[0]
        x2 = jnp.concatenate([x_start, x_start])
        n2 = jnp.concatenate([noise, noise])
        t2 = jnp.concatenate([t, t])
        ctx_v = jnp.concatenate([subj_comp_ctx[0], mix_comp_ctx[0]], axis=1)
        ctx_k = jnp.concatenate([subj_comp_ctx[1], mix_comp_ctx[1]], axis=1)
        un2 = jnp.concatenate([uncond_ctx, uncond_ctx], axis=1)
        scales = jnp.asarray([self.student_cfg_scale] * N
                             + [self.teacher_cfg_scale] * N)
        imgs, x0 = self._denoise(x2, n2, t2, ctx_v, ctx_k, un2, scales)
        imgs255 = np.asarray((imgs * 255).astype(jnp.uint8))

        pl = ([cls_comp_prompt] * N if isinstance(cls_comp_prompt, str)
              else list(cls_comp_prompt))
        assert len(pl) == N, f"{len(pl)} prompts for {N} candidates"
        sims = self.clip_scorer.txt_to_img_similarity(
            pl + pl, imgs255, reduction="diag")
        losses = 0.5 - np.asarray(sims)
        l_subj, l_mix = losses[:N], losses[N:]
        verdict = FilterVerdict(False, 0, l_subj, l_mix, imgs255,
                                np.asarray(x0))
        # single-block summary fields via the same thresholding the
        # CB-block path uses (one formula, one place)
        any_ok, best, _ = self.per_block(verdict, n_cand=N, CB=1)
        verdict.is_teachable = any_ok
        verdict.best_cand_idx = int(best[0])
        return verdict

    def per_block(self, verdict: "FilterVerdict", n_cand: int, CB: int):
        """Per-block teachability over a cand-major [n_cand*CB] verdict:
        a candidate is teachable when its teacher (mix-comp) image clears
        `clip_loss_thres` AND beats the student by `cls_subj_clip_margin`
        (`ddpm.py:3047-3131`); each block's chosen candidate is its
        largest teacher-student gap among its teachable candidates, or —
        for unteachable blocks riding along a partially-teachable CB>1
        batch — its best-scoring candidate as fallback. Returns
        (any_teachable, best_cand [CB], block_teachable [CB])."""
        l_subj = np.asarray(verdict.losses_subj_comp).reshape(n_cand, CB)
        l_mix = np.asarray(verdict.losses_mix_comp).reshape(n_cand, CB)
        diffs = l_subj - l_mix
        teachable = ((l_mix <= self.clip_loss_thres)
                     & (diffs > self.cls_subj_clip_margin))  # [n_cand, CB]
        block_ok = teachable.any(axis=0)
        best_teachable = np.argmax(np.where(teachable, diffs, -1e4), axis=0)
        best_scoring = np.argmax(diffs, axis=0)
        best = np.where(block_ok, best_teachable, best_scoring)
        return bool(block_ok.any()), best, block_ok


class CachedInits:
    """`cached_inits` (`ddpm.py:3156-3180`): the best candidate's CFG
    reconstruction seeds a follow-up reuse-init compositional iteration at
    mid-range t."""

    def __init__(self):
        self._store: Dict[str, dict] = {}

    def put(self, subject: str, x_start: jnp.ndarray, t: np.ndarray, **extra):
        """`extra` carries the iteration context the reference also caches
        (`ddpm.py:3158-3177`): fg_mask, comp_init_fg_from_training_image,
        use_background_token, ..."""
        self._store[subject] = {"x_start": np.asarray(x_start),
                                "t": np.asarray(t), **extra}

    def peek(self, subject: str) -> Optional[dict]:
        """Non-destructive lookup (the CB>1 all-or-nothing reuse check)."""
        return self._store.get(subject)

    def pop(self, subject: str) -> Optional[dict]:
        return self._store.pop(subject, None)

    def __contains__(self, subject: str) -> bool:
        return subject in self._store
