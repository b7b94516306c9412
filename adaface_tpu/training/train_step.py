"""Jitted training steps.

The reference trains ONLY the personalization parameters (embedding manager;
optionally the subject-basis generator) against a frozen SD backbone with
PyTorch Lightning manual optimization (`ddpm.py:519-642`). Here the train
step is a pure function: (trainable params, frozen params, batch, opt state,
rng) -> (new params, new opt state, metrics), jitted once per iteration
*type* (SURVEY.md §7.1 — the iteration-type dice roll happens on host in
`iter_plan.py`; each type has a stable compiled shape).

Parallelism follows the reference's story (SURVEY.md §2.8): pure data
parallelism over the batch axis. Under `shard_map`/`NamedSharding` on a
1-D `dp` mesh, XLA inserts the gradient all-reduce (the NCCL analog).
"""

from __future__ import annotations

import functools
from typing import Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax

from adaface_tpu.models.clip_text import CLIPTextEncoder
from adaface_tpu.models.unet import UNetModel
from adaface_tpu.ops.schedule import DiffusionSchedule
from adaface_tpu.personalization.embedding_manager import EmbeddingManager
from adaface_tpu.personalization.static_embedding import compute_static_embedding
from adaface_tpu.training.losses import masked_recon_loss, embedding_norm_loss


class ReconBatch(NamedTuple):
    """One normal-recon iteration batch (latent space, host-prepared)."""

    latents: jnp.ndarray  # [B, h, w, 4] VAE-encoded, scaled
    token_ids: jnp.ndarray  # [B, 77]
    slot_maps: Dict[str, jnp.ndarray]  # placeholder -> [B, 77]
    fg_mask: Optional[jnp.ndarray]  # [B, h, w, 1] or None
    timesteps: jnp.ndarray  # [B] host-sampled (annealed upward, ddpm.py:2847)
    noise: jnp.ndarray  # [B, h, w, 4]


def make_recon_train_step(
    clip: CLIPTextEncoder,
    clip_params: dict,
    unet: UNetModel,
    unet_params: dict,
    sched: DiffusionSchedule,
    optimizer: optax.GradientTransformation,
    skip_weights=(0.5, 0.5),
    bg_weight: float = 0.1,
    emb_reg_weight: float = 2e-4,
):
    """Returns a jittable `step(embedders, opt_state, batch)` closing over the
    frozen backbone — the TPU equivalent of a normal-recon `training_step`
    (`ddpm.py:519-576` + `shared_step` recon branch)."""

    def loss_fn(embedders, batch: ReconBatch):
        embedded = clip.apply({"params": clip_params}, batch.token_ids,
                              method=CLIPTextEncoder.embed_tokens)
        subj = {s: compute_static_embedding(p) for s, p in embedders.items()}
        patched = EmbeddingManager.patch_prompt_embeddings(
            embedded, batch.slot_maps, subj)
        L, B, T, D = patched.shape
        ctx = clip.apply({"params": clip_params},
                         input_embeds=patched.reshape(L * B, T, D),
                         skip_weights=jnp.asarray(skip_weights))
        ctx = ctx.reshape(L, B, T, D)
        x_noisy = sched.q_sample(batch.latents, batch.timesteps, batch.noise)
        eps = unet.apply({"params": unet_params}, x_noisy, batch.timesteps, ctx)
        recon = masked_recon_loss(eps, batch.noise, batch.fg_mask, bg_weight=bg_weight)
        reg = sum(embedding_norm_loss(e) for e in subj.values()) / max(len(subj), 1)
        loss = recon + emb_reg_weight * reg
        return loss, {"loss": loss, "recon": recon, "emb_reg": reg}

    def step(embedders, opt_state, batch: ReconBatch):
        (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(embedders, batch)
        updates, opt_state = optimizer.update(grads, opt_state, embedders)
        embedders = optax.apply_updates(embedders, updates)
        return embedders, opt_state, metrics

    return step
