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
import numpy as np
import optax

from adaface_tpu.data.tokenizer import CLIP_VOCAB_SIZE
from adaface_tpu.models.clip_text import CLIPTextEncoder
from adaface_tpu.models.unet import UNetModel
from adaface_tpu.ops.schedule import DiffusionSchedule
from adaface_tpu.personalization.embedding_manager import EmbeddingManager
from adaface_tpu.personalization.static_embedding import compute_static_embedding
from adaface_tpu.training.losses import masked_recon_loss, embedding_norm_loss

BOS_ID, EOS_ID = CLIP_VOCAB_SIZE - 2, CLIP_VOCAB_SIZE - 1


def _prompt_emb_mask(ids: jnp.ndarray) -> jnp.ndarray:
    """[B, T] real-token mask: not BOS, not EOS/padding (the reference's
    `prompt_emb_mask`, `embedding_manager.py:1642`; EOS doubles as the pad
    token, so padding drops out of the delta-loss weights)."""
    return ((ids != BOS_ID) & (ids != EOS_ID)).astype(jnp.float32)


def _iter_skip_weights(batch, skip_weights) -> jnp.ndarray:
    """Per-iteration CLIP clip-skip blend weights: the host-sampled Dirichlet
    draw carried in the batch (`randomize_clip_skip_weights`,
    `modules.py:410-435` + `ddpm.py:973-974`: every training encode
    resamples) or the static configured weights."""
    sw = getattr(batch, "skip_weights", None)
    return jnp.asarray(skip_weights) if sw is None else sw


class ReconBatch(NamedTuple):
    """One normal-recon iteration batch (latent space, host-prepared)."""

    latents: jnp.ndarray  # [B, h, w, 4] VAE-encoded, scaled
    token_ids: jnp.ndarray  # [B, 77]
    slot_maps: Dict[str, jnp.ndarray]  # placeholder -> [B, 77]
    fg_mask: Optional[jnp.ndarray]  # [B, h, w, 1] or None
    timesteps: jnp.ndarray  # [B] host-sampled (annealed upward, ddpm.py:2847)
    noise: jnp.ndarray  # [B, h, w, 4]
    # augmentation valid-area mask at latent res (`img_mask`,
    # `ddpm.py:1681-1685`): masks self-attention keys + the recon loss
    img_mask: Optional[jnp.ndarray] = None  # [B, h, w, 1]
    # per-instance 1/0: instance has a real fg mask (`batch_have_fg_mask`;
    # instances without one run the recon loss on an all-1 fg_mask but are
    # excluded from the complementary battery, `ddpm.py:3478,3533`)
    have_fg_mask: Optional[jnp.ndarray] = None  # [B]
    # annealed embedding noise (host-sampled std, 0 disables; applied
    # in-graph to the subject embeddings, `embedding_manager.py:1528-1538`)
    emb_noise_std: Optional[jnp.ndarray] = None  # scalar
    emb_noise_key: Optional[jnp.ndarray] = None  # PRNG key
    # wds compositing: comp-extra token mask (real tokens that are neither
    # subject nor bg slots; host-built like `ddpm.py:3498-3524`) enabling
    # the fg↔wds complementary battery
    wds_extra_token_mask: Optional[jnp.ndarray] = None  # [B, T]
    # 4-type delta-prompt battery for the always-on static prompt-delta
    # regularizer, which the reference computes on RECON iters too
    # (`do_static_prompt_delta_reg`, `ddpm.py:1954-2057,3230-3240`;
    # BLOCK_SIZE = the full batch on recon iters)
    delta_token_ids: Optional[jnp.ndarray] = None  # [4B, T]
    delta_slot_maps: Optional[Dict[str, jnp.ndarray]] = None
    # per-iteration clip-skip weights ([2], host-sampled Dirichlet when
    # randomize_clip_skip_weights; None = the configured constant)
    skip_weights: Optional[jnp.ndarray] = None


def _recon_prompt_delta(clip, fz, batch, subj, skip_weights):
    """Static prompt-delta regularizer on a recon iteration: encode the
    4-type battery (with the SAME subject embeddings as the recon pass,
    incl. emb noise), distribute the class word over the pad slots, and
    align the ortho-subtracted comp-single deltas (`ddpm.py:2045-2057` +
    `calc_prompt_emb_delta_loss`, `ldm/util.py:2278-2331`)."""
    from adaface_tpu.training.losses import prompt_delta_loss

    embedded = clip.apply({"params": fz["clip"]}, batch.delta_token_ids,
                          method=CLIPTextEncoder.embed_tokens)
    patched = EmbeddingManager.patch_prompt_embeddings(
        embedded, batch.delta_slot_maps, subj)
    L, B4, T, D = patched.shape
    ctx = clip.apply({"params": fz["clip"]},
                     input_embeds=patched.reshape(L * B4, T, D),
                     skip_weights=_iter_skip_weights(batch, skip_weights))
    ctx = ctx.reshape(L, B4, T, D)
    B = B4 // 4
    ss, sc = ctx[:, :B], ctx[:, B:2 * B]
    cs, cc = ctx[:, 2 * B:3 * B], ctx[:, 3 * B:]
    for s in sorted(batch.delta_slot_maps):
        sm1b = batch.delta_slot_maps[s][:B]
        cs = EmbeddingManager.distribute_cls_embeddings(cs, sm1b)
        cc = EmbeddingManager.distribute_cls_embeddings(cc, sm1b)
    return prompt_delta_loss(ss, sc, cs, cc,
                             _prompt_emb_mask(batch.delta_token_ids[:B]),
                             _prompt_emb_mask(batch.delta_token_ids[B:2 * B]))


def _gen_dropout_kwargs(dropout_key, i: int) -> dict:
    """apply() kwargs activating the SubjBasisGenerator's attention
    dropout (p=0.05) during training — the reference trains
    prompt_translator with attn_drop active (`subj_basis_generator.py:
    295,341` + torch train mode); without an explicit rng flax runs it
    deterministic. `i` decorrelates the per-generator streams."""
    if dropout_key is None:
        return {}
    return dict(deterministic=False,
                rngs={"dropout": jax.random.fold_in(dropout_key, i)})


def _slot_union_mask(slot_maps: Dict[str, jnp.ndarray], keys) -> Optional[jnp.ndarray]:
    """Union of placeholder slot maps -> [B, T] float mask (1 = any of the
    given placeholders' K vector slots sits at this position)."""
    masks = [(slot_maps[k] >= 0).astype(jnp.float32) for k in keys]
    if not masks:
        return None
    return jnp.clip(sum(masks), 0.0, 1.0)


def _recon_complem_terms(
    aux: dict,  # layer_idx -> captured activations (needs 'attnscore')
    slot_maps: Dict[str, jnp.ndarray],
    fg_mask: Optional[jnp.ndarray],
    bg_placeholders: frozenset,
    use_bg_token: bool,
    do_zero_shot: bool,
    complem_weight: float,
    xlayer_weight: float,
    wds_extra_token_mask: Optional[jnp.ndarray] = None,
    wds_complem_weight: float = 0.0,
    instance_mask: Optional[jnp.ndarray] = None,  # [B] batch_have_fg_mask
):
    """The recon-iteration complementary-loss battery
    (`calc_recon_and_complem_losses`, `ddpm.py:3457-3565`, + the xlayer
    consistency block `ddpm.py:3241-3266`):

    - with a background token: `calc_fg_bg_complementary_loss`
      (`ddpm.py:4039-4253`) -> (complementary, subj_mb_suppress,
      bg_mf_suppress, mask_contrast), the complementary term scaled 0.2 in
      zero-shot mode;
    - without: only `calc_fg_mb_suppress_loss` (`ddpm.py:3928-4037`)
      (the reference's battery degenerates to it when bg indices are empty);
    - wds-composited instances add the fg↔wds-extra complementary variant
      (`ddpm.py:3498-3552`; weight 0 in the shipped config);
    - `calc_fg_bg_xlayer_consist_loss` (`ddpm.py:4255-4373`) with the
      zero-shot 0.2/0.06 (else 1.0/0.3) fg/bg scales.

    Returns (loss, metrics). Static control flow only — one compiled step
    variant per (use_bg_token, weights) combination.
    """
    from adaface_tpu.training.losses import (
        fg_bg_complementary_loss,
        fg_bg_xlayer_consist_loss,
        fg_mb_suppress_loss,
    )

    scores = {i: aux[i]["attnscore"] for i in aux if "attnscore" in aux[i]}
    subj_keys = sorted(k for k in slot_maps if k not in bg_placeholders)
    bg_keys = sorted(k for k in slot_maps if k in bg_placeholders)
    subj_mask = _slot_union_mask(slot_maps, subj_keys)
    bg_mask = _slot_union_mask(slot_maps, bg_keys) if use_bg_token else None

    loss = jnp.asarray(0.0)
    metrics = {}
    if complem_weight > 0 and fg_mask is not None:
        if bg_mask is not None:
            comple, subj_mb, bg_mf, contrast = fg_bg_complementary_loss(
                scores, subj_mask, bg_mask, fg_mask, fg_grad_scale=0.1,
                instance_mask=instance_mask)
            comple_scale = 0.2 if do_zero_shot else 1.0
            loss = loss + (comple * comple_scale + subj_mb + bg_mf
                           + contrast) * complem_weight
            metrics.update(fg_bg_complem=comple, subj_mb_suppress=subj_mb,
                           bg_mf_suppress=bg_mf, fg_bg_mask_contrast=contrast)
        else:
            subj_mb = fg_mb_suppress_loss(scores, subj_mask, fg_mask,
                                          instance_mask=instance_mask)
            loss = loss + subj_mb * complem_weight
            metrics.update(subj_mb_suppress=subj_mb)
    if (wds_complem_weight > 0 and wds_extra_token_mask is not None
            and fg_mask is not None):
        # fg vs wds-extra tokens complementary (`ddpm.py:3498-3552`); the
        # wds-extra mask plays the bg role. do_sqrt_norm: wds comp-extra
        # prompts are much longer than a bg token set (`ddpm.py:3533-3536`)
        w_comple, w_subj_mb, w_align, w_contrast = fg_bg_complementary_loss(
            scores, subj_mask, wds_extra_token_mask, fg_mask,
            fg_grad_scale=0.1, do_sqrt_norm=True,
            instance_mask=instance_mask)
        loss = loss + (w_comple + w_align + w_subj_mb
                       + w_contrast) * wds_complem_weight
        metrics.update(fg_wds_complem=w_comple, wds_mask_align=w_align)
    if xlayer_weight > 0:
        fg_x, bg_x = fg_bg_xlayer_consist_loss(scores, subj_mask, bg_mask)
        fg_scale = 0.2 if do_zero_shot else 1.0
        bg_scale = 0.06 if do_zero_shot else 0.3
        loss = loss + (fg_x * fg_scale + bg_x * bg_scale) * xlayer_weight
        metrics.update(fg_xlayer_consist=fg_x, bg_xlayer_consist=bg_x)
    return loss, metrics


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
    complem_weight: float = 0.0,
    xlayer_weight: float = 0.0,
    wds_complem_weight: float = 0.0,
    prompt_delta_weight: float = 0.0,
    use_bg_token: bool = False,
    do_zero_shot: bool = True,
    bg_placeholders: frozenset = frozenset(),
):
    """Returns a jittable `step(embedders, opt_state, batch)` closing over the
    frozen backbone — the TPU equivalent of a normal-recon `training_step`
    (`ddpm.py:519-576` + `shared_step` recon branch). With
    `complem_weight`/`xlayer_weight` > 0 the UNet runs with activation
    capture and the complementary-loss battery of
    `calc_recon_and_complem_losses` (`ddpm.py:3457-3565`) applies."""
    do_capture = complem_weight > 0 or xlayer_weight > 0 or wds_complem_weight > 0

    def loss_fn(embedders, batch: ReconBatch, fz):
        from adaface_tpu.ops.grad import add_noise_to_tensor

        embedded = clip.apply({"params": fz["clip"]}, batch.token_ids,
                              method=CLIPTextEncoder.embed_tokens)
        subj = {s: compute_static_embedding(p) for s, p in embedders.items()}
        if batch.emb_noise_std is not None and batch.emb_noise_key is not None:
            subj = {s: add_noise_to_tensor(
                jax.random.fold_in(batch.emb_noise_key, i), e,
                batch.emb_noise_std, noise_std_is_relative=True)
                for i, (s, e) in enumerate(sorted(subj.items()))}
        patched = EmbeddingManager.patch_prompt_embeddings(
            embedded, batch.slot_maps, subj)
        L, B, T, D = patched.shape
        ctx = clip.apply({"params": fz["clip"]},
                         input_embeds=patched.reshape(L * B, T, D),
                         skip_weights=_iter_skip_weights(batch, skip_weights))
        ctx = ctx.reshape(L, B, T, D)
        x_noisy = sched.q_sample(batch.latents, batch.timesteps, batch.noise)
        if do_capture:
            # the recon battery reads ONLY attnscore; capturing q/attn/k/v/
            # outfeat too would retain ~4x the activation memory through
            # the backward pass for nothing
            eps, aux = unet.apply({"params": fz["unet"]}, x_noisy,
                                  batch.timesteps, ctx, capture=True,
                                  img_mask=batch.img_mask,
                                  capture_keys=("attnscore",))
        else:
            eps, aux = unet.apply({"params": fz["unet"]}, x_noisy,
                                  batch.timesteps, ctx,
                                  img_mask=batch.img_mask), None
        recon = masked_recon_loss(eps, batch.noise, batch.fg_mask,
                                  bg_weight=bg_weight,
                                  img_mask=batch.img_mask)
        reg = sum(embedding_norm_loss(e) for e in subj.values()) / max(len(subj), 1)
        loss = recon + emb_reg_weight * reg
        metrics = {"recon": recon, "emb_reg": reg}
        if prompt_delta_weight > 0 and batch.delta_token_ids is not None:
            loss_delta = _recon_prompt_delta(clip, fz, batch, subj,
                                             skip_weights)
            loss = loss + prompt_delta_weight * loss_delta
            metrics["prompt_delta"] = loss_delta
        if do_capture:
            complem, cm = _recon_complem_terms(
                aux, batch.slot_maps, batch.fg_mask, bg_placeholders,
                use_bg_token, do_zero_shot, complem_weight, xlayer_weight,
                batch.wds_extra_token_mask, wds_complem_weight,
                instance_mask=batch.have_fg_mask)
            loss = loss + complem
            metrics.update(cm)
        metrics["loss"] = loss
        return loss, metrics

    def step(embedders, opt_state, batch: ReconBatch, frozen=None):
        fz = frozen if frozen is not None else {"clip": clip_params, "unet": unet_params}
        (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            embedders, batch, fz)
        updates, opt_state = optimizer.update(grads, opt_state, embedders)
        embedders = optax.apply_updates(embedders, updates)
        return embedders, opt_state, metrics

    # loss-only entry for the validation pass (`DDPM.validation_step` runs
    # `shared_step` under no_grad, `ddpm.py:645-651`); jit this instead of
    # `step` to get val metrics without a backward/optimizer program
    step.loss_fn = loss_fn
    return step


class ComposBatch(NamedTuple):
    """One compositional-distillation iteration (`ddpm.py:1971-2141`,
    4-type prompt batch with BLOCK_SIZE instances per type, order
    [subj_single, subj_comp, cls_single, cls_comp])."""

    token_ids: jnp.ndarray  # [4B, T]
    slot_maps: Dict[str, jnp.ndarray]  # placeholder -> [4B, T] (-1 on cls rows)
    subj_slot_map: jnp.ndarray  # [4B, T] the FG SUBJECT's slot map (NOT taken
    # from slot_maps: jit re-orders dict pytrees by sorted key, so positional
    # 'first placeholder' lookups silently pick the background under jit)
    latents: jnp.ndarray  # [B, h, w, 4] x_start (fg-init or noise)
    fg_mask: Optional[jnp.ndarray]  # [B, h, w, 1]
    timesteps: jnp.ndarray  # [B] top-20% range (iter_plan.sample_timesteps)
    noise: jnp.ndarray  # [B, h, w, 4]
    t_frac: jnp.ndarray  # [B] = t / num_timesteps
    training_percent: jnp.ndarray  # scalar
    # compel CFG weighting of the mixed contexts (`openaimodel.py:898-916`);
    # level 0 is an exact no-op so one compiled step covers on/off iters
    compel_level: float = 0.0  # scalar (python float traces as weak f32[])
    compel_batch_mask: Optional[jnp.ndarray] = None  # [4B] 1 = apply
    # annealed embedding noise for compos iters (p=0.4,
    # `anneal_add_noise_to_embedding` via `embedding_manager.py:1528-1538`)
    emb_noise_std: Optional[jnp.ndarray] = None  # scalar
    emb_noise_key: Optional[jnp.ndarray] = None  # PRNG key
    # [k_lb, k_ub, v_lb, v_ub] class-mix scale ranges — depend on
    # do_zero_shot x comp_init_fg_from_training_image (`ddpm.py:2577-2597`);
    # None keeps the mixing defaults
    cls_mix_ranges: Optional[jnp.ndarray] = None
    # per-iteration clip-skip weights ([2], host-sampled Dirichlet when
    # randomize_clip_skip_weights; None = the configured constant)
    skip_weights: Optional[jnp.ndarray] = None
    # scalar scale of the elastic-matching preserve battery
    # (`ddpm.py:3284-3363`): 0 unless comp_init_fg_from_training_image;
    # 0.5 fresh, 0.25 on reuse-init iters. None = the 0.5 default.
    preserve_loss_scale: Optional[jnp.ndarray] = None


def make_compos_distill_step(
    clip: CLIPTextEncoder,
    clip_params: dict,
    unet: UNetModel,
    unet_params: dict,
    sched: DiffusionSchedule,
    optimizer: optax.GradientTransformation,
    skip_weights=(0.5, 0.5),
    prompt_delta_weight: float = 2e-4,
    mix_prompt_distill_weight: float = 1e-4,
    fg_bg_weight: float = 1.0,
    comp_fg_bg_preserve_weight: float = 1e-3,
    xlayer_weight: float = 5e-5,
    do_zero_shot: bool = True,
    bg_placeholders: frozenset = frozenset(),
    padding_embs_align_weight: float = 0.0,
    subj_comp_ortho_weight: float = 0.0,
):
    """Compositional (mix-prompt) distillation step (`p_losses` compos
    branch, `ddpm.py:2545-3453` + `calc_prompt_mix_loss:3710`):

    - the 4-type prompt batch is encoded once; the class halves are mixed
      into V/K teacher contexts (`mix_static_vk_embeddings`);
    - one UNet forward over the 4-type batch with activation capture;
    - losses: static prompt-delta, feat/attn delta alignment of
      (subj_single -> subj_comp) onto (mix_single -> mix_comp), attention
      norm distillation, and subject-attention bg suppression.

    CLIP teacher filtering (`ddpm.py:3039-3131`) is a host-side loop around
    this step (re-running with the winning candidate); this step itself is
    the filter-free grad pass.
    """
    core = _make_compos_loss_core(
        clip, unet, sched, skip_weights, prompt_delta_weight,
        mix_prompt_distill_weight,
        fg_bg_weight, comp_fg_bg_preserve_weight, xlayer_weight,
        do_zero_shot, bg_placeholders,
        padding_embs_align_weight=padding_embs_align_weight,
        subj_comp_ortho_weight=subj_comp_ortho_weight)

    def loss_fn(embedders, batch: ComposBatch, fz):
        from adaface_tpu.ops.grad import add_noise_to_tensor

        embedded = clip.apply({"params": fz["clip"]}, batch.token_ids,
                              method=CLIPTextEncoder.embed_tokens)
        subj = {s: compute_static_embedding(p) for s, p in embedders.items()}
        if batch.emb_noise_std is not None and batch.emb_noise_key is not None:
            subj = {s: add_noise_to_tensor(
                jax.random.fold_in(batch.emb_noise_key, i), e,
                batch.emb_noise_std, noise_std_is_relative=True)
                for i, (s, e) in enumerate(sorted(subj.items()))}
        patched = EmbeddingManager.patch_prompt_embeddings(
            embedded, batch.slot_maps, subj)
        return core(patched, batch, fz)

    def step(embedders, opt_state, batch: ComposBatch, frozen=None):
        fz = frozen if frozen is not None else {"clip": clip_params, "unet": unet_params}
        (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            embedders, batch, fz)
        updates, opt_state = optimizer.update(grads, opt_state, embedders)
        embedders = optax.apply_updates(embedders, updates)
        return embedders, opt_state, metrics

    return step


def _make_compos_loss_core(clip, unet, sched, skip_weights,
                           prompt_delta_weight, mix_prompt_distill_weight,
                           fg_bg_weight, comp_fg_bg_preserve_weight,
                           xlayer_weight=5e-5, do_zero_shot=True,
                           bg_placeholders: frozenset = frozenset(),
                           padding_embs_align_weight: float = 0.0,
                           subj_comp_ortho_weight: float = 0.0):
    """Shared compositional-distillation loss over an already-patched
    4-type prompt-embedding batch: second-half CLIP encode, V/K mixing,
    captured UNet forward, the distillation loss battery. Used by both the
    static-embedder and the zero-shot (generator-trained) compos steps.

    `padding_embs_align_weight` / `subj_comp_ortho_weight` wire the two
    regularizers the reference defines but ships DISABLED
    (`calc_padding_embs_align_loss`, `ddpm.py:4634-4779`;
    `calc_subj_comp_ortho_loss`, `ddpm.py:4551-4629`) — off by default
    here too; >0 computes them (the ortho loss additionally captures the
    CA k/v slabs it consumes)."""
    from adaface_tpu.models.unet import DISTILL_LAYER_INDICES
    from adaface_tpu.training.losses import (
        ATTN_ALIGN_LAYER_WEIGHTS,
        _normalize_weights,
        comp_extra_token_mask,
        comp_fg_bg_preserve_loss,
        dyn_loss_scale,
        fg_bg_xlayer_consist_loss,
        fg_mb_suppress_loss,
        normalized_sum,
        padding_embs_align_loss,
        prompt_delta_loss,
        prompt_mix_layer_losses,
        subj_comp_ortho_loss,
    )
    from adaface_tpu.training.mixing import mix_static_vk_embeddings

    def core(patched, batch, fz):
        L, B4, T, D = patched.shape
        ctx = clip.apply({"params": fz["clip"]},
                         input_embeds=patched.reshape(L * B4, T, D),
                         skip_weights=_iter_skip_weights(batch, skip_weights))
        ctx = ctx.reshape(L, B4, T, D)
        B = B4 // 4
        subj_single, subj_comp, cls_single, cls_comp = (
            ctx[:, :B], ctx[:, B:2 * B], ctx[:, 2 * B:3 * B], ctx[:, 3 * B:])
        # distribute the class word over the multi-vector pad slots in the
        # cls halves (`distribute_embedding_to_M_tokens_by_dict`,
        # `ddpm.py:2039-2046`; slot maps from the subj_single block — the
        # 4 prompt types are prefix-aligned)
        for s in sorted(batch.slot_maps):
            sm1b = batch.slot_maps[s][:B]
            cls_single = EmbeddingManager.distribute_cls_embeddings(
                cls_single, sm1b)
            cls_comp = EmbeddingManager.distribute_cls_embeddings(
                cls_comp, sm1b)

        # always-on static delta regularizer (`ldm/util.py:2278-2331`);
        # masks exclude BOS and EOS/padding (`embedding_manager.py:1642` —
        # `ids > 0` would weight the eos-padded tail fully)
        first = batch.subj_slot_map
        single_mask = _prompt_emb_mask(batch.token_ids[:B])
        comp_mask = _prompt_emb_mask(batch.token_ids[B:2 * B])
        loss_delta = prompt_delta_loss(subj_single, subj_comp, cls_single,
                                       cls_comp, single_mask, comp_mask)

        subj_tok_single = (first[:B] >= 0).astype(jnp.float32)
        subj_tok_comp = (first[B:2 * B] >= 0).astype(jnp.float32)
        mix_kw = {}
        if batch.cls_mix_ranges is not None:
            r = batch.cls_mix_ranges
            mix_kw = dict(k_cls_scale_range=(r[0], r[1]),
                          v_cls_scale_range=(r[2], r[3]))
        s_vk_single, m_vk_single = mix_static_vk_embeddings(
            subj_single, cls_single, subj_tok_single,
            batch.training_percent, batch.t_frac, **mix_kw)
        s_vk_comp, m_vk_comp = mix_static_vk_embeddings(
            subj_comp, cls_comp, subj_tok_comp,
            batch.training_percent, batch.t_frac, **mix_kw)

        # (subj_single, subj_comp, mix_single, mix_comp) UNet batch
        ctx_vk = jnp.concatenate(
            [s_vk_single, s_vk_comp, m_vk_single, m_vk_comp], axis=1)
        ctx_v, ctx_k = ctx_vk[:, :, :T], ctx_vk[:, :, T:]
        if "empty_ctx" in fz:
            # compel CFG weighting of the V and K contexts separately
            # (`openaimodel.py:896-916`: the (v, k) tuple is transformed
            # elementwise); level 0 (the non-applied iters) is exact identity
            from adaface_tpu.ops.compel import apply_compel_cfg

            empty = fz["empty_ctx"].astype(ctx_v.dtype)
            ctx_v = apply_compel_cfg(ctx_v, empty, batch.compel_level,
                                     batch_mask=batch.compel_batch_mask)
            ctx_k = apply_compel_cfg(ctx_k, empty, batch.compel_level,
                                     batch_mask=batch.compel_batch_mask)
        x4 = jnp.tile(batch.latents, (4, 1, 1, 1))
        t4 = jnp.tile(batch.timesteps, (4,))
        n4 = jnp.tile(batch.noise, (4, 1, 1, 1))
        x_noisy = sched.q_sample(x4, t4, n4)
        # `q` is required by the elastic-matching preserve battery below
        # (`ddpm.py:3301-3305` captures it; `calc_comp_fg_bg_preserve_loss`
        # consumes it) — all 12 distill layers carry ATTN_ALIGN weights.
        # The k/v slabs are only retained when the (off-by-default)
        # subject/comp ortho regularizer actually consumes them.
        cap_keys = ("outfeat", "attnscore", "q")
        if subj_comp_ortho_weight > 0:
            cap_keys = cap_keys + ("k", "v")
        eps, aux = unet.apply({"params": fz["unet"]}, x_noisy, t4,
                              ctx_v, context_k=ctx_k, capture=True,
                              capture_keys=cap_keys)

        # feat/attn delta alignment (`calc_prompt_mix_loss`, `ddpm.py:3710`):
        # per-layer spatial-reweighted pooled feat deltas + per-head attn
        # deltas + attn norm distillation, ATTN_ALIGN layer weights
        layer_w = _normalize_weights(ATTN_ALIGN_LAYER_WEIGHTS)
        l_feat, l_attn, l_attn_norm = [], [], []
        # All four rows share the subject rows' token layout: the mix rows'
        # contexts carry (mixed) subject embeddings at the SAME slot
        # positions (prompts are token-aligned, `ddpm.py:1971-2141`).
        subj_mask4 = jnp.concatenate(
            [subj_tok_single, subj_tok_comp, subj_tok_single, subj_tok_comp],
            axis=0)
        for idx in DISTILL_LAYER_INDICES:
            if idx not in aux or idx not in layer_w:
                continue
            feat = aux[idx]["outfeat"]  # [4B, H, W, C]
            score = aux[idx]["attnscore"]  # [4B, h, Q, T]
            subj_attn = jnp.einsum("bhqt,bt->bhq", score.astype(jnp.float32),
                                   subj_mask4)
            fd, ad, an = prompt_mix_layer_losses(feat, subj_attn)
            l_feat.append(layer_w[idx] * fd)
            l_attn.append(layer_w[idx] * ad)
            l_attn_norm.append(layer_w[idx] * an)
        loss_feat = normalized_sum(l_feat)
        loss_attn = normalized_sum(l_attn)
        loss_attn_norm = normalized_sum(l_attn_norm)

        # cross-layer attention consistency over the subject sub-batch
        # (rows ss, sc; SSB_SIZE=2·BLOCK_SIZE on compos iters,
        # `ddpm.py:3242-3266`)
        loss_xlayer = 0.0
        if xlayer_weight > 0:
            subj_scores = {i: aux[i]["attnscore"][:2 * B]
                           for i in aux if "attnscore" in aux[i]}
            subj_mask2 = jnp.concatenate([subj_tok_single, subj_tok_comp],
                                         axis=0)
            bg_keys = sorted(k for k in batch.slot_maps if k in bg_placeholders)
            bg_mask2 = _slot_union_mask(
                {k: batch.slot_maps[k][:2 * B] for k in bg_keys}, bg_keys)
            fg_x, bg_x = fg_bg_xlayer_consist_loss(subj_scores, subj_mask2,
                                                   bg_mask2)
            fg_scale = 0.2 if do_zero_shot else 1.0
            bg_scale = 0.06 if do_zero_shot else 0.3
            if bg_mask2 is not None:
                # zero out the bg branch when this iteration's prompts carry
                # no background token (its slots are all -1 -> empty mask)
                bg_x = bg_x * jnp.clip(jnp.sum(bg_mask2), 0.0, 1.0)
            loss_xlayer = fg_x * fg_scale + bg_x * bg_scale

        loss_fg_bg = 0.0
        loss_preserve = 0.0
        if batch.fg_mask is not None:
            scores_first = {idx: aux[idx]["attnscore"][:B]
                            for idx in aux if "attnscore" in aux[idx]}
            loss_fg_bg = fg_mb_suppress_loss(
                scores_first, subj_tok_single, batch.fg_mask)
            # elastic-matching fg/bg preservation over the 4-type batch
            # (`calc_comp_fg_bg_preserve_loss`, `ddpm.py:4385-4549`) — used
            # when x_start was fg-initialized from the training image
            outfeats = {i: aux[i]["outfeat"] for i in aux if "outfeat" in aux[i]}
            qs = {i: aux[i]["q"] for i in aux if "q" in aux[i]}
            scores4 = {i: aux[i]["attnscore"] for i in aux if "attnscore" in aux[i]}
            p_map, p_fg, p_bg, p_subj_sup, p_mix_sup = comp_fg_bg_preserve_loss(
                outfeats, qs, scores4, batch.fg_mask, subj_mask4)
            # combination scales (`ddpm.py:3322-3345`): map_align x1,
            # sc_mc_bg_match gets a dynamic scale (base 0.2 -> x2, capped
            # x3), both attention suppressions x0.02
            sc_mc_scale = dyn_loss_scale(p_bg, 0.2, 2.0, 1.0, 3.0)
            loss_preserve = (p_map + p_fg + p_bg * sc_mc_scale
                             + (p_subj_sup + p_mix_sup) * 0.02)

        # --- off-by-default regularizers the reference defines but ships
        # disabled; wired behind explicit weights for parity/testing
        loss_pad_align = 0.0
        if padding_embs_align_weight > 0:
            # padding/bg embeddings pushed off the subject embedding on the
            # subj-single + subj-comp halves (`ddpm.py:4634-4779`)
            emb_mask2 = jnp.concatenate([single_mask, comp_mask], axis=0)
            subj_tok2 = jnp.concatenate([subj_tok_single, subj_tok_comp],
                                        axis=0)
            bg_keys = sorted(k for k in batch.slot_maps
                             if k in bg_placeholders)
            bg2 = _slot_union_mask(
                {k: batch.slot_maps[k][:2 * B] for k in bg_keys}, bg_keys)
            lp, lb = padding_embs_align_loss(ctx[:, :2 * B], emb_mask2,
                                             subj_tok2, bg2)
            loss_pad_align = lp + lb
        loss_ortho_k, loss_ortho_v = 0.0, 0.0
        if subj_comp_ortho_weight > 0:
            # instance 0 of each prompt type (the reference's BLOCK_SIZE=1
            # layout, `ddpm.py:4551-4629`); comp-extra tokens = real tokens
            # that are neither subject nor background slots
            sel = np.asarray([0, B, 2 * B, 3 * B])
            ks4 = {i: aux[i]["k"][sel] for i in aux if "k" in aux[i]}
            vs4 = {i: aux[i]["v"][sel] for i in aux if "v" in aux[i]}
            sc4 = {i: aux[i]["attnscore"][sel]
                   for i in aux if "attnscore" in aux[i]}
            sc_extra = comp_extra_token_mask(comp_mask[0], subj_tok_comp[0])
            # class rows carry the class embedding at the SUBJECT's (prefix-
            # aligned) slot positions after distribution
            cc_mask = _prompt_emb_mask(batch.token_ids[3 * B:3 * B + 1])[0]
            cc_extra = comp_extra_token_mask(cc_mask, subj_tok_comp[0])
            loss_ortho_k, loss_ortho_v = subj_comp_ortho_loss(
                ks4, vs4, sc4,
                subj_comp_subj_mask=subj_tok_comp[0],
                subj_comp_extra_mask=sc_extra,
                cls_comp_subj_mask=subj_tok_comp[0],
                cls_comp_extra_mask=cc_extra)

        # `ddpm.py:3404-3436`: attn delta x0.1; attn norm x1 zero-shot /
        # dynamic (base 5 -> x0.2) otherwise; feat delta x0.5 zero-shot / x2
        attn_delta_scale = 0.1
        attn_norm_scale = (1.0 if do_zero_shot
                           else dyn_loss_scale(loss_attn_norm, 5.0, 0.2))
        feat_delta_scale = 0.5 if do_zero_shot else 2.0
        loss_mix_distill = (loss_attn * attn_delta_scale
                            + loss_attn_norm * attn_norm_scale
                            + loss_feat * feat_delta_scale)
        # 0.5 base preserve scale, 0.25 on reuse-init iters, 0 when x_start
        # was not fg-initialized (`ddpm.py:3284,3356-3363`)
        preserve_scale = (batch.preserve_loss_scale
                          if batch.preserve_loss_scale is not None else 0.5)
        # preserve supersedes mix distill: halve the latter when the
        # elastic battery is ACTIVE (`ddpm.py:3434-3441`) — active means it
        # contributes to the loss, i.e. scale * value > 0 (the raw value is
        # computed whenever fg_mask rides along, unlike the reference which
        # only computes it on fg-init iters)
        mix_scale = (jnp.where(
            jax.lax.stop_gradient(preserve_scale * loss_preserve) > 0,
            0.5, 1.0) if batch.fg_mask is not None else 1.0)

        loss = (prompt_delta_weight * loss_delta
                + mix_prompt_distill_weight * mix_scale * loss_mix_distill
                + fg_bg_weight * loss_fg_bg
                + comp_fg_bg_preserve_weight * preserve_scale * loss_preserve
                + xlayer_weight * loss_xlayer
                + padding_embs_align_weight * loss_pad_align
                + subj_comp_ortho_weight * (loss_ortho_k + loss_ortho_v))
        metrics = {"loss": loss, "prompt_delta": loss_delta,
                   "feat_align": loss_feat, "attn_align": loss_attn,
                   "attn_norm_distill": loss_attn_norm,
                   "mix_prompt_distill": loss_mix_distill,
                   "fg_bg": loss_fg_bg, "comp_fg_bg_preserve": loss_preserve,
                   "xlayer_consist": loss_xlayer}
        if padding_embs_align_weight > 0:
            metrics["padding_embs_align"] = loss_pad_align
        if subj_comp_ortho_weight > 0:
            metrics["subj_comp_ortho_k"] = loss_ortho_k
            metrics["subj_comp_ortho_v"] = loss_ortho_v
        return loss, metrics

    return core


class Arc2FaceBatch(NamedTuple):
    """One arc2face-distillation iteration (`ddpm.py:2950-3035`)."""

    latents: jnp.ndarray  # [B, h, w, 4] x_start (or noise for rand faces)
    teacher_context: jnp.ndarray  # [B, T_a, D] arc2face prompt embeddings
    token_ids: jnp.ndarray  # [B, T] student subject prompt
    slot_maps: Dict[str, jnp.ndarray]
    timesteps: jnp.ndarray  # [B] first-step t
    noises: jnp.ndarray  # [S, B, h, w, 4] per-step noise
    relative_ts: jnp.ndarray  # [S-1, B] uniforms for earlier-t sampling
    fg_mask: Optional[jnp.ndarray]
    # aug valid-area mask at latent res (None for random faces,
    # `ddpm.py:1799-1800`)
    img_mask: Optional[jnp.ndarray] = None  # [B, h, w, 1]
    # per-iteration clip-skip weights ([2], host-sampled Dirichlet when
    # randomize_clip_skip_weights; None = the configured constant)
    skip_weights: Optional[jnp.ndarray] = None


def make_arc2face_distill_step(
    clip: CLIPTextEncoder,
    clip_params: dict,
    unet: UNetModel,
    unet_params: dict,
    teacher_unet: UNetModel,
    teacher_params: dict,
    sched: DiffusionSchedule,
    optimizer: optax.GradientTransformation,
    num_denoising_steps: int = 1,
    skip_weights=(0.5, 0.5),
    max_accumu_batch: int = 7,
    use_fg_mask: bool = True,  # static; False for generated random faces
):
    """Arc2Face multi-step distillation (`Arc2FaceWrapper.forward`,
    `ddpm.py:5429-5475` + the student loop `:2950-3035`): the frozen
    arc2face teacher denoises a trajectory of `num_denoising_steps`
    (earlier-t schedule from uniform draws); the student (SD UNet with the
    subject conditioning from the trainable embedders) matches the
    teacher's noise predictions at the trailing steps, loss summed and
    divided by sqrt(S). One compiled variant per S (static unroll)."""

    def loss_fn(embedders, batch: Arc2FaceBatch, fz):
        S = num_denoising_steps
        B = batch.latents.shape[0]
        # ---- teacher trajectory (frozen, fp32 master here vs fp16 there)
        x_starts = [batch.latents]
        ts = [batch.timesteps]
        noise_preds = []
        for i in range(S):
            x_noisy = sched.q_sample(x_starts[i], ts[i], batch.noises[i])
            pred = teacher_unet.apply({"params": fz["teacher"]}, x_noisy,
                                      ts[i], batch.teacher_context[None])
            pred = jax.lax.stop_gradient(pred)
            noise_preds.append(pred)
            x0 = sched.predict_x0_from_eps(x_noisy, ts[i], pred)
            x_starts.append(jax.lax.stop_gradient(x0))
            if i < S - 1:
                # earlier t in [t*0.5^k, t*0.7^k], k=(S-1)^-0.3 (`:5460-5466`)
                k = (S - 1) ** -0.3
                t_lb = ts[i] * (0.5 ** k)
                t_ub = ts[i] * (0.7 ** k)
                t_next = ((t_ub - t_lb) * batch.relative_ts[i] + t_lb)
                ts.append(t_next.astype(jnp.int32))

        # ---- student matches trailing steps (`:2956-2994`)
        max_loss_steps = max(max_accumu_batch // B, 1)
        loss_start = max(0, S - max_loss_steps)

        embedded = clip.apply({"params": fz["clip"]}, batch.token_ids,
                              method=CLIPTextEncoder.embed_tokens)
        subj = {s: compute_static_embedding(p) for s, p in embedders.items()}
        patched = EmbeddingManager.patch_prompt_embeddings(
            embedded, batch.slot_maps, subj)
        L, _, T, D = patched.shape
        ctx = clip.apply({"params": fz["clip"]},
                         input_embeds=patched.reshape(L * B, T, D),
                         skip_weights=_iter_skip_weights(batch, skip_weights))
        ctx = ctx.reshape(L, B, T, D)

        losses = []
        for s in range(loss_start, S):
            x0_s = batch.latents if s == 0 else x_starts[s]
            x_noisy = sched.q_sample(x0_s, ts[s], batch.noises[s])
            student = unet.apply({"params": fz["unet"]}, x_noisy, ts[s], ctx,
                                 img_mask=batch.img_mask)
            if use_fg_mask and batch.fg_mask is not None:
                # distill only on fg (bg suppressed by the teacher,
                # bg_pixel_weight=0, `:3017-3024`)
                l = masked_recon_loss(student, noise_preds[s], batch.fg_mask,
                                      bg_weight=0.0,
                                      img_mask=batch.img_mask)
            else:
                l = jnp.mean(jnp.square(student - noise_preds[s]))
            losses.append(l)
        loss = sum(losses) / jnp.sqrt(float(S))
        return loss, {"loss": loss, "n_loss_steps": float(len(losses))}

    def step(embedders, opt_state, batch: Arc2FaceBatch, frozen=None):
        fz = frozen if frozen is not None else {"clip": clip_params, "unet": unet_params, "teacher": teacher_params}
        (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            embedders, batch, fz)
        updates, opt_state = optimizer.update(grads, opt_state, embedders)
        embedders = optax.apply_updates(embedders, updates)
        return embedders, opt_state, metrics

    return step


class ZeroShotArc2FaceBatch(NamedTuple):
    """Zero-shot arc2face distillation: same trajectory machinery as
    `Arc2FaceBatch` but the student context comes from the
    SubjBasisGenerators (trainables), and the teacher context is computed
    in-graph from the SAME identity embeddings through the frozen Arc2Face
    encoder (`ddpm.py:1786-1798` + `:2950-3035` in zero-shot mode)."""

    latents: jnp.ndarray  # [B, h, w, 4] x_start (noise for rand faces)
    token_ids: jnp.ndarray  # [B, T] student subject prompt
    slot_maps: Dict[str, jnp.ndarray]
    timesteps: jnp.ndarray  # [B]
    noises: jnp.ndarray  # [S, B, h, w, 4]
    relative_ts: jnp.ndarray  # [S-1, B]
    fg_mask: Optional[jnp.ndarray]
    clip_fg: jnp.ndarray  # [B, N_tok, D_img]
    clip_bg: jnp.ndarray
    id_embs: jnp.ndarray  # [B, 512]
    # aug valid-area mask at latent res (None for random faces)
    img_mask: Optional[jnp.ndarray] = None  # [B, h, w, 1]
    dropout_key: Optional[jnp.ndarray] = None  # generator attn dropout
    # per-iteration clip-skip weights ([2], host-sampled Dirichlet when
    # randomize_clip_skip_weights; None = the configured constant)
    skip_weights: Optional[jnp.ndarray] = None


def make_zero_shot_arc2face_step(
    clip: CLIPTextEncoder,
    clip_params: dict,
    unet: UNetModel,
    unet_params: dict,
    teacher_unet: UNetModel,
    teacher_params: dict,
    sched: DiffusionSchedule,
    optimizer: optax.GradientTransformation,
    generators: dict,
    bg_placeholders: frozenset,
    arc2face_encoder,
    arc2face_params: dict,
    forward_template_ids: jnp.ndarray,
    inverse_template_ids: jnp.ndarray,
    arcface_token_id: int,
    num_denoising_steps: int = 1,
    skip_weights=(0.5, 0.5),
    max_accumu_batch: int = 7,
    use_fg_mask: bool = True,
    out_id_embs_scale: float = 1.0,
):
    """Arc2face distillation with the SubjBasisGenerators as trainables —
    the zero-shot mode's teacher iterations. The identity embedding feeds
    BOTH sides: the frozen Arc2Face forward pass is the teacher's prompt
    context AND the generator's input; gradients flow only through the
    generator branch."""
    from adaface_tpu.personalization.arc2face import forward_face_embs_fn

    def loss_fn(gen_params, batch: ZeroShotArc2FaceBatch, fz):
        S = num_denoising_steps
        B = batch.latents.shape[0]
        embed_fn = lambda ids: arc2face_encoder.apply(
            {"params": fz["arc"]}, ids, method="embed_tokens")
        encode_fn = lambda e, w, n: arc2face_encoder.apply(
            {"params": fz["arc"]}, input_embeds=e, skip_weights=w,
            num_skip_layers=n)
        full, arc_id_embs = forward_face_embs_fn(
            embed_fn, encode_fn, jax.lax.stop_gradient(batch.id_embs),
            forward_template_ids, arcface_token_id,
            arc2face_encoder.cfg.hidden_size)
        teacher_context = jax.lax.stop_gradient(full)  # [B, 77, D]

        # ---- teacher trajectory (identical to the static step)
        x_starts = [batch.latents]
        ts = [batch.timesteps]
        noise_preds = []
        for i in range(S):
            x_noisy = sched.q_sample(x_starts[i], ts[i], batch.noises[i])
            pred = teacher_unet.apply({"params": fz["teacher"]}, x_noisy,
                                      ts[i], teacher_context[None])
            pred = jax.lax.stop_gradient(pred)
            noise_preds.append(pred)
            x0 = sched.predict_x0_from_eps(x_noisy, ts[i], pred)
            x_starts.append(jax.lax.stop_gradient(x0))
            if i < S - 1:
                k = (S - 1) ** -0.3
                t_lb = ts[i] * (0.5 ** k)
                t_ub = ts[i] * (0.7 ** k)
                t_next = ((t_ub - t_lb) * batch.relative_ts[i] + t_lb)
                ts.append(t_next.astype(jnp.int32))

        # ---- student context from the generators
        subj = {}
        for i, (s, gen) in enumerate(sorted(generators.items())):
            feats = batch.clip_bg if s in bg_placeholders else batch.clip_fg
            embs, _ = gen.apply(
                {"params": gen_params[s]}, feats, None, arc_id_embs,
                out_id_embs_scale=out_id_embs_scale, is_face=True,
                is_training=True, inverse_template_ids=inverse_template_ids,
                **_gen_dropout_kwargs(batch.dropout_key, i))
            subj[s] = jnp.transpose(embs, (1, 0, 2, 3))
        embedded = clip.apply({"params": fz["clip"]}, batch.token_ids,
                              method=CLIPTextEncoder.embed_tokens)
        patched = EmbeddingManager.patch_prompt_embeddings(
            embedded, batch.slot_maps, subj)
        L, _, T, D = patched.shape
        ctx = clip.apply({"params": fz["clip"]},
                         input_embeds=patched.reshape(L * B, T, D),
                         skip_weights=_iter_skip_weights(batch, skip_weights))
        ctx = ctx.reshape(L, B, T, D)

        max_loss_steps = max(max_accumu_batch // B, 1)
        loss_start = max(0, S - max_loss_steps)
        losses = []
        for s in range(loss_start, S):
            x0_s = batch.latents if s == 0 else x_starts[s]
            x_noisy = sched.q_sample(x0_s, ts[s], batch.noises[s])
            student = unet.apply({"params": fz["unet"]}, x_noisy, ts[s], ctx,
                                 img_mask=batch.img_mask)
            if use_fg_mask and batch.fg_mask is not None:
                l = masked_recon_loss(student, noise_preds[s], batch.fg_mask,
                                      bg_weight=0.0,
                                      img_mask=batch.img_mask)
            else:
                l = jnp.mean(jnp.square(student - noise_preds[s]))
            losses.append(l)
        loss = sum(losses) / jnp.sqrt(float(S))
        return loss, {"loss": loss, "n_loss_steps": float(len(losses))}

    def step(gen_params, opt_state, batch: ZeroShotArc2FaceBatch, frozen=None):
        fz = frozen if frozen is not None else {
            "clip": clip_params, "unet": unet_params,
            "teacher": teacher_params, "arc": arc2face_params}
        (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            gen_params, batch, fz)
        updates, opt_state = optimizer.update(grads, opt_state, gen_params)
        gen_params = optax.apply_updates(gen_params, updates)
        return gen_params, opt_state, metrics

    return step


class DreamBoothBatch(NamedTuple):
    """(subject batch, class-regularization batch) pair — the reference's
    ConcatDataset tuple (`main_db.py:245-307`)."""

    train: ReconBatch
    reg: ReconBatch
    # per-iteration clip-skip randomization rides in the inner ReconBatches'
    # skip_weights fields (one draw shared by both halves)


def make_dreambooth_train_step(
    clip: CLIPTextEncoder,
    clip_params: dict,
    unet: UNetModel,
    unet_params: dict,
    sched: DiffusionSchedule,
    optimizer: optax.GradientTransformation,
    skip_weights=(0.5, 0.5),
    db_reg_weight: float = 1.0,
):
    """DreamBooth objective: subject recon + weighted prior-preservation
    recon on class images (`ddpm.py:578-585,783-804`; trained by
    `main_db.py`). Same trainable-embedder contract as the other steps."""

    def one_loss(embedders, batch: ReconBatch, fz):
        embedded = clip.apply({"params": fz["clip"]}, batch.token_ids,
                              method=CLIPTextEncoder.embed_tokens)
        subj = {s: compute_static_embedding(p) for s, p in embedders.items()}
        patched = EmbeddingManager.patch_prompt_embeddings(
            embedded, batch.slot_maps, subj)
        L, B, T, D = patched.shape
        ctx = clip.apply({"params": fz["clip"]},
                         input_embeds=patched.reshape(L * B, T, D),
                         skip_weights=_iter_skip_weights(batch, skip_weights))
        ctx = ctx.reshape(L, B, T, D)
        x_noisy = sched.q_sample(batch.latents, batch.timesteps, batch.noise)
        eps = unet.apply({"params": fz["unet"]}, x_noisy, batch.timesteps, ctx)
        return masked_recon_loss(eps, batch.noise, batch.fg_mask)

    def loss_fn(embedders, batch: DreamBoothBatch, fz):
        loss_train = one_loss(embedders, batch.train, fz)
        loss_reg = one_loss(embedders, batch.reg, fz)
        loss = loss_train + db_reg_weight * loss_reg
        return loss, {"loss": loss, "recon": loss_train, "db_reg": loss_reg}

    def step(embedders, opt_state, batch: DreamBoothBatch, frozen=None):
        fz = frozen if frozen is not None else {"clip": clip_params, "unet": unet_params}
        (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            embedders, batch, fz)
        updates, opt_state = optimizer.update(grads, opt_state, embedders)
        embedders = optax.apply_updates(embedders, updates)
        return embedders, opt_state, metrics

    return step


class ZeroShotReconBatch(NamedTuple):
    """One zero-shot recon iteration: subject identity evidence rides the
    batch (`shared_step` zero-shot branch, `ddpm.py:1737-1798`)."""

    latents: jnp.ndarray  # [B, h, w, 4]
    token_ids: jnp.ndarray  # [B, T]
    slot_maps: Dict[str, jnp.ndarray]  # placeholder -> [B, T]
    fg_mask: Optional[jnp.ndarray]
    timesteps: jnp.ndarray  # [B]
    noise: jnp.ndarray
    clip_fg: jnp.ndarray  # [B, N_tok, D_img] masked CLIP fg features
    clip_bg: jnp.ndarray  # [B, N_tok, D_img]
    id_embs: jnp.ndarray  # [B, 512] ArcFace (or DINO) identity embeddings
    emb_noise_std: Optional[jnp.ndarray] = None  # scalar
    emb_noise_key: Optional[jnp.ndarray] = None  # PRNG key
    dropout_key: Optional[jnp.ndarray] = None  # generator attn dropout
    # wds compositing: comp-extra token mask enabling the fg↔wds
    # complementary battery (see ReconBatch.wds_extra_token_mask)
    wds_extra_token_mask: Optional[jnp.ndarray] = None  # [B, T]
    # 4-type delta-prompt battery (see ReconBatch.delta_token_ids)
    delta_token_ids: Optional[jnp.ndarray] = None  # [4B, T]
    delta_slot_maps: Optional[Dict[str, jnp.ndarray]] = None
    # aug valid-area + per-instance mask availability (see ReconBatch)
    img_mask: Optional[jnp.ndarray] = None  # [B, h, w, 1]
    have_fg_mask: Optional[jnp.ndarray] = None  # [B]
    # per-iteration clip-skip weights ([2], host-sampled Dirichlet when
    # randomize_clip_skip_weights; None = the configured constant)
    skip_weights: Optional[jnp.ndarray] = None


def make_zero_shot_recon_step(
    clip: CLIPTextEncoder,
    clip_params: dict,
    unet: UNetModel,
    unet_params: dict,
    sched: DiffusionSchedule,
    optimizer: optax.GradientTransformation,
    generators: dict,  # placeholder -> SubjBasisGenerator module (static)
    bg_placeholders: frozenset,
    arc2face_encoder,  # CLIPTextEncoder (frozen prompt-encoder for 'id')
    arc2face_params: dict,
    forward_template_ids: jnp.ndarray,  # [1, T]
    inverse_template_ids: jnp.ndarray,  # [1, T]
    arcface_token_id: int,
    skip_weights=(0.5, 0.5),
    bg_weight: float = 0.1,
    out_id_embs_scale: float = 1.0,
    complem_weight: float = 0.0,
    xlayer_weight: float = 0.0,
    wds_complem_weight: float = 0.0,
    prompt_delta_weight: float = 0.0,
    use_bg_token: bool = False,
):
    """Recon step whose TRAINABLES are the SubjBasisGenerator params — the
    zero-shot ("AdaFace") training mode (`embedding_manager.py:1400-1505`
    inside `p_losses` recon). Identity evidence -> frozen Arc2Face forward
    -> generator inverse -> patched prompt context -> eps recon. With
    `complem_weight`/`xlayer_weight` > 0, the complementary-loss battery of
    `calc_recon_and_complem_losses` (`ddpm.py:3457-3565`) applies (capture
    forward)."""
    from adaface_tpu.personalization.arc2face import forward_face_embs_fn

    do_capture = (complem_weight > 0 or xlayer_weight > 0
                  or wds_complem_weight > 0)

    def loss_fn(gen_params: dict, batch: ZeroShotReconBatch, fz):
        # frozen Arc2Face forward: id emb -> 16 core prompt embeddings
        embed_fn = lambda ids: arc2face_encoder.apply(
            {"params": fz["arc"]}, ids, method="embed_tokens")
        encode_fn = lambda e, w, n: arc2face_encoder.apply(
            {"params": fz["arc"]}, input_embeds=e, skip_weights=w,
            num_skip_layers=n)
        _, arc_id_embs = forward_face_embs_fn(
            embed_fn, encode_fn, jax.lax.stop_gradient(batch.id_embs),
            forward_template_ids, arcface_token_id,
            arc2face_encoder.cfg.hidden_size)

        subj = {}
        for i, (s, gen) in enumerate(sorted(generators.items())):
            feats = batch.clip_bg if s in bg_placeholders else batch.clip_fg
            embs, _ = gen.apply(
                {"params": gen_params[s]}, feats,
                None, arc_id_embs, out_id_embs_scale=out_id_embs_scale,
                is_face=True, is_training=True,
                inverse_template_ids=inverse_template_ids,
                **_gen_dropout_kwargs(batch.dropout_key, i))
            subj[s] = jnp.transpose(embs, (1, 0, 2, 3))  # [L, B, K, D]
        if batch.emb_noise_std is not None and batch.emb_noise_key is not None:
            from adaface_tpu.ops.grad import add_noise_to_tensor

            subj = {s: add_noise_to_tensor(
                jax.random.fold_in(batch.emb_noise_key, i), e,
                batch.emb_noise_std, noise_std_is_relative=True)
                for i, (s, e) in enumerate(sorted(subj.items()))}

        embedded = clip.apply({"params": fz["clip"]}, batch.token_ids,
                              method=CLIPTextEncoder.embed_tokens)
        patched = EmbeddingManager.patch_prompt_embeddings(
            embedded, batch.slot_maps, subj)
        L, B, T, D = patched.shape
        ctx = clip.apply({"params": fz["clip"]},
                         input_embeds=patched.reshape(L * B, T, D),
                         skip_weights=_iter_skip_weights(batch, skip_weights))
        ctx = ctx.reshape(L, B, T, D)
        x_noisy = sched.q_sample(batch.latents, batch.timesteps, batch.noise)
        if do_capture:
            # only attnscore feeds the battery (see make_recon_train_step)
            eps, aux = unet.apply({"params": fz["unet"]}, x_noisy,
                                  batch.timesteps, ctx, capture=True,
                                  img_mask=batch.img_mask,
                                  capture_keys=("attnscore",))
        else:
            eps, aux = unet.apply({"params": fz["unet"]}, x_noisy,
                                  batch.timesteps, ctx,
                                  img_mask=batch.img_mask), None
        recon = masked_recon_loss(eps, batch.noise, batch.fg_mask,
                                  bg_weight=bg_weight,
                                  img_mask=batch.img_mask)
        loss = recon
        metrics = {"recon": recon}
        if prompt_delta_weight > 0 and batch.delta_token_ids is not None:
            # generator embeddings are per-instance [L, B, K, D]; the
            # 4-type battery repeats each instance 4x
            subj4 = {s: jnp.concatenate([v] * 4, axis=1)
                     for s, v in subj.items()}
            loss_delta = _recon_prompt_delta(clip, fz, batch, subj4,
                                             skip_weights)
            loss = loss + prompt_delta_weight * loss_delta
            metrics["prompt_delta"] = loss_delta
        if do_capture:
            complem, cm = _recon_complem_terms(
                aux, batch.slot_maps, batch.fg_mask, bg_placeholders,
                use_bg_token, True, complem_weight, xlayer_weight,
                batch.wds_extra_token_mask, wds_complem_weight,
                instance_mask=batch.have_fg_mask)
            loss = loss + complem
            metrics.update(cm)
        metrics["loss"] = loss
        return loss, metrics

    def step(gen_params, opt_state, batch: ZeroShotReconBatch, frozen=None):
        fz = frozen if frozen is not None else {
            "clip": clip_params, "unet": unet_params, "arc": arc2face_params}
        (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            gen_params, batch, fz)
        updates, opt_state = optimizer.update(grads, opt_state, gen_params)
        gen_params = optax.apply_updates(gen_params, updates)
        return gen_params, opt_state, metrics

    # loss-only entry for the zs validation pass (`ddpm.py:645-651`)
    step.loss_fn = loss_fn
    return step


class ZeroShotComposBatch(NamedTuple):
    """Zero-shot compositional-distillation iteration: the 4-type prompt
    batch of ComposBatch plus the subject's identity evidence, with subject
    embeddings produced in-graph by the SubjBasisGenerators
    (`embedding_manager.py:1455-1505` 'compos_distill_iter' branch)."""

    token_ids: jnp.ndarray  # [4B, T]
    slot_maps: Dict[str, jnp.ndarray]  # placeholder -> [4B, T]
    subj_slot_map: jnp.ndarray  # [4B, T]
    latents: jnp.ndarray  # [B, h, w, 4]
    fg_mask: Optional[jnp.ndarray]
    timesteps: jnp.ndarray  # [B]
    noise: jnp.ndarray
    t_frac: jnp.ndarray  # [B]
    training_percent: jnp.ndarray  # scalar
    clip_fg: jnp.ndarray  # [1, N_tok, D_img] (same_subject_in_batch)
    clip_bg: jnp.ndarray
    id_embs: jnp.ndarray  # [1, 512]
    compel_level: float = 0.0
    compel_batch_mask: Optional[jnp.ndarray] = None
    emb_noise_std: Optional[jnp.ndarray] = None  # scalar
    emb_noise_key: Optional[jnp.ndarray] = None  # PRNG key
    dropout_key: Optional[jnp.ndarray] = None  # generator attn dropout
    cls_mix_ranges: Optional[jnp.ndarray] = None  # [4], see ComposBatch
    # per-iteration clip-skip weights ([2], host-sampled Dirichlet when
    # randomize_clip_skip_weights; None = the configured constant)
    skip_weights: Optional[jnp.ndarray] = None
    # scalar elastic-matching preserve scale — see ComposBatch
    preserve_loss_scale: Optional[jnp.ndarray] = None


def make_zero_shot_compos_step(
    clip: CLIPTextEncoder,
    clip_params: dict,
    unet: UNetModel,
    unet_params: dict,
    sched: DiffusionSchedule,
    optimizer: optax.GradientTransformation,
    generators: dict,  # placeholder -> SubjBasisGenerator module (static)
    bg_placeholders: frozenset,
    arc2face_encoder,
    arc2face_params: dict,
    forward_template_ids: jnp.ndarray,
    inverse_template_ids: jnp.ndarray,
    arcface_token_id: int,
    skip_weights=(0.5, 0.5),
    frozen_blend: float = 0.9,
    out_id_embs_scale: float = 1.0,
    prompt_delta_weight: float = 2e-4,
    mix_prompt_distill_weight: float = 1e-4,
    fg_bg_weight: float = 1.0,
    comp_fg_bg_preserve_weight: float = 1e-3,
    xlayer_weight: float = 5e-5,
    padding_embs_align_weight: float = 0.0,
    subj_comp_ortho_weight: float = 0.0,
):
    """Compositional distillation with generator-produced subject
    embeddings (the zero-shot compos_distill_iter,
    `embedding_manager.py:1455-1505`): the subj-SINGLE block's embeddings
    are `frozen_blend`·frozen-generator + (1-blend)·live-generator — the
    frozen deep-copy made at setup (`make_frozen_copy_of_subj_basis_
    generators`, `embedding_manager.py:2055-2062`) keeps the recon anchor
    stable while the live generator learns from the comp block. Frozen
    generator params ride in `fz["gen0"]`."""
    from adaface_tpu.personalization.arc2face import forward_face_embs_fn

    core = _make_compos_loss_core(
        clip, unet, sched, skip_weights, prompt_delta_weight,
        mix_prompt_distill_weight,
        fg_bg_weight, comp_fg_bg_preserve_weight, xlayer_weight,
        do_zero_shot=True, bg_placeholders=bg_placeholders,
        padding_embs_align_weight=padding_embs_align_weight,
        subj_comp_ortho_weight=subj_comp_ortho_weight)

    def _gen_embs(params, batch, fz, arc_id_embs):
        subj = {}
        for i, (s, gen) in enumerate(sorted(generators.items())):
            feats = batch.clip_bg if s in bg_placeholders else batch.clip_fg
            embs, _ = gen.apply(
                {"params": params[s]}, feats, None, arc_id_embs,
                out_id_embs_scale=out_id_embs_scale, is_face=True,
                is_training=True, inverse_template_ids=inverse_template_ids,
                **_gen_dropout_kwargs(batch.dropout_key, i))
            subj[s] = jnp.transpose(embs, (1, 0, 2, 3))  # [L, 1, K, D]
        return subj

    def loss_fn(gen_params: dict, batch: ZeroShotComposBatch, fz):
        embed_fn = lambda ids: arc2face_encoder.apply(
            {"params": fz["arc"]}, ids, method="embed_tokens")
        encode_fn = lambda e, w, n: arc2face_encoder.apply(
            {"params": fz["arc"]}, input_embeds=e, skip_weights=w,
            num_skip_layers=n)
        _, arc_id_embs = forward_face_embs_fn(
            embed_fn, encode_fn, jax.lax.stop_gradient(batch.id_embs),
            forward_template_ids, arcface_token_id,
            arc2face_encoder.cfg.hidden_size)

        live = _gen_embs(gen_params, batch, fz, arc_id_embs)
        frozen = jax.lax.stop_gradient(
            _gen_embs(fz["gen0"], batch, fz, arc_id_embs))
        B4 = batch.token_ids.shape[0]
        CB = B4 // 4  # blocks per prompt type (dp under a mesh)
        subj = {}
        for s in live:
            # [L, G, K, D]: G = CB per-block identities, or 1 shared
            # identity broadcast over the blocks
            lv, fr = live[s], frozen[s]
            if lv.shape[1] != CB:
                shape = (lv.shape[0], CB) + lv.shape[2:]
                lv = jnp.broadcast_to(lv, shape)
                fr = jnp.broadcast_to(fr, shape)
            single = frozen_blend * fr + (1 - frozen_blend) * lv
            # type-major rows [subj_single(CB), subj_comp(CB), cls_single,
            # cls_comp]; class rows carry slot -1 everywhere so their
            # value is never read
            subj[s] = jnp.concatenate([single, lv, lv, lv],
                                      axis=1)  # [L, 4CB, K, D]
        if batch.emb_noise_std is not None and batch.emb_noise_key is not None:
            from adaface_tpu.ops.grad import add_noise_to_tensor

            subj = {s: add_noise_to_tensor(
                jax.random.fold_in(batch.emb_noise_key, i), e,
                batch.emb_noise_std, noise_std_is_relative=True)
                for i, (s, e) in enumerate(sorted(subj.items()))}

        embedded = clip.apply({"params": fz["clip"]}, batch.token_ids,
                              method=CLIPTextEncoder.embed_tokens)
        patched = EmbeddingManager.patch_prompt_embeddings(
            embedded, batch.slot_maps, subj)
        return core(patched, batch, fz)

    def step(gen_params, opt_state, batch: ZeroShotComposBatch, frozen=None):
        if frozen is not None and "gen0" not in frozen:
            raise KeyError(
                "make_zero_shot_compos_step: frozen dict must carry 'gen0' "
                "(the frozen deep-copy of the generator params made at setup"
                " — embedding_manager.py:2055-2062); got keys "
                f"{sorted(frozen)}")
        # Default: snapshot the CURRENT generator params as the frozen
        # anchor (equivalent to a setup-time copy on the first step; the
        # stop_gradient in loss_fn keeps it an anchor either way).
        fz = frozen if frozen is not None else {
            "clip": clip_params, "unet": unet_params, "arc": arc2face_params,
            "gen0": jax.tree_util.tree_map(jax.lax.stop_gradient, gen_params)}
        (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            gen_params, batch, fz)
        updates, opt_state = optimizer.update(grads, opt_state, gen_params)
        gen_params = optax.apply_updates(gen_params, updates)
        return gen_params, opt_state, metrics

    return step
