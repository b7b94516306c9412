"""Zero-shot ("AdaFace") training orchestration.

The zero-shot mode trains the SubjBasisGenerator(s) over a multi-subject
corpus: per batch, reference-image features (masked CLIP fg/bg + face
identity) ride along and the generators produce the subject embeddings
in-graph (`ddpm.py:1737-1798` + `embedding_manager.py:1400-1505`). Reuses
the Trainer's plumbing (dataset, VAE encode, logging, checkpoints) and
swaps the step for `make_zero_shot_recon_step`; arc2face distillation
iterations slot in when a teacher is provided.
"""

from __future__ import annotations

import os
import pickle
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from adaface_tpu.data.personalized import collate_examples
from adaface_tpu.personalization.arc2face import (
    FORWARD_TEMPLATE,
    INVERSE_TEMPLATE,
)
from adaface_tpu.training.iter_plan import (
    COMPOS_DISTILL,
    RECON,
    IterPlan,
    plan_iteration,
    sample_timesteps,
)
from adaface_tpu.training.train_step import (
    ZeroShotArc2FaceBatch,
    ZeroShotComposBatch,
    ZeroShotReconBatch,
    make_zero_shot_arc2face_step,
    make_zero_shot_compos_step,
    make_zero_shot_recon_step,
)
from adaface_tpu.training.trainer import Trainer, TrainerConfig


class ZeroShotTrainer(Trainer):
    def __init__(self, pipeline, dataset, extractor, generators: Dict,
                 generator_params: Dict, arc2face_encoder, arc2face_params,
                 cfg: TrainerConfig = TrainerConfig(), plan_cfg=None,
                 bg_placeholders=frozenset()):
        from adaface_tpu.training.iter_plan import IterPlanConfig

        super().__init__(pipeline, dataset, cfg,
                         plan_cfg or IterPlanConfig())
        self.extractor = extractor
        self.generators = generators
        self.gen_params = generator_params
        self.bg_placeholders = frozenset(bg_placeholders)
        tok = pipeline.tokenizer
        self._arc_encoder = arc2face_encoder
        self._arc_frozen = arc2face_params
        self._fwd_ids = jnp.asarray(tok([FORWARD_TEMPLATE]))
        self._inv_ids = jnp.asarray(tok([INVERSE_TEMPLATE]))
        self._arc_tid = int(tok.encode("id")[0])
        # trainables are the generator params, not static embedders
        self.opt_state = self.optimizer.init(self.gen_params)
        p = self.pipe
        self._zs_recon_steps = {}
        # frozen deep-copy of the generators at setup, used to anchor the
        # subj-single block of compos iters
        # (`make_frozen_copy_of_subj_basis_generators`,
        # `embedding_manager.py:2055-2062`)
        self._gen0 = jax.tree_util.tree_map(jnp.asarray, generator_params)
        self._zs_compos_steps: Dict[tuple, object] = {}
        self._zs_mesh_place()

    def _get_zs_compos_step(self):
        """Jitted zs compositional step, keyed on knobs.fingerprint() like
        every trainer step cache (in-process ADAFACE_* flips retrace)."""
        from adaface_tpu import knobs

        key = knobs.fingerprint()
        if key not in self._zs_compos_steps:
            p = self.pipe
            self._zs_compos_steps[key] = jax.jit(make_zero_shot_compos_step(
                p.clip, p.clip_params, p.unet, p.unet_params, p.base_sched,
                self.optimizer, generators=self.generators,
                prompt_delta_weight=self._delta_w,
                bg_placeholders=self.bg_placeholders,
                arc2face_encoder=self._arc_encoder,
                arc2face_params=self._arc_frozen,
                forward_template_ids=self._fwd_ids,
                inverse_template_ids=self._inv_ids,
                arcface_token_id=self._arc_tid,
                skip_weights=p.skip_weights,
                mix_prompt_distill_weight=(
                    self.plan_cfg.mix_prompt_distill_weight)))
        return self._zs_compos_steps[key]

    def _zs_mesh_place(self):
        """Mesh placement for the zero-shot trainables: generators + frozen
        anchors replicate; the Prodigy optimizer state — the 4x-params fp32
        slab that OOMs a single chip at the zs batch-6 point (PERF.md) —
        shards ZeRO-1 over dp (`parallel/mesh.py:zero1_sharding_rules`).
        No-op on a single device."""
        if self.mesh is None:
            return
        from adaface_tpu.parallel.mesh import replicate_params, shard_opt_state

        self.gen_params = replicate_params(self.mesh, self.gen_params)
        self.opt_state = shard_opt_state(self.mesh, self.opt_state)
        self._arc_frozen = replicate_params(self.mesh, self._arc_frozen)
        self._gen0 = replicate_params(self.mesh, self._gen0)

    def _dropout_key(self):
        """Per-step PRNG key for the generators' attention dropout
        (p=0.05 — the reference trains prompt_translator with attn_drop
        active; see `_gen_dropout_kwargs`)."""
        return jax.random.PRNGKey(int(self.rng.integers(2 ** 31)))

    def _make_zs_recon_step(self, use_bg_token: bool, use_wds: bool = False):
        """Raw (un-jitted) zs-recon step for a battery variant; exposes
        `.loss_fn` for the validation pass."""
        p, cfg = self.pipe, self.cfg
        return make_zero_shot_recon_step(
            p.clip, p.clip_params, p.unet, p.unet_params,
            p.base_sched, self.optimizer, generators=self.generators,
            bg_placeholders=self.bg_placeholders,
            arc2face_encoder=self._arc_encoder,
            arc2face_params=self._arc_frozen,
            forward_template_ids=self._fwd_ids,
            inverse_template_ids=self._inv_ids,
            arcface_token_id=self._arc_tid,
            skip_weights=p.skip_weights,
            bg_weight=(cfg.wds_bg_recon_weight if use_wds
                       else cfg.bg_recon_weight if use_bg_token
                       else 0.0),
            complem_weight=cfg.fg_bg_complementary_loss_weight,
            xlayer_weight=cfg.fg_bg_xlayer_consist_loss_weight,
            wds_complem_weight=(cfg.fg_wds_complementary_loss_weight
                                if use_wds else 0.0),
            prompt_delta_weight=self._delta_w,
            use_bg_token=use_bg_token)

    def _get_zs_recon_step(self, use_bg_token: bool, use_wds: bool = False):
        """Jitted zs-recon variant per (bg-token, wds) combination: each
        changes the static loss battery (`calc_recon_and_complem_losses`,
        `ddpm.py:2917-2946,3457-3565`; wds instances use the discounted bg
        recon weight + the fg↔wds-extra complementary variant)."""
        from adaface_tpu import knobs

        key = (use_bg_token, use_wds, knobs.fingerprint())
        if key not in self._zs_recon_steps:
            self._zs_recon_steps[key] = jax.jit(
                self._make_zs_recon_step(use_bg_token, use_wds))
        return self._zs_recon_steps[key]

    def save_checkpoint(self, tag: Optional[str] = None):
        tag = tag or f"gs-{self.global_step}"
        path = os.path.join(self.cfg.logdir, f"subj_basis_{tag}.pkl")
        with open(path, "wb") as f:
            pickle.dump({"generator_params": jax.device_get(self.gen_params),
                         "global_step": self.global_step,
                         "opt_state": jax.device_get(self.opt_state),
                         "rng_state": self.rng.bit_generator.state}, f)
        print(f"saved {path}", flush=True)
        return path

    def load_checkpoint(self, path: str):
        """Resume generator training: params + optimizer state + host RNG
        (the zs analog of `Trainer.load_state`)."""
        with open(path, "rb") as f:
            ckpt = pickle.load(f)
        self.gen_params = jax.tree_util.tree_map(
            jnp.asarray, ckpt["generator_params"])
        self.global_step = int(ckpt["global_step"])
        if "opt_state" in ckpt:
            self.opt_state = jax.tree_util.tree_map(
                lambda x: jnp.asarray(x) if hasattr(x, "shape") else x,
                ckpt["opt_state"])
        if "rng_state" in ckpt:
            self.rng.bit_generator.state = ckpt["rng_state"]
        self._zs_mesh_place()
        print(f"resumed zs training from {path} at step {self.global_step}")
        return self

    def _zs_subject_embs(self, feats, id_embs):
        """No-grad zero-shot subject embeddings from the LIVE generators:
        placeholder -> [L, CB, K, D] over the CB blocks (the filter-pass
        analog of `_gen_embs` inside the jitted step)."""
        from adaface_tpu.personalization.arc2face import forward_face_embs_fn

        enc, enc_p = self._arc_encoder, self._arc_frozen
        embed_fn = lambda i: enc.apply({"params": enc_p}, i,
                                       method="embed_tokens")
        encode_fn = lambda em, w, n: enc.apply(
            {"params": enc_p}, input_embeds=em, skip_weights=w,
            num_skip_layers=n)
        _, arc_id_embs = forward_face_embs_fn(
            embed_fn, encode_fn, jnp.asarray(id_embs), self._fwd_ids,
            self._arc_tid, enc.cfg.hidden_size)
        subj = {}
        for s, gen in self.generators.items():
            f = feats.clip_bg if s in self.bg_placeholders else feats.clip_fg
            embs, _ = gen.apply(
                {"params": self.gen_params[s]}, f, None, arc_id_embs,
                is_face=True, is_training=True,
                inverse_template_ids=self._inv_ids)
            subj[s] = jnp.transpose(embs, (1, 0, 2, 3))
        return subj

    def _zs_compos_contexts(self, ids, slots, plan, t, feats, id_embs):
        """(subj_comp, mix_comp, uncond) filter contexts for the zs path:
        generator embeddings patched into the 4-type prompts, encoded, then
        V/K-mixed — the no-grad twin of the jitted compos step
        (`ddpm.py:3039-3131` zero-shot branch)."""
        from adaface_tpu.personalization.embedding_manager import (
            EmbeddingManager,
        )

        p = self.pipe
        subj = self._zs_subject_embs(feats, id_embs)
        B4 = ids.shape[0]
        # tile the [L, CB, K, D] per-block embeddings over the 4 prompt
        # types (type-major rows: [ss(CB), sc(CB), cs(CB), cc(CB)])
        subj4 = {s: jnp.concatenate([v] * (B4 // v.shape[1]), axis=1)
                 for s, v in subj.items()}
        embedded = p.clip.apply({"params": p.clip_params}, jnp.asarray(ids),
                                method=type(p.clip).embed_tokens)
        patched = EmbeddingManager.patch_prompt_embeddings(
            embedded, {k: jnp.asarray(v) for k, v in slots.items()}, subj4)
        L, B, T, D = patched.shape
        ctx = p.clip.apply({"params": p.clip_params},
                           input_embeds=patched.reshape(L * B, T, D),
                           skip_weights=jnp.asarray(p.skip_weights))
        ctx = ctx.reshape(L, B, T, D)
        ctx = self._distribute_cls_ctx(ctx, slots)
        subj_string = next(s for s in self.generators
                           if s not in self.bg_placeholders)
        return self._mix_ctx_for_filter(
            ctx, jnp.asarray(slots[subj_string]), plan, t, T)

    def _run_zs_compos(self, plan):
        """Zero-shot compositional distillation iteration (BLOCK_SIZE=1
        per device, same_subject_in_batch; CB = dp blocks over a mesh):
        generator-produced subject embeddings with the frozen-copy blend
        on the subj-single block, CLIP teacher filtering and reuse-init
        caching (`ddpm.py:3039-3180`, `:2604-2635`) when
        `set_teacher_filter` is active."""
        CB = self._dp
        ex = self._draw_examples(CB)
        self._wds_compos_swap(plan, ex)
        prompts = self._compos_prompt_battery(plan, ex)
        latents = self._latents(np.stack([e["image"] for e in ex]))
        lh, lw = latents.shape[1:3]
        fg_latent = self._mask_to_latent(
            np.stack([e["fg_mask"] for e in ex]), lh, lw)
        for b, e in enumerate(ex):
            if not e.get("has_fg_mask", True):
                # filtered_fg_mask semantics (`ddpm.py:2648-2650`)
                fg_latent[b] = 0.0
        latents, fg_latent, prompts, prev_t, entries = self._compos_x_start(
            plan, ex, latents, fg_latent, prompts)
        # tokenize AFTER the cache check (reuse restores the cached
        # iteration's prompt battery)
        ids = self.pipe.tokenizer(prompts)
        slots = self.mgr.build_slot_maps(ids)
        subj_string = next(s for s in self.generators
                           if s not in self.bg_placeholders)
        if entries is not None and all(
                c.get("zs_feats") is not None for c in entries):
            # the reference also caches/restores the zs conditioning
            # (`zs_clip_features`/`zs_id_embs`, `ddpm.py:3173-3176`,
            # `:1913-1915`): the cached recon was denoised under THESE
            # reference-image features, which may differ from this draw's
            from adaface_tpu.personalization.zero_shot import ZeroShotFeatures

            fs = [c["zs_feats"] for c in entries]
            feats = ZeroShotFeatures(
                clip_fg=jnp.concatenate([f.clip_fg[:1] for f in fs]),
                clip_bg=jnp.concatenate([f.clip_bg[:1] for f in fs]),
                id_embs=None)
            id_embs = jnp.concatenate(
                [jnp.asarray(c["zs_id_embs"])[:1] for c in entries])
        else:
            feats = self.extractor.encode([e["image_unnorm"] for e in ex],
                                          [e["fg_mask"] for e in ex],
                                          is_face=True)
            id_embs = feats.id_embs if feats.id_embs is not None else \
                jnp.asarray(self.rng.standard_normal((CB, 512)), jnp.float32)
        t = sample_timesteps(self.rng, plan, CB, self.plan_cfg, prev_t=prev_t)
        noise = jnp.asarray(self.rng.standard_normal(latents.shape),
                            jnp.float32)

        if (self.teacher_filter is not None and plan.do_teacher_filter
                and not plan.reuse_init_conds):
            n_cand = self.plan_cfg.num_candidate_teachers
            cand_x = jnp.concatenate([latents] * n_cand)  # cand-major
            cand_noise = jnp.asarray(
                self.rng.standard_normal(cand_x.shape), jnp.float32)
            cand_t = jnp.asarray(
                sample_timesteps(self.rng, plan, n_cand * CB, self.plan_cfg),
                jnp.int32)
            ctx = self._zs_compos_contexts(ids, slots, plan, cand_t,
                                           feats, id_embs)
            verdict = self.teacher_filter.filter(
                cand_x, cand_noise, cand_t,
                ctx["subj_comp"], ctx["mix_comp"], ctx["uncond"],
                prompts[3 * CB:] * n_cand)
            ok, best, block_ok = self._filter_verdict_per_block(
                verdict, n_cand, CB)
            if self.image_logger is not None \
                    and self.image_logger.should_log(self.global_step):
                sel = {int(best[b]) * CB + b for b in range(CB)
                       if block_ok[b]}
                colors = [2 if i % (n_cand * CB) in sel else 1
                          for i in range(2 * n_cand * CB)]
                self.image_logger.log_candidates(self.global_step,
                                                 verdict.images, colors)
            if not ok:
                # skip the distillation loss this iter (`ddpm.py:3047-3050`)
                return {"loss": jnp.asarray(0.0), "skipped_unteachable": 1.0}
            rows = np.asarray([int(best[b]) * CB + b for b in range(CB)])
            noise = cand_noise[rows]
            t = np.asarray(cand_t)[rows]

            def zs_extra(b):
                from adaface_tpu.personalization.zero_shot import (
                    ZeroShotFeatures,
                )

                return dict(zs_feats=ZeroShotFeatures(
                    clip_fg=feats.clip_fg[b:b + 1],
                    clip_bg=feats.clip_bg[b:b + 1], id_embs=None),
                    zs_id_embs=np.asarray(id_embs)[b:b + 1])

            self._cache_filtered_blocks(ex, verdict, best, block_ok, cand_t,
                                        fg_latent, plan, prompts, n_cand,
                                        zs_extra_fn=zs_extra)

        noise_kw = {}
        if plan.emb_noise_std > 0:
            noise_kw = dict(
                emb_noise_std=jnp.asarray(plan.emb_noise_std, jnp.float32),
                emb_noise_key=jax.random.PRNGKey(
                    int(self.rng.integers(2 ** 31))))
        batch = ZeroShotComposBatch(
            token_ids=jnp.asarray(ids),
            slot_maps={k: jnp.asarray(v) for k, v in slots.items()},
            subj_slot_map=jnp.asarray(slots[subj_string]),
            latents=latents,
            fg_mask=jnp.asarray(fg_latent),
            timesteps=jnp.asarray(t, jnp.int32),
            noise=noise,  # the filter-selected candidate's noise when teachable
            t_frac=jnp.asarray(t / self.plan_cfg.num_timesteps, jnp.float32),
            training_percent=jnp.asarray(plan.training_percent, jnp.float32),
            clip_fg=feats.clip_fg[:CB], clip_bg=feats.clip_bg[:CB],
            id_embs=jnp.asarray(id_embs)[:CB],
            cls_mix_ranges=jnp.asarray(self._cls_mix_ranges(plan)),
            dropout_key=self._dropout_key(),
            preserve_loss_scale=jnp.asarray(
                self._preserve_scale(plan), jnp.float32),
            **self._skip_weights_kw(), **noise_kw)
        self.gen_params, self.opt_state, metrics = self._call_step(
            self._get_zs_compos_step(), self.gen_params, self.opt_state, batch,
            {**self._frozen, "arc": self._arc_frozen, "gen0": self._gen0})
        return metrics

    def _noise_id_embs(self, id_embs: jnp.ndarray) -> jnp.ndarray:
        """Norm-preserving ID-embedding noising
        (`anneal_add_noise_to_embedding` + `add_noise_to_tensor`,
        `ldm/util.py:2364-2401`): noise std is U(0.02, 0.06) relative to
        the batch-mean per-row std (Bessel-corrected, dim -1), and each
        row is rescaled back to its original L2 norm (keep_norm=True)."""
        e = np.asarray(id_embs, np.float32)
        std_mean = float(e.std(axis=-1, ddof=1).mean())
        noise_std = float(self.rng.uniform(0.02, 0.06)) * std_mean
        noised = e + self.rng.standard_normal(e.shape).astype(
            np.float32) * noise_std
        orig_norm = np.linalg.norm(e, axis=-1, keepdims=True)
        new_norm = np.linalg.norm(noised, axis=-1, keepdims=True)
        return jnp.asarray(noised * orig_norm / (new_norm + 1e-8))

    def _run_zs_arc2face(self, plan, teacher):
        """Zero-shot arc2face distillation iteration: the generators train
        against the frozen teacher's multi-step trajectory, with the
        identity embedding driving both sides (`ddpm.py:1714-1878`,
        `:2950-3035` zero-shot branch). Random-face iterations start from
        pure noise with random identity embeddings."""
        from adaface_tpu.training.iter_plan import ARC2FACE_DISTILL

        teacher_unet, teacher_params = teacher[0], teacher[1]
        S = plan.num_denoising_steps
        from adaface_tpu import knobs

        key = (S, plan.gen_arc2face_rand_face, knobs.fingerprint())
        if not hasattr(self, "_zs_a2f_steps"):
            self._zs_a2f_steps = {}
        if key not in self._zs_a2f_steps:
            p = self.pipe
            self._zs_a2f_steps[key] = jax.jit(make_zero_shot_arc2face_step(
                p.clip, p.clip_params, p.unet, p.unet_params,
                teacher_unet, teacher_params, p.base_sched, self.optimizer,
                generators=self.generators,
                bg_placeholders=self.bg_placeholders,
                arc2face_encoder=self._arc_encoder,
                arc2face_params=self._arc_frozen,
                forward_template_ids=self._fwd_ids,
                inverse_template_ids=self._inv_ids,
                arcface_token_id=self._arc_tid,
                num_denoising_steps=S, skip_weights=p.skip_weights,
                use_fg_mask=not plan.gen_arc2face_rand_face))
        # multi-step iters shrink the batch to HALF_BS = ceil(BS/S)
        # (`torch.arange(BS).chunk(S)[0]`, `ddpm.py:1853-1878`);
        # single-step iters keep the full batch. Per-device, like recon.
        B = (-(-self.cfg.batch_size // S) if S > 1
             else self.cfg.batch_size) * self._dp
        ex = self._draw_examples(B)
        batch_np = collate_examples(ex)
        feats = self.extractor.encode([e["image_unnorm"] for e in ex],
                                      [e["fg_mask"] for e in ex],
                                      is_face=True)
        bfg = feats.clip_fg if feats.clip_fg.shape[0] == B else \
            jnp.broadcast_to(feats.clip_fg, (B,) + feats.clip_fg.shape[1:])
        bbg = feats.clip_bg if feats.clip_bg.shape[0] == B else \
            jnp.broadcast_to(feats.clip_bg, (B,) + feats.clip_bg.shape[1:])
        img_kw = {}
        if plan.gen_arc2face_rand_face:
            # random identities + pure-noise x_start (`:1714-1718`); no
            # masks on random faces (`ddpm.py:1799-1800`)
            id_embs = jnp.asarray(
                self.rng.standard_normal((B, 512)), jnp.float32)
            latents = jnp.asarray(self.rng.standard_normal(
                self._latents(batch_np["image"]).shape), jnp.float32)
            fg = None
        else:
            id_embs = feats.id_embs if feats.id_embs is not None else \
                jnp.asarray(self.rng.standard_normal((B, 512)), jnp.float32)
            latents = self._latents(batch_np["image"])
            lh, lw = latents.shape[1:3]
            fg = jnp.asarray(self._mask_to_latent(batch_np["fg_mask"], lh, lw))
            img_kw["img_mask"] = jnp.asarray(
                self._mask_to_latent(batch_np["aug_mask"], lh, lw))
            if plan.add_noise_to_real_id_embs:
                # Collapse the batch to the first subject, then perturb its
                # ID embedding per instance (`ddpm.py:1749-1779`): similar
                # embeddings (first subject + noise) against one x_start
                # teach the model to resolve tiny embedding differences.
                # x_start/masks/CLIP features all become instance 0;
                # captions stay as drawn (shared placeholder).
                latents = jnp.broadcast_to(latents[:1], latents.shape)
                fg = jnp.broadcast_to(fg[:1], fg.shape)
                img_kw["img_mask"] = jnp.broadcast_to(
                    img_kw["img_mask"][:1], img_kw["img_mask"].shape)
                bfg = jnp.broadcast_to(bfg[:1], bfg.shape)
                bbg = jnp.broadcast_to(bbg[:1], bbg.shape)
                id_embs = jnp.broadcast_to(id_embs[:1], (B,)
                                           + id_embs.shape[1:])
                id_embs = self._noise_id_embs(id_embs)
        ids, slots = self._prompt_batch(ex, "caption")
        t = sample_timesteps(self.rng, plan, B, self.plan_cfg)
        batch = ZeroShotArc2FaceBatch(
            latents=latents, token_ids=ids, slot_maps=slots,
            timesteps=jnp.asarray(t, jnp.int32),
            noises=jnp.asarray(self.rng.standard_normal((S,) + latents.shape),
                               jnp.float32),
            relative_ts=jnp.asarray(self.rng.uniform(size=(max(S - 1, 1), B)),
                                    jnp.float32),
            fg_mask=fg, clip_fg=bfg, clip_bg=bbg,
            id_embs=id_embs / (jnp.linalg.norm(id_embs, axis=-1,
                                               keepdims=True) + 1e-12),
            dropout_key=self._dropout_key(), **img_kw,
            **self._skip_weights_kw())
        self.gen_params, self.opt_state, metrics = self._call_step(
            self._zs_a2f_steps[key], self.gen_params, self.opt_state, batch,
            {**self._frozen, "arc": self._arc_frozen,
             "teacher": self._replicated_teacher(teacher_params)})
        return metrics

    def _zs_recon_batch(self, ex, plan, use_wds=False, use_wds_cls=False,
                        rng=None, with_reg_kw=True) -> ZeroShotReconBatch:
        """Assemble one zs-recon batch from drawn examples (shared by the
        train loop and the validation pass; `rng` defaults to the training
        stream, the val pass passes its own)."""
        rng = rng if rng is not None else self.rng
        B = len(ex)
        batch_np = collate_examples(ex)
        latents = self._latents(batch_np["image"])
        lh, lw = latents.shape[1:3]
        ids, slots = self._prompt_batch(
            ex, "caption_bg" if plan.use_background_token else "caption")
        feats = self.extractor.encode(
            [e["image_unnorm"] for e in ex],
            [e["fg_mask"] for e in ex], is_face=True)
        id_embs = feats.id_embs if feats.id_embs is not None else \
            jnp.asarray(rng.standard_normal((B, 512)), jnp.float32)
        t = sample_timesteps(rng, plan, B, self.plan_cfg)
        noise_kw = {}
        if with_reg_kw:
            if plan.emb_noise_std > 0:
                noise_kw = dict(
                    emb_noise_std=jnp.asarray(plan.emb_noise_std,
                                              jnp.float32),
                    emb_noise_key=jax.random.PRNGKey(
                        int(rng.integers(2 ** 31))))
            if use_wds and self.cfg.fg_wds_complementary_loss_weight > 0:
                noise_kw["wds_extra_token_mask"] = jnp.asarray(
                    self._wds_extra_mask(ids, slots,
                                         extend_subj_by_one=use_wds_cls))
            delta = self._delta_prompt_battery(plan, ex)
            if delta is not None:
                noise_kw["delta_token_ids"], noise_kw["delta_slot_maps"] = \
                    delta
        return ZeroShotReconBatch(
            latents=latents, token_ids=ids, slot_maps=slots,
            fg_mask=jnp.asarray(
                self._mask_to_latent(batch_np["fg_mask"], lh, lw)),
            timesteps=jnp.asarray(t, jnp.int32),
            noise=jnp.asarray(rng.standard_normal(latents.shape),
                              jnp.float32),
            img_mask=jnp.asarray(
                self._mask_to_latent(batch_np["aug_mask"], lh, lw)),
            have_fg_mask=jnp.asarray(
                [float(e.get("has_fg_mask", True)) for e in ex],
                jnp.float32),
            clip_fg=feats.clip_fg if feats.clip_fg.shape[0] == B
            else jnp.broadcast_to(feats.clip_fg,
                                  (B,) + feats.clip_fg.shape[1:]),
            clip_bg=feats.clip_bg if feats.clip_bg.shape[0] == B
            else jnp.broadcast_to(feats.clip_bg,
                                  (B,) + feats.clip_bg.shape[1:]),
            id_embs=id_embs,
            # validation (`with_reg_kw=False`) must neither advance the
            # TRAINING rng stream (that would make val_every_steps change
            # the training trajectory) nor run generator dropout (the
            # reference's Lightning validation runs in eval mode)
            dropout_key=(self._dropout_key() if with_reg_kw else None),
            **(self._skip_weights_kw() if with_reg_kw else {}),
            **noise_kw)

    def _get_val_loss(self):
        """Loss-only zs recon program for the validation pass (overrides
        the static trainer's: the zs trainable is the generator tree)."""
        from adaface_tpu import knobs

        key = ("zs_val", knobs.fingerprint())
        if key not in self._steps:
            self._steps[key] = jax.jit(
                self._make_zs_recon_step(False, False).loss_fn)
        return self._steps[key]

    def run_validation(self):
        """Zero-shot validation pass: the zs recon loss battery under
        no-grad on val-stream batches, `val/`-prefixed rows
        (`ddpm.py:645-651`)."""
        import json as _json

        if self._val_sampler is None:
            raise RuntimeError(
                "validation stream not built — construct the trainer with "
                "TrainerConfig(val_every_steps > 0) (or train.py "
                "--val_every N)")
        B = self.cfg.batch_size * self._dp
        loss_fn = self._get_val_loss()
        sums: Dict[str, float] = {}
        for _ in range(self.cfg.val_batches):
            plan = IterPlan(iter_type=RECON,
                            training_percent=self.global_step
                            / max(self.cfg.max_steps, 1))
            ex = [self._val_dataset[(self._val_sampler.sample(), True)]
                  for _ in range(B)]
            batch = self._zs_recon_batch(ex, plan, rng=self._val_rng,
                                         with_reg_kw=False)
            if self.mesh is not None:
                from adaface_tpu.parallel.mesh import shard_train_batch

                batch = shard_train_batch(self.mesh, batch)
            _, metrics = loss_fn(
                self.gen_params, batch,
                {**self._frozen, "arc": self._arc_frozen})
            for k, v in metrics.items():
                sums[k] = sums.get(k, 0.0) + float(v)
        rec: Dict = {"step": self.global_step}
        rec.update({f"val/{k}": v / self.cfg.val_batches
                    for k, v in sums.items()})
        self._log_f.write(_json.dumps(rec) + "\n")
        self._log_f.flush()
        print(f"[{self.global_step}/{self.cfg.max_steps}] val: " + " ".join(
            f"{k}={v:.4f}" for k, v in rec.items() if k != "step"),
            flush=True)
        return rec

    def _post_step(self, t0: float):
        """Shared per-step tail: validation cadence + checkpoint cadence +
        run summary (mirrors `Trainer.fit`)."""
        self.global_step += 1
        if (self.cfg.val_every_steps > 0
                and self.global_step % self.cfg.val_every_steps == 0):
            self.run_validation()
        if self.global_step % self.cfg.ckpt_every_steps == 0:
            self.save_checkpoint()
            self._log_run_summary(t0)

    def fit(self, num_steps: Optional[int] = None, face_embed_fn=None,
            arc2face_teacher=None):
        import time as _time

        from adaface_tpu.training.iter_plan import ARC2FACE_DISTILL

        n = num_steps or self.cfg.max_steps
        t0 = _time.time()
        # per-device batch like the static trainer (`_run_recon`)
        B = self.cfg.batch_size * self._dp
        while self.global_step < n:
            plan = plan_iteration(self.rng, self.global_step, self.plan_cfg)
            if plan.iter_type == COMPOS_DISTILL:
                metrics = self._run_zs_compos(plan)
                self._log(metrics, plan)
                self._post_step(t0)
                continue
            if plan.iter_type == ARC2FACE_DISTILL and arc2face_teacher is not None:
                metrics = self._run_zs_arc2face(plan, arc2face_teacher)
                self._log(metrics, plan)
                self._post_step(t0)
                continue
            plan.iter_type = RECON
            ex = self._draw_examples(B)
            plan, use_wds, use_wds_cls = self._wds_recon_swap(plan, ex)
            batch = self._zs_recon_batch(ex, plan, use_wds, use_wds_cls)
            step = self._get_zs_recon_step(plan.use_background_token, use_wds)
            self.gen_params, self.opt_state, metrics = self._call_step(
                step, self.gen_params, self.opt_state, batch,
                {**self._frozen, "arc": self._arc_frozen})
            self._log(metrics, plan)
            self._post_step(t0)
        self.save_checkpoint("last")
        self._log_run_summary(t0)
        return self.gen_params
