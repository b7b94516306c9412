"""Training orchestration — the Lightning-Trainer + DDPM-policy equivalent.

Replaces PyTorch Lightning manual optimization (`main.py:1240` +
`DDPM.training_step`, `ddpm.py:519-642`) with an explicit host loop:

- per step, `plan_iteration` rolls the iteration type on host; each type
  runs one of the pre-jitted step variants (SURVEY.md §7.1);
- batches are assembled on host from `PersonalizedDataset` examples;
  images VAE-encode on device in one jitted call (`get_input`,
  `ddpm.py:1169-1247`);
- gradient accumulation + global-norm clipping live INSIDE the optax chain
  (`optax.MultiSteps` + `clip_by_global_norm`) instead of the reference's
  manual bookkeeping (`ddpm.py:599-637`);
- checkpoints: the EmbeddingManager's native `.npz` every
  `ckpt_every_steps` (the real artifact, `embeddings_gs-{step}.pt`
  semantics, `ddpm.py:5388-5396`) + `last`; SIGUSR1 triggers an immediate
  checkpoint like the reference's "melk" handler (`main.py:1217-1233`);
- metrics stream to stdout and a JSONL file (the `log_dict` analog).
"""

from __future__ import annotations

import dataclasses
import json
import os
import signal
import time
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from adaface_tpu.data.personalized import (
    PersonalizedDataset,
    SubjectSampler,
    collate_examples,
)
from adaface_tpu.models.vae import SD_VAE_SCALE_FACTOR, AutoencoderKL
from adaface_tpu.personalization.embedding_manager import EmbeddingManager
from adaface_tpu.training.iter_plan import (
    ARC2FACE_DISTILL,
    COMPOS_DISTILL,
    RECON,
    IterPlan,
    IterPlanConfig,
    anneal_value,
    plan_iteration,
    sample_timesteps,
)
from adaface_tpu.training.train_step import (
    Arc2FaceBatch,
    ComposBatch,
    ReconBatch,
    make_arc2face_distill_step,
    make_compos_distill_step,
    make_recon_train_step,
)


@dataclasses.dataclass
class TrainerConfig:
    max_steps: int = 2000
    batch_size: int = 3
    accumulate_grad_batches: int = 2
    grad_clip: float = 0.5  # `main.py` grad_clip default
    learning_rate: float = 7e-4
    # LR scaled by accum x devices x batch unless disabled
    # (`main.py:1201-1209`, scale_lr default True); applies to the AdamW
    # path only — Prodigy runs at LR 1 with adapted d (`ddpm.py:5192-5209`)
    scale_lr: bool = True
    # dp mesh size (the `--gpus` analog, `main.py:862` DDP): >1 builds a
    # jax.sharding.Mesh; batches shard over dp, the frozen backbone +
    # trainables replicate, optimizer state shards ZeRO-1, and `batch_size`
    # keeps the reference's PER-DEVICE meaning (global batch = bs x dp,
    # which is exactly what the LR scaling above assumes). -1 = all
    # available devices.
    num_devices: int = 1
    use_prodigy: bool = True  # zero-shot default (`ddpm.py:5192-5209`)
    d_coef: float = 10.0
    ckpt_every_steps: int = 500
    log_every_steps: int = 10
    bg_recon_weight: float = 0.1
    # recon-iter complementary-loss battery weights
    # (`v1-finetune-ada.yaml:46-54`)
    fg_bg_complementary_loss_weight: float = 2e-4
    fg_bg_xlayer_consist_loss_weight: float = 5e-5
    fg_wds_complementary_loss_weight: float = 0.0  # 0 in the shipped config
    # webdataset background compositing for recon iters
    # (`personalized.py:607-824`; wds instances use a discounted bg weight,
    # `ddpm.py:2917-2946`)
    wds_shards: tuple = ()
    # per-iteration-type composite probabilities (`ddpm.py:1485-1499`):
    # 5% of recon iters use the fg-over-new-bg overlay (more makes the
    # subject embeddings attend to the overlay background); 20% of compos
    # iters start from the bg-ONLY image (subject not overlaid)
    p_wds_comp_recon: float = 0.05
    p_wds_comp_compos: float = 0.2
    wds_bg_recon_weight: float = 0.05
    # dedicated wds background placeholder substituted for the ordinary bg
    # token in wds `_bg` captions (`repl_bg_as_wbg`, `personalized.py:982`,
    # `--wds_background_string` default 'w'); applied only when registered
    # as a placeholder (scripts/train.py does so when wds shards are on)
    wds_background_string: str = "w"
    # compel-style CFG embedding weighting of compos-iter contexts
    # (`v1-finetune-ada.yaml:50-52`: prob 0.5, level range [2, 2];
    # disabled whenever zero-shot features ride along, `ddpm.py:979-988`)
    apply_compel_cfg_prob: float = 0.0
    compel_cfg_weight_level_range: tuple = (2.0, 2.0)
    # per-iteration Dirichlet resampling of the CLIP clip-skip blend
    # weights (`--randomize_clip_skip_weights`, `modules.py:410-435`; alpha
    # = the RAW configured weights, `main.py:331-338`; every training
    # encode resamples, `ddpm.py:973-974`)
    randomize_clip_skip_weights: bool = False
    clip_skip_weights_alpha: tuple = (1.0, 1.0)
    # EMA shadow of the trainable embedders (`ldm/modules/ema.py` LitEma;
    # off by default like `v1-finetune-ada.yaml:25`)
    use_ema: bool = False
    ema_decay: float = 0.9999
    # validation pass every N steps (0 = off): recon loss battery on batches
    # drawn from a separate val stream over the SAME images (the reference's
    # DataModule builds a val `PersonalizedBase` over the same folder with a
    # smaller repeat count, `main.py:447-545` + `v1-finetune-ada.yaml:168-173`)
    # and logs `val/`-prefixed metrics (`ddpm.py:645-651` validation_step,
    # `ddpm.py:5528` train/validation log prefixing) + a val sample grid via
    # the ImageLogger (`main.py:694-699` on_validation_batch_end).
    val_every_steps: int = 0
    val_batches: int = 2
    seed: int = 0
    logdir: str = "logs/run"


class Trainer:
    def __init__(self, pipeline, dataset: PersonalizedDataset,
                 cfg: TrainerConfig = TrainerConfig(),
                 plan_cfg: IterPlanConfig = IterPlanConfig()):
        self.pipe = pipeline
        self.dataset = dataset
        if cfg.num_devices == -1:
            cfg = dataclasses.replace(cfg, num_devices=len(jax.devices()))
        self.cfg = cfg
        # dp mesh (the Lightning-DDP analog, `main.py:862`): one jitted
        # program over all chips, batches sharded on the batch dim, XLA
        # all-reducing grads over ICI (SURVEY §2.8). num_devices==1 keeps
        # everything on the default device with zero overhead.
        self.mesh = None
        self._dp = max(cfg.num_devices, 1)
        if cfg.num_devices > 1:
            from adaface_tpu.parallel.mesh import make_mesh

            self.mesh = make_mesh(cfg.num_devices)
        self.plan_cfg = dataclasses.replace(plan_cfg, max_steps=cfg.max_steps)
        self.rng = np.random.default_rng(cfg.seed)
        # Multi-subject (corpus) datasets skip non-face subjects — the
        # reference only builds a SubjectSampler when num_subjects > 1 and
        # then hardcodes skip_non_faces=True (`main.py:498-507`); a single
        # (possibly non-face) subject is plain shuffling, never skipped.
        self.sampler = SubjectSampler(
            dataset, skip_non_faces=len(dataset.subjects) > 1,
            seed=cfg.seed)
        self.mgr: EmbeddingManager = pipeline.embedding_manager
        self.global_step = 0
        self._sig_ckpt_requested = False

        os.makedirs(cfg.logdir, exist_ok=True)
        self._log_f = open(os.path.join(cfg.logdir, "metrics.jsonl"), "a")

        # ---- optimizer: Prodigy or AdamW, + clip + accumulation
        if cfg.use_prodigy:
            from adaface_tpu.training.prodigy import prodigy

            base = prodigy(learning_rate=1.0, d_coef=cfg.d_coef)
        else:
            lr = cfg.learning_rate
            if cfg.scale_lr:
                # `main.py:1201-1209`: lr = accum * ndev * bs * base_lr
                lr *= (cfg.accumulate_grad_batches * cfg.num_devices
                       * cfg.batch_size)
            base = optax.adamw(lr)
        opt = optax.chain(optax.clip_by_global_norm(cfg.grad_clip), base)
        self.optimizer = optax.MultiSteps(
            opt, every_k_schedule=cfg.accumulate_grad_batches)
        self.opt_state = self.optimizer.init(self.mgr.embedders)

        # ---- jitted step variants (compiled lazily per iter type / S)
        p = self.pipe
        self._bg_placeholders = frozenset(
            s for s, info in self.mgr.placeholders.items()
            if getattr(info, "is_background", False))
        # Prodigy damping + zero-shot disabling of the always-on regs
        # (`ddpm.py:3203-3213`): Prodigy suppresses embeddings, so emb-reg
        # and prompt-delta scale 0.5; zero-shot additionally kills emb reg
        # and /5 the delta reg (effective 2e-5)
        delta_scale = 0.5 if cfg.use_prodigy else 1.0
        if self.plan_cfg.do_zero_shot:
            delta_scale /= 5
        self._delta_w = (self.plan_cfg.prompt_emb_delta_reg_weight
                         * delta_scale)
        self._emb_reg_w = (0.0 if self.plan_cfg.do_zero_shot
                           else 2e-4 * (0.5 if cfg.use_prodigy else 1.0))
        self._steps: Dict[tuple, object] = {}
        self._recon_steps: Dict[tuple, object] = {}
        self._a2f_steps: Dict[tuple, object] = {}
        # frozen backbone as explicit jit ARGUMENTS (closed-over params
        # would embed as HLO constants — oversized programs for the
        # remote-compile transport on real chips)
        self._frozen = {"clip": p.clip_params, "unet": p.unet_params}
        if cfg.apply_compel_cfg_prob > 0:
            # empty-prompt context, first layer only (`ddpm.py:806-808`)
            self._frozen["empty_ctx"] = p.encode_negative("", 1)[0]
        self.ema_state = None
        if cfg.use_ema:
            from adaface_tpu.training.ema import ema_init

            self.ema_state = ema_init(self.mgr.embedders)
        self._encode_vae = jax.jit(
            lambda params, x: p.vae.apply({"params": params}, x,
                                          method=AutoencoderKL.encode))
        self.compositor = None
        if cfg.wds_shards:
            from adaface_tpu.data.wds import BackgroundCompositor

            self.compositor = BackgroundCompositor(
                list(cfg.wds_shards), size=dataset.size)
        # optional compositional-iteration plumbing
        self.teacher_filter = None  # set via set_teacher_filter()
        self.cached_inits = None
        self.image_logger = None
        # validation stream: the same images under an independent RNG — the
        # reference instantiates a second PersonalizedBase over the same
        # folder for val (`v1-finetune-ada.yaml:168-173`, repeats 10 vs 100)
        self._val_sampler = None
        if cfg.val_every_steps > 0:
            import copy

            self._val_dataset = copy.copy(dataset)
            self._val_dataset.rng = np.random.default_rng(cfg.seed + 1017)
            self._val_sampler = SubjectSampler(
                self._val_dataset, skip_non_faces=len(dataset.subjects) > 1,
                seed=cfg.seed + 1017)
            self._val_rng = np.random.default_rng(cfg.seed + 1017)
        signal.signal(signal.SIGUSR1, self._on_sigusr1)
        # SIGUSR2 -> debugger at the next safe point (the reference drops
        # into pudb, `main.py:1217-1234`)
        signal.signal(signal.SIGUSR2, self._on_sigusr2)
        self._mesh_place_state()

    # ------------------------------------------------------------- multi-chip
    def _mesh_place_state(self):
        """Pin training state to the dp mesh: trainables + frozen backbone
        replicated, optimizer state ZeRO-1-sharded (`parallel/mesh.py`).
        jit propagates these layouts through every step — batches arrive
        dp-sharded via `_call_step`, so XLA inserts the grad all-reduce
        (the NCCL analog, SURVEY §2.8) and keeps the optimizer update
        sharded. No-op on a single device."""
        if self.mesh is None:
            return
        from adaface_tpu.parallel.mesh import replicate_params, shard_opt_state

        self.mgr.embedders = replicate_params(self.mesh, self.mgr.embedders)
        self.opt_state = shard_opt_state(self.mesh, self.opt_state)
        self._frozen = replicate_params(self.mesh, self._frozen)
        if self.ema_state is not None:
            self.ema_state = replicate_params(self.mesh, self.ema_state)
        self._teacher_r = None  # lazily-replicated arc2face teacher params

    def _replicated_teacher(self, teacher_params):
        """Replicate the (user-supplied) arc2face teacher UNet params over
        the mesh once; single-device committed arrays can't mix with
        mesh-sharded arguments in one jit call."""
        if self.mesh is None:
            return teacher_params
        if getattr(self, "_teacher_r", None) is None:
            from adaface_tpu.parallel.mesh import replicate_params

            self._teacher_r = replicate_params(self.mesh, teacher_params)
        return self._teacher_r

    def _call_step(self, step, trainables, opt_state, batch, frozen=None):
        """Invoke a jitted train step, dp-sharding the batch first when a
        mesh is active (computation follows data — the one compiled step
        serves both the single-chip and mesh layouts per batch shape)."""
        if self.mesh is not None:
            from adaface_tpu.parallel.mesh import shard_train_batch

            batch = shard_train_batch(self.mesh, batch)
        if frozen is None:
            return step(trainables, opt_state, batch)
        return step(trainables, opt_state, batch, frozen)

    def set_teacher_filter(self, clip_scorer, **filter_kw):
        """Enable CLIP teacher filtering + reuse-init caching for
        compositional iterations (`ddpm.py:3039-3180`). `filter_kw` passes
        through to `TeacherFilter` (clip_loss_thres, cls_subj_clip_margin,
        student_cfg_scale, teacher_cfg_scale) for parity experiments."""
        from adaface_tpu.training.teacher_filter import CachedInits, TeacherFilter

        p = self.pipe
        self.teacher_filter = TeacherFilter(
            clip_scorer, p.unet, p.unet_params, p.vae, p.vae_params,
            p.base_sched, **filter_kw)
        self.cached_inits = CachedInits()

    def set_image_logger(self, every_steps: int = 500, **kw):
        from adaface_tpu.training.image_logger import ImageLogger

        self.image_logger = ImageLogger(self.cfg.logdir,
                                        every_steps=every_steps, **kw)

    # ------------------------------------------------------------- plumbing
    def _on_sigusr1(self, *_):
        self._sig_ckpt_requested = True

    def _on_sigusr2(self, *_):
        import pdb

        pdb.set_trace()

    def _log(self, metrics: Dict, plan: IterPlan):
        rec = {"step": self.global_step, "iter_type": plan.iter_type,
               "emb_noise_std": float(plan.emb_noise_std),
               "comp_init_fg": float(plan.comp_init_fg_from_training_image),
               "reuse_init": float(plan.reuse_init_conds),
               "wds_comp": float(plan.use_wds_comp)}
        rec.update({k: float(v) for k, v in metrics.items()})
        if not all(np.isfinite(v) for v in rec.values()
                   if isinstance(v, float)):
            # the reference traps NaN losses with a breakpoint
            # (`ddpm.py:3448`); here: emergency checkpoint + hard stop
            self.save_checkpoint("nonfinite")
            raise FloatingPointError(
                f"non-finite metric at step {self.global_step}: {rec}")
        self._log_f.write(json.dumps(rec) + "\n")
        self._log_f.flush()
        if self.global_step % self.cfg.log_every_steps == 0:
            msg = " ".join(f"{k}={v:.4f}" for k, v in rec.items()
                           if isinstance(v, float))
            print(f"[{self.global_step}/{self.cfg.max_steps}] "
                  f"{plan.iter_type}: {msg}", flush=True)

    def save_checkpoint(self, tag: Optional[str] = None):
        tag = tag or f"gs-{self.global_step}"
        path = os.path.join(self.cfg.logdir, f"embeddings_{tag}.npz")
        if self.ema_state is not None:
            # checkpoint the EMA shadow (the reference's `ema_scope`
            # copy-to/restore around save, `ddpm.py:310-323`)
            live = self.mgr.embedders
            self.mgr.embedders = self.ema_state.shadow
            try:
                self.mgr.save_native(path)
            finally:
                self.mgr.embedders = live
        else:
            self.mgr.save_native(path)
        print(f"saved {path}", flush=True)
        return path

    # ------------------------------------------------------ full train state
    def save_state(self, path: Optional[str] = None) -> str:
        """Full resumable state: embedders + optimizer state + step + host
        RNG. The reference's Lightning `last.ckpt` analog (`main.py:800-818`);
        `save_checkpoint` remains the pruned, embeddings-only artifact (the
        `ldm/pruner.py` equivalent)."""
        import pickle

        path = path or os.path.join(self.cfg.logdir, "train_state.pkl")
        state = {
            "global_step": self.global_step,
            "embedders": jax.device_get(self.mgr.embedders),
            "opt_state": jax.device_get(self.opt_state),
            "rng_state": self.rng.bit_generator.state,
            "dataset_rng_state": self.dataset.rng.bit_generator.state,
            "ema_state": (jax.device_get(self.ema_state)
                          if self.ema_state is not None else None),
        }
        with open(path, "wb") as f:
            pickle.dump(state, f)
        print(f"saved train state {path} (step {self.global_step})", flush=True)
        return path

    def load_state(self, path: str):
        import pickle

        with open(path, "rb") as f:
            state = pickle.load(f)
        self.global_step = state["global_step"]
        self.mgr.embedders = jax.tree_util.tree_map(jnp.asarray,
                                                    state["embedders"])
        self.opt_state = jax.tree_util.tree_map(
            lambda x: jnp.asarray(x) if hasattr(x, "dtype") else x,
            state["opt_state"])
        self.rng.bit_generator.state = state["rng_state"]
        self.dataset.rng.bit_generator.state = state["dataset_rng_state"]
        if state.get("ema_state") is not None:
            from adaface_tpu.training.ema import EmaState

            self.ema_state = EmaState(*jax.tree_util.tree_map(
                jnp.asarray, tuple(state["ema_state"])))
        self._mesh_place_state()
        print(f"resumed from {path} at step {self.global_step}", flush=True)
        return self

    # ----------------------------------------------------------- batch prep
    def _draw_examples(self, n: int):
        # One subject drawn per INSTANCE (`SubjectSampler.__iter__`,
        # `personalized.py:1039-1041` yields a fresh subject per dataset
        # fetch) — batches MIX subjects in corpus (zero-shot) training;
        # single-subject fine-tuning has one subject so this is identity.
        # Compos iters pass n=1 and repeat it, matching the reference's
        # `same_subject_in_batch` collapse (`ddpm.py:1700-1710`).
        return [self.dataset[(self.sampler.sample(), True)] for _ in range(n)]

    def _latents(self, images: np.ndarray) -> jnp.ndarray:
        mean, logvar = self._encode_vae(self.pipe.vae_params,
                                        jnp.asarray(images))
        # deterministic mode like `encode_first_stage` at train time would
        # sample; the posterior std is small — use mean + scale
        return mean * SD_VAE_SCALE_FACTOR

    def _mask_to_latent(self, mask: np.ndarray, lh: int, lw: int) -> np.ndarray:
        m = mask.astype(np.float32)
        ri = (np.arange(lh) * (m.shape[1] / lh)).astype(np.int64)
        ci = (np.arange(lw) * (m.shape[2] / lw)).astype(np.int64)
        return m[:, ri][:, :, ci][..., None]

    def _skip_weights_kw(self) -> dict:
        """Per-iteration Dirichlet clip-skip draw (`ddpm.py:973-974`) —
        batch kwargs for any train-step batch type, empty when the
        randomization is off (the step then uses the configured constant)."""
        if not self.cfg.randomize_clip_skip_weights:
            return {}
        w = self.rng.dirichlet(
            np.asarray(self.cfg.clip_skip_weights_alpha, np.float64))
        return {"skip_weights": jnp.asarray(w, jnp.float32)}

    def _prompt_batch(self, examples, key: str):
        prompts = [e[key] if key in e else e["caption"] for e in examples]
        # comp prompts pack num_compositions variants with '|'; take the first
        prompts = [p.split("|")[0] for p in prompts]
        ids = self.pipe.tokenizer(prompts)
        slot_maps = self.mgr.build_slot_maps(ids)
        return jnp.asarray(ids), {k: jnp.asarray(v) for k, v in slot_maps.items()}

    # ---------------------------------------------------------------- steps
    def _get_compos_step(self):
        """Jitted compositional step, keyed (like every trainer step cache)
        on knobs.fingerprint() so an in-process ADAFACE_* flip retraces
        instead of reusing the arm baked in at first trace."""
        from adaface_tpu import knobs

        key = (COMPOS_DISTILL, knobs.fingerprint())
        if key not in self._steps:
            p = self.pipe
            self._steps[key] = jax.jit(make_compos_distill_step(
                p.clip, p.clip_params, p.unet, p.unet_params, p.base_sched,
                self.optimizer, skip_weights=p.skip_weights,
                prompt_delta_weight=self._delta_w,
                mix_prompt_distill_weight=(
                    self.plan_cfg.mix_prompt_distill_weight),
                do_zero_shot=self.plan_cfg.do_zero_shot,
                bg_placeholders=self._bg_placeholders))
        return self._steps[key]

    def _get_recon_step(self, use_bg_token: bool, use_wds: bool):
        """Jitted recon-step variant per (bg-token, wds) combination — each
        changes the static loss battery (`calc_recon_and_complem_losses`
        dispatch, `ddpm.py:2917-2946,3457-3565`)."""
        from adaface_tpu import knobs

        key = (use_bg_token, use_wds, knobs.fingerprint())
        if key not in self._recon_steps:
            p, cfg = self.pipe, self.cfg
            self._recon_steps[key] = jax.jit(make_recon_train_step(
                p.clip, p.clip_params, p.unet, p.unet_params, p.base_sched,
                self.optimizer, skip_weights=p.skip_weights,
                bg_weight=(cfg.wds_bg_recon_weight if use_wds
                           else cfg.bg_recon_weight if use_bg_token
                           else 0.0),
                emb_reg_weight=self._emb_reg_w,
                prompt_delta_weight=self._delta_w,
                complem_weight=cfg.fg_bg_complementary_loss_weight,
                xlayer_weight=cfg.fg_bg_xlayer_consist_loss_weight,
                wds_complem_weight=(cfg.fg_wds_complementary_loss_weight
                                    if use_wds else 0.0),
                use_bg_token=use_bg_token,
                do_zero_shot=self.plan_cfg.do_zero_shot,
                bg_placeholders=self._bg_placeholders))
        return self._recon_steps[key]

    def _get_val_loss(self):
        """Jitted loss-only recon program for the validation pass — the
        same battery as the plain recon train step (weights included), no
        backward/optimizer."""
        from adaface_tpu import knobs

        key = ("val", knobs.fingerprint())
        if key not in self._steps:
            p, cfg = self.pipe, self.cfg
            raw = make_recon_train_step(
                p.clip, p.clip_params, p.unet, p.unet_params, p.base_sched,
                self.optimizer, skip_weights=p.skip_weights,
                bg_weight=0.0,
                emb_reg_weight=self._emb_reg_w,
                prompt_delta_weight=0.0,
                complem_weight=cfg.fg_bg_complementary_loss_weight,
                xlayer_weight=cfg.fg_bg_xlayer_consist_loss_weight,
                use_bg_token=False,
                do_zero_shot=self.plan_cfg.do_zero_shot,
                bg_placeholders=self._bg_placeholders)
            self._steps[key] = jax.jit(raw.loss_fn)
        return self._steps[key]

    def _val_batch(self, B: int) -> ReconBatch:
        ds, rng = self._val_dataset, self._val_rng
        ex = [ds[(self._val_sampler.sample(), True)] for _ in range(B)]
        batch_np = collate_examples(ex)
        latents = self._latents(batch_np["image"])
        lh, lw = latents.shape[1:3]
        ids, slots = self._prompt_batch(ex, "caption")
        plan = IterPlan(iter_type=RECON,
                        training_percent=self.global_step
                        / max(self.cfg.max_steps, 1))
        t = sample_timesteps(rng, plan, B, self.plan_cfg)
        return ReconBatch(
            latents=latents, token_ids=ids, slot_maps=slots,
            fg_mask=jnp.asarray(
                self._mask_to_latent(batch_np["fg_mask"], lh, lw)),
            timesteps=jnp.asarray(t, jnp.int32),
            noise=jnp.asarray(rng.standard_normal(latents.shape),
                              jnp.float32),
            img_mask=jnp.asarray(
                self._mask_to_latent(batch_np["aug_mask"], lh, lw)),
            have_fg_mask=jnp.asarray(
                [float(e.get("has_fg_mask", True)) for e in ex], jnp.float32))

    def run_validation(self) -> Dict[str, float]:
        """One validation pass (`DDPM.validation_step`, `ddpm.py:645-651`):
        the recon loss battery under no-grad on `val_batches` batches from
        the val stream, logged with the reference's `val/` prefix
        (`ddpm.py:5528`); with EMA on, a second pass over the shadow
        weights logs `val/*_ema` exactly like the reference's
        `ema_scope()` arm."""
        if self._val_sampler is None:
            raise RuntimeError(
                "validation stream not built — construct the trainer with "
                "TrainerConfig(val_every_steps > 0) (or train.py "
                "--val_every N)")
        B = self.cfg.batch_size * self._dp
        loss_fn = self._get_val_loss()
        arms = [("", self.mgr.embedders)]
        if self.ema_state is not None:
            arms.append(("_ema", self.ema_state.shadow))
        sums: Dict[str, float] = {}
        for _ in range(self.cfg.val_batches):
            batch = self._val_batch(B)
            if self.mesh is not None:
                from adaface_tpu.parallel.mesh import shard_train_batch

                batch = shard_train_batch(self.mesh, batch)
            for suffix, emb in arms:
                _, metrics = loss_fn(emb, batch, self._frozen)
                for k, v in metrics.items():
                    sums[k + suffix] = sums.get(k + suffix, 0.0) + float(v)
        rec: Dict = {"step": self.global_step}
        rec.update({f"val/{k}": v / self.cfg.val_batches
                    for k, v in sums.items()})
        self._log_f.write(json.dumps(rec) + "\n")
        self._log_f.flush()
        msg = " ".join(f"{k}={v:.4f}" for k, v in rec.items() if k != "step")
        print(f"[{self.global_step}/{self.cfg.max_steps}] val: {msg}",
              flush=True)
        if self.image_logger is not None:
            # val sample grid (`main.py:694-699` on_validation_batch_end)
            ex = self._val_dataset[(self._val_sampler.sample(), True)]
            self.image_logger.log_samples(self.global_step, self.pipe,
                                          ex["subj_prompt_single"],
                                          tag="val_samples")
        return rec

    def _subject_spec(self, e: dict):
        """The SubjectSpec an example was drawn from (multi-subject zs
        corpora have per-subject cls_delta_strings)."""
        return next((s for s in self.dataset.subjects
                     if s.name == e.get("subject_name")),
                    self.dataset.subjects[0])

    def _composite(self, e: dict) -> None:
        """Fill the wds_* example keys; the wds bg placeholder substitution
        applies only when its embedder is actually registered."""
        spec = self._subject_spec(e)
        wbg = self.cfg.wds_background_string
        if wbg not in getattr(self.mgr, "placeholders", {}):
            wbg = None
        self.compositor.composite(e, spec.cls_delta_string,
                                  background_string=spec.background_string,
                                  wds_background_string=wbg)

    def _delta_prompt_battery(self, plan: IterPlan, ex):
        """4-type delta-prompt battery for the always-on static
        prompt-delta regularizer on RECON iters (`ddpm.py:1954-2005`:
        BLOCK_SIZE = the full batch, bg suffix per plan, never fp; wds
        iters swap the comp extras, `ddpm.py:1660-1670`). Returns
        (token_ids [4B, T], slot_maps) or None when the reg is off."""
        if self._delta_w <= 0:
            return None
        keys = ["subj_prompt_single", "subj_prompt_comp",
                "cls_prompt_single", "cls_prompt_comp"]
        sfx = "_bg" if (plan.use_background_token and all(
            k + "_bg" in e for e in ex for k in keys)) else ""
        dp = [e[k + sfx].split("|")[0] for k in keys for e in ex]
        if plan.use_wds_comp:
            B = len(ex)
            for i, e in enumerate(ex):
                extra = e.get("wds_comp_extra", "")
                if extra:
                    dp[B + i] = dp[i] + extra          # subj_comp
                    dp[3 * B + i] = dp[2 * B + i] + extra  # cls_comp
        ids = self.pipe.tokenizer(dp)
        slots = self.mgr.build_slot_maps(ids)
        return (jnp.asarray(ids),
                {k: jnp.asarray(v) for k, v in slots.items()})

    def _wds_extra_mask(self, ids: np.ndarray, slots: Dict,
                        extend_subj_by_one: bool = False) -> np.ndarray:
        """[B, T] comp-extra token mask for wds instances: real WORD tokens
        (not BOS and not EOS/padding — the reference's `prompt_emb_mask`,
        `embedding_manager.py:1642`) that are neither subject nor bg slots
        (`ddpm.py:3498-3524`). With wds CLS captions the class token
        immediately follows the subject tokens and must count as subject,
        not extra (`extend_indices_N_by_n_times(..., n=1)`,
        `ddpm.py:3506-3512`)."""
        ids = np.asarray(ids)
        tok = self.pipe.tokenizer
        real = ((ids != tok.bos_id) & (ids != tok.eos_id)).astype(np.float32)
        for s, m in slots.items():
            pos = np.asarray(m) >= 0
            is_bg = (s in getattr(self, "bg_placeholders", ()) or
                     (s in getattr(self.mgr, "placeholders", {})
                      and self.mgr.placeholders[s].is_background))
            if extend_subj_by_one and not is_bg:
                ext = np.zeros_like(pos)
                ext[:, 1:] = pos[:, :-1]
                pos = pos | ext
            real = real * (~pos)
        return real

    def _wds_recon_swap(self, plan: IterPlan, ex) -> tuple:
        """Roll + apply the recon-iter wds composite (`ddpm.py:1493-1532`):
        image -> fg-over-new-bg overlay, captions -> wds variants (the CLS
        flavor — class token appended after the subject — at an annealed
        probability 0.6 -> 0.1 over the first half of training,
        `ddpm.py:1517-1527`). Mutates `plan` IN PLACE (the caller's `fit`
        loop logs from the same object). Returns (plan, use_wds,
        use_wds_cls)."""
        use_wds = (self.compositor is not None
                   and self.rng.random() < self.cfg.p_wds_comp_recon)
        use_wds_cls = False
        if use_wds:
            for e in ex:
                self._composite(e)
            use_wds = all(e.get("has_wds_comp") for e in ex)
        if use_wds:
            p_cls = anneal_value(plan.training_percent, 0.5, (0.6, 0.1))
            use_wds_cls = (self.rng.random() < p_cls
                           and all("wds_cls_caption" in e for e in ex))
            ck = "wds_cls_caption" if use_wds_cls else "wds_caption"
            for e in ex:
                e["image"] = e["wds_image"]
                e["caption"] = e[ck]
                e["caption_bg"] = e.get(ck + "_bg", e[ck])
            # wds recon iters use the bg token at p=0.95 instead of 0.9
            # (`ddpm.py:1565-1567`): the plan rolled 0.9 before knowing
            # use_wds, so upgrade the misses at 0.5 (0.9 + 0.1*0.5 = 0.95)
            if not plan.use_background_token and self.rng.random() < 0.5:
                plan.use_background_token = True
            plan.use_wds_comp = True
        return plan, use_wds, use_wds_cls

    def _run_recon(self, plan: IterPlan):
        # batch_size is PER-DEVICE (the reference's Lightning DDP meaning);
        # the global batch spans the dp mesh and shards on the batch dim
        B = self.cfg.batch_size * self._dp
        ex = self._draw_examples(B)
        plan, use_wds, use_wds_cls = self._wds_recon_swap(plan, ex)
        batch_np = collate_examples(ex)
        latents = self._latents(batch_np["image"])
        lh, lw = latents.shape[1:3]
        key = "caption_bg" if plan.use_background_token else "caption"
        ids, slots = self._prompt_batch(ex, key)
        t = sample_timesteps(self.rng, plan, B, self.plan_cfg)
        noise_kw = {}
        if plan.emb_noise_std > 0:
            noise_kw = dict(
                emb_noise_std=jnp.asarray(plan.emb_noise_std, jnp.float32),
                emb_noise_key=jax.random.PRNGKey(
                    int(self.rng.integers(2 ** 31))))
        if use_wds and self.cfg.fg_wds_complementary_loss_weight > 0:
            noise_kw["wds_extra_token_mask"] = jnp.asarray(
                self._wds_extra_mask(ids, slots,
                                     extend_subj_by_one=use_wds_cls))
        delta = self._delta_prompt_battery(plan, ex)
        if delta is not None:
            noise_kw["delta_token_ids"], noise_kw["delta_slot_maps"] = delta
        batch = ReconBatch(
            latents=latents,
            token_ids=ids, slot_maps=slots,
            fg_mask=jnp.asarray(self._mask_to_latent(batch_np["fg_mask"], lh, lw)),
            timesteps=jnp.asarray(t, jnp.int32),
            noise=jnp.asarray(self.rng.standard_normal(latents.shape),
                              jnp.float32),
            img_mask=jnp.asarray(
                self._mask_to_latent(batch_np["aug_mask"], lh, lw)),
            have_fg_mask=jnp.asarray(
                [float(e.get("has_fg_mask", True)) for e in ex], jnp.float32),
            **self._skip_weights_kw(), **noise_kw)
        step = self._get_recon_step(plan.use_background_token, use_wds)
        self.mgr.embedders, self.opt_state, metrics = self._call_step(
            step, self.mgr.embedders, self.opt_state, batch, self._frozen)
        return metrics

    def _compos_x_start(self, plan: IterPlan, ex: list, latents, fg_latent,
                        prompts):
        """Reuse-init restore or fresh x_start-mode dispatch, shared by the
        static and zero-shot compos paths. On reuse the cached iteration's
        FULL conditioning is restored — the 4-type prompt battery and
        use_background_token (`ddpm.py:1903-1915`) along with x_start/t/
        fg_mask — because the cached reconstruction was denoised UNDER
        those prompts ("the 4 types of prompts have to be the same as this
        iter"); distilling it under freshly-sampled prompts would pair the
        teacher's composition with the wrong text.

        `ex` is the CB-block example list (CB = 1 single-device, dp over a
        mesh — one block per chip, the per-rank BLOCK_SIZE=1 analog).
        Reuse-init fires only when EVERY block's subject has a cached
        entry and the cached iteration flags agree (the flags are
        batch-global under SPMD); otherwise all blocks run fresh and the
        entries stay cached for a later uniform hit. Returns
        (latents, fg_latent, prompts [4*CB type-major], prev_t,
        cache_entries-or-None)."""
        CB = len(ex)
        prev_t, entries = None, None
        flag_keys = ("use_background_token",
                     "comp_init_fg_from_training_image", "use_wds_comp")
        if self.cached_inits is not None:
            cand = [self.cached_inits.peek(e["subject_name"]) for e in ex]
            if all(c is not None for c in cand) and all(
                    all(bool(c.get(k, False)) == bool(cand[0].get(k, False))
                        for k in flag_keys) for c in cand):
                # pop once per UNIQUE subject (blocks may repeat a subject
                # — e.g. a single-subject corpus — and share its entry)
                popped = {e["subject_name"]: None for e in ex}
                for name in popped:
                    popped[name] = self.cached_inits.pop(name)
                entries = [popped[e["subject_name"]] for e in ex]
        if entries is not None:
            # reuse-init follow-up iteration at mid-range t (`ddpm.py:2604-2635`)
            latents = jnp.concatenate(
                [jnp.asarray(c["x_start"][:1]) for c in entries])
            prev_t = np.concatenate([np.asarray(c["t"][:1])
                                     for c in entries])
            if all(c.get("fg_mask") is not None for c in entries):
                fg_latent = np.concatenate(
                    [np.asarray(c["fg_mask"])[:1] for c in entries])
            if all(c.get("prompts") is not None for c in entries):
                # each entry caches its block's [ss, sc, cs, cc]; rebuild
                # the type-major battery
                per = [list(c["prompts"]) for c in entries]
                prompts = [p[k] for k in range(4) for p in per]
            e0 = entries[0]
            plan.reuse_init_conds = True
            plan.do_teacher_filter = False
            plan.use_background_token = bool(
                e0.get("use_background_token", plan.use_background_token))
            # the previous iter's fg-init mode carries over (`ddpm.py:2609-2612`)
            plan.comp_init_fg_from_training_image = bool(
                e0.get("comp_init_fg_from_training_image", False))
            # ... as does use_wds_comp (`ddpm.py:1911`)
            plan.use_wds_comp = bool(e0.get("use_wds_comp", False))
        else:
            # fresh compos iter: x_start = training-image fg scaled onto
            # noise, or pure noise (`ddpm.py:2645-2664`). wds compos iters
            # keep x_start INTACT — the bg-only wds image's latents, no
            # fg transform, no noise fill (`ddpm.py:2651-2664`)
            if plan.use_wds_comp:
                pass
            elif (plan.comp_init_fg_from_training_image
                    and float(fg_latent.sum()) > 0):
                from adaface_tpu.training.x_init import (
                    init_x_with_fg_from_training_image,
                )

                x_np, fg_np = init_x_with_fg_from_training_image(
                    self.rng, np.asarray(latents), fg_latent,
                    plan.training_percent)
                latents = jnp.asarray(x_np)
                fg_latent = fg_np
            else:
                plan.comp_init_fg_from_training_image = False
                latents = jnp.asarray(
                    self.rng.standard_normal(latents.shape), jnp.float32)
        return latents, fg_latent, prompts, prev_t, entries

    def _cache_teacher_recon(self, e: dict, x_recon, t, fg_latent,
                             plan: IterPlan, prompts, **zs_extra):
        """Cache a best candidate's CFG reconstruction (under the SUBJECT
        context, `x_recon.chunk(2)[0]`, `ddpm.py:3144-3177`) together with
        the conditioning it was denoised under (this block's [ss, sc, cs,
        cc] prompts + use_background_token; zs features via `zs_extra` on
        the zero-shot path) — the follow-up reuse-init iteration restores
        all of it."""
        if self.cached_inits is None:
            return
        self.cached_inits.put(
            e["subject_name"], np.asarray(x_recon), t,
            fg_mask=np.asarray(fg_latent),
            prompts=list(prompts),
            use_background_token=bool(plan.use_background_token),
            comp_init_fg_from_training_image=bool(
                plan.comp_init_fg_from_training_image),
            use_wds_comp=bool(plan.use_wds_comp),
            **zs_extra)

    def _filter_verdict_per_block(self, verdict, n_cand: int, CB: int):
        """Per-block teachability — delegates to
        `TeacherFilter.per_block` so the thresholding formula lives in
        exactly one place next to its thresholds."""
        return self.teacher_filter.per_block(verdict, n_cand, CB)

    def _cache_filtered_blocks(self, ex, verdict, best, block_teachable,
                               cand_t, fg_latent, plan, prompts, n_cand,
                               zs_extra_fn=None):
        """Per-block reuse-init caching after teacher filtering: each
        teachable block caches ITS best candidate's subject-context
        reconstruction with its own 4 prompts and mask."""
        CB = len(ex)
        for b in range(CB):
            if not block_teachable[b]:
                continue
            i = int(best[b]) * CB + b
            extra = zs_extra_fn(b) if zs_extra_fn is not None else {}
            self._cache_teacher_recon(
                ex[b], verdict.x_recons[i:i + 1],
                np.asarray(cand_t)[i:i + 1],
                np.asarray(fg_latent)[b:b + 1],
                plan, [prompts[k * CB + b] for k in range(4)], **extra)

    def _wds_compos_swap(self, plan: IterPlan, ex: list) -> None:
        """Compos-iter wds composite (`ddpm.py:1488-1515`): 20% of compos
        iters start from the bg-ONLY wds image (subject not overlaid) kept
        intact as x_start, with `comp_init_fg_from_training_image` forced
        on (`ddpm.py:1536-1543`). Mutates `plan` and the examples in
        place; the comp-prompt extras swap happens in the caller (the
        prompts are known only after suffix selection). All-or-nothing
        across the CB blocks — the plan flags are batch-global."""
        if (self.compositor is None
                or self.rng.random() >= self.cfg.p_wds_comp_compos):
            return
        for e in ex:
            self._composite(e)
        if not all(e.get("has_wds_comp") for e in ex):
            return
        for e in ex:
            e["image"] = e["wds_image_bgonly"]
        plan.use_wds_comp = True
        plan.comp_init_fg_from_training_image = True

    def _wds_comp_prompts(self, plan: IterPlan, e: dict, prompts):
        """Replace the compositional extras with the wds background extra
        (`replace_prompt_comp_extra`, `ldm/util.py:2231-2245`, called from
        `ddpm.py:1660-1670`) — never the CLS flavor, since the 4-type
        battery carries the subject/class tokens already."""
        if not plan.use_wds_comp or not e.get("wds_comp_extra"):
            return prompts
        extra = e["wds_comp_extra"]
        return [prompts[0], prompts[0] + extra,
                prompts[2], prompts[2] + extra]

    def _compos_prompt_battery(self, plan: IterPlan, ex: list):
        """Type-major 4-type prompt battery over the CB blocks
        ([ss_0..ss_CB-1, sc_0.., cs_0.., cc_0..], matching the step's
        `ctx[:, :B]` slicing) with the richest suffix whose FULL battery
        exists in EVERY block (`ddpm.py:1588-1612`)."""
        bg = plan.use_background_token
        fp = plan.use_fp_trick

        def keys_for(suffix):
            return [f"subj_prompt_single{suffix}", f"subj_prompt_comp{suffix}",
                    f"cls_prompt_single{suffix}", f"cls_prompt_comp{suffix}"]

        suffix = ""
        for cand in (["_fp_bg"] if (fp and bg) else []) + \
                (["_fp"] if fp else []) + (["_bg"] if bg else []) + [""]:
            if all(k in e for e in ex for k in keys_for(cand)):
                suffix = cand
                break
        per_block = [
            self._wds_comp_prompts(
                plan, e, [e[k].split("|")[0] for k in keys_for(suffix)])
            for e in ex]
        return [p[k] for k in range(4) for p in per_block]

    def _run_compos(self, plan: IterPlan):
        # BLOCK_SIZE=1 per device (`ddpm.py:1971-2141`, one instance per
        # prompt type per rank); over a mesh one block per chip (CB = dp)
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
                # filtered_fg_mask semantics (`ddpm.py:2648-2650`): a
                # maskless instance must not "preserve" its all-1 default
                # mask (that would force-remember the background); zeroing
                # also disables fg-init via the sum() gate below
                fg_latent[b] = 0.0
        latents, fg_latent, prompts, prev_t, _ = self._compos_x_start(
            plan, ex, latents, fg_latent, prompts)
        # tokenize AFTER the cache check: a reuse-init iter restores the
        # cached iteration's prompt battery
        ids = self.pipe.tokenizer(prompts)
        slots = self.mgr.build_slot_maps(ids)
        subj_string = next(s for s, info in self.mgr.placeholders.items()
                           if not info.is_background)
        t = sample_timesteps(self.rng, plan, CB, self.plan_cfg, prev_t=prev_t)
        noise = jnp.asarray(self.rng.standard_normal(latents.shape), jnp.float32)

        if (self.teacher_filter is not None and plan.do_teacher_filter
                and not plan.reuse_init_conds):
            n_cand = self.plan_cfg.num_candidate_teachers
            cand_x = jnp.concatenate([latents] * n_cand)  # cand-major
            cand_noise = jnp.asarray(
                self.rng.standard_normal(cand_x.shape), jnp.float32)
            cand_t = jnp.asarray(
                sample_timesteps(self.rng, plan, n_cand * CB, self.plan_cfg),
                jnp.int32)
            ctx = self._compos_contexts(ids, slots, plan, cand_t)
            verdict = self.teacher_filter.filter(
                cand_x, cand_noise, cand_t,
                ctx["subj_comp"], ctx["mix_comp"], ctx["uncond"],
                prompts[3 * CB:] * n_cand)  # per-instance cc prompts
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
            # gather each block's best candidate (unteachable blocks keep
            # their best-scoring candidate — at CB==1 unreachable since
            # `ok` implies the single block is teachable)
            rows = np.asarray([int(best[b]) * CB + b for b in range(CB)])
            noise = cand_noise[rows]
            t = np.asarray(cand_t)[rows]
            self._cache_filtered_blocks(ex, verdict, best, block_ok, cand_t,
                                        fg_latent, plan, prompts, n_cand)

        compel_level, compel_mask = 0.0, None
        if self.cfg.apply_compel_cfg_prob > 0:
            from adaface_tpu.ops.compel import sample_compel_cfg

            compel_level, compel_mask = sample_compel_cfg(
                self.rng, self.cfg.apply_compel_cfg_prob,
                self.cfg.compel_cfg_weight_level_range,
                n_instances=4 * CB, is_training=True)
            if compel_mask is None:  # keep the jit signature stable
                compel_mask = jnp.ones((4 * CB,), jnp.float32)
        noise_kw = {}
        if plan.emb_noise_std > 0:
            noise_kw = dict(
                emb_noise_std=jnp.asarray(plan.emb_noise_std, jnp.float32),
                emb_noise_key=jax.random.PRNGKey(
                    int(self.rng.integers(2 ** 31))))
        batch = ComposBatch(
            token_ids=jnp.asarray(ids),
            slot_maps={k: jnp.asarray(v) for k, v in slots.items()},
            subj_slot_map=jnp.asarray(slots[subj_string]),
            latents=latents,
            fg_mask=jnp.asarray(fg_latent),
            timesteps=jnp.asarray(t, jnp.int32),
            noise=noise,
            t_frac=jnp.asarray(t / self.plan_cfg.num_timesteps, jnp.float32),
            training_percent=jnp.asarray(plan.training_percent, jnp.float32),
            compel_level=compel_level, compel_batch_mask=compel_mask,
            cls_mix_ranges=jnp.asarray(self._cls_mix_ranges(plan)),
            preserve_loss_scale=jnp.asarray(
                self._preserve_scale(plan), jnp.float32),
            **self._skip_weights_kw(), **noise_kw)
        self.mgr.embedders, self.opt_state, metrics = self._call_step(
            self._get_compos_step(), self.mgr.embedders, self.opt_state,
            batch, self._frozen)
        return metrics

    def _preserve_scale(self, plan: IterPlan) -> float:
        """Elastic-matching preserve battery scale (`ddpm.py:3284,
        3356-3363`): active only when x_start was fg-initialized from the
        training image; halved again on reuse-init iters (noisier)."""
        if not plan.comp_init_fg_from_training_image:
            return 0.0
        return 0.25 if plan.reuse_init_conds else 0.5

    def _cls_mix_ranges(self, plan: IterPlan) -> np.ndarray:
        """[k_lb, k_ub, v_lb, v_ub] class-mix scale ranges for the V/K
        teacher contexts (`ddpm.py:2577-2597`): zero-shot mixes more
        subject into V; fg-initialized iters mix slightly less."""
        fg_init = plan.comp_init_fg_from_training_image
        if self.plan_cfg.do_zero_shot:
            k = (1.0, 0.8)
            v = (1.0, 0.7) if fg_init else (1.0, 0.6)
        else:
            k = (1.0, 1.0)
            v = (1.0, 0.85) if fg_init else (1.0, 0.7)
        return np.asarray([*k, *v], np.float32)

    def _compos_contexts(self, ids, slots, plan, t):
        """(subj_comp, mix_comp, uncond) V/K contexts for the teacher
        filter's no-grad candidate denoise."""
        from adaface_tpu.personalization.static_embedding import (
            compute_static_embedding,
        )
        from adaface_tpu.training.mixing import mix_static_vk_embeddings

        p = self.pipe
        ctx = p.encode_prompts_from_ids(jnp.asarray(ids), slots) \
            if hasattr(p, "encode_prompts_from_ids") else None
        if ctx is None:
            embedded = p.clip.apply({"params": p.clip_params},
                                    jnp.asarray(ids),
                                    method=type(p.clip).embed_tokens)
            subj = {s: compute_static_embedding(e)
                    for s, e in self.mgr.embedders.items()}
            patched = self.mgr.patch_prompt_embeddings(
                embedded, {k: jnp.asarray(v) for k, v in slots.items()}, subj)
            L, B4, T, D = patched.shape
            ctx = p.clip.apply({"params": p.clip_params},
                               input_embeds=patched.reshape(L * B4, T, D),
                               skip_weights=jnp.asarray(p.skip_weights))
            ctx = ctx.reshape(L, B4, T, D)
        ctx = self._distribute_cls_ctx(ctx, slots)
        subj_slot = jnp.asarray(slots[next(
            s for s, i in self.mgr.placeholders.items()
            if not i.is_background)])
        return self._mix_ctx_for_filter(ctx, subj_slot, plan, t, ids.shape[1])

    def _distribute_cls_ctx(self, ctx, slots):
        """Distribute the class word over multi-vector pad slots in the cls
        halves of an encoded 4-type context (`ddpm.py:2039-2046`) — the
        filter-context twin of the in-step distribution."""
        B = ctx.shape[1] // 4
        cs, cc = ctx[:, 2 * B:3 * B], ctx[:, 3 * B:]
        for s in sorted(slots):
            sm = jnp.asarray(slots[s])[:B]
            cs = EmbeddingManager.distribute_cls_embeddings(cs, sm)
            cc = EmbeddingManager.distribute_cls_embeddings(cc, sm)
        return jnp.concatenate([ctx[:, :2 * B], cs, cc], axis=1)

    def _mix_ctx_for_filter(self, ctx, subj_slot, plan, t, T):
        """Shared tail of the teacher-filter context build: 4-type encoded
        contexts [L, 4B, T, D] -> (subj_comp, mix_comp, uncond) V/K pairs
        replicated num_candidate_teachers times. Used by both the static
        path and `ZeroShotTrainer` (`ddpm.py:3039-3131`)."""
        from adaface_tpu.training.mixing import mix_static_vk_embeddings

        B = ctx.shape[1] // 4
        subj_comp = ctx[:, B:2 * B]
        cls_comp = ctx[:, 3 * B:]
        subj_tok = (subj_slot[B:2 * B] >= 0).astype(jnp.float32)
        n_cand = self.plan_cfg.num_candidate_teachers
        sc = jnp.concatenate([subj_comp] * n_cand, axis=1)
        cc = jnp.concatenate([cls_comp] * n_cand, axis=1)
        st = jnp.concatenate([subj_tok] * n_cand, axis=0)
        t_frac = jnp.asarray(t / self.plan_cfg.num_timesteps, jnp.float32)
        r = self._cls_mix_ranges(plan)
        s_vk, m_vk = mix_static_vk_embeddings(
            sc, cc, st, plan.training_percent, t_frac,
            k_cls_scale_range=(r[0], r[1]), v_cls_scale_range=(r[2], r[3]))
        uncond = self.pipe.encode_negative("", n_cand * B)
        return {
            "subj_comp": (s_vk[:, :, :T], s_vk[:, :, T:]),
            "mix_comp": (m_vk[:, :, :T], m_vk[:, :, T:]),
            "uncond": uncond,
        }

    def _run_arc2face(self, plan: IterPlan, teacher):
        from adaface_tpu import knobs

        teacher_unet, teacher_params, teacher_ctx_fn = teacher
        S = plan.num_denoising_steps
        key = (S, plan.gen_arc2face_rand_face, knobs.fingerprint())
        if key not in self._a2f_steps:
            p = self.pipe
            self._a2f_steps[key] = jax.jit(make_arc2face_distill_step(
                p.clip, p.clip_params, p.unet, p.unet_params,
                teacher_unet, teacher_params, p.base_sched, self.optimizer,
                num_denoising_steps=S,
                use_fg_mask=not plan.gen_arc2face_rand_face))
        # multi-step iters shrink the batch to HALF_BS = ceil(BS/S)
        # (`torch.arange(BS).chunk(S)[0]`, `ddpm.py:1853-1878`);
        # single-step iters keep the full batch. Per-device, like recon.
        B = (-(-self.cfg.batch_size // S) if S > 1
             else self.cfg.batch_size) * self._dp
        ex = self._draw_examples(B)
        batch_np = collate_examples(ex)
        latents = self._latents(batch_np["image"])
        lh, lw = latents.shape[1:3]
        ids, slots = self._prompt_batch(ex, "caption")
        t = sample_timesteps(self.rng, plan, B, self.plan_cfg)
        teacher_ctx = teacher_ctx_fn(ex, plan)
        img_kw = {}
        if not plan.gen_arc2face_rand_face:
            # random-face iters carry no masks (`ddpm.py:1799-1800`)
            img_kw["img_mask"] = jnp.asarray(
                self._mask_to_latent(batch_np["aug_mask"], lh, lw))
        batch = Arc2FaceBatch(
            latents=latents,
            teacher_context=jnp.asarray(teacher_ctx, jnp.float32),
            token_ids=ids, slot_maps=slots,
            timesteps=jnp.asarray(t, jnp.int32),
            noises=jnp.asarray(self.rng.standard_normal((S,) + latents.shape),
                               jnp.float32),
            relative_ts=jnp.asarray(self.rng.uniform(size=(max(S - 1, 1), B)),
                                    jnp.float32),
            fg_mask=jnp.asarray(self._mask_to_latent(batch_np["fg_mask"], lh, lw)),
            **img_kw, **self._skip_weights_kw())
        frozen = dict(self._frozen)
        frozen["teacher"] = self._replicated_teacher(teacher_params)
        self.mgr.embedders, self.opt_state, metrics = self._call_step(
            self._a2f_steps[key], self.mgr.embedders, self.opt_state,
            batch, frozen)
        return metrics

    # ------------------------------------------------------------------ run
    def fit(self, num_steps: Optional[int] = None, arc2face_teacher=None):
        """Run the training loop. `arc2face_teacher`: optional
        (unet, params, ctx_fn(examples, plan) -> [B, T, D]) triple enabling
        arc2face distillation iterations."""
        n = num_steps or self.cfg.max_steps
        t0 = time.time()
        try:
            while self.global_step < n:
                plan = plan_iteration(self.rng, self.global_step, self.plan_cfg)
                if plan.iter_type == ARC2FACE_DISTILL and arc2face_teacher is None:
                    plan.iter_type = RECON
                if plan.iter_type == RECON:
                    metrics = self._run_recon(plan)
                elif plan.iter_type == COMPOS_DISTILL:
                    metrics = self._run_compos(plan)
                else:
                    metrics = self._run_arc2face(plan, arc2face_teacher)
                self._log(metrics, plan)
                if self.ema_state is not None:
                    from adaface_tpu.training.ema import ema_update

                    self.ema_state = ema_update(self.ema_state,
                                                self.mgr.embedders,
                                                self.cfg.ema_decay)
                self.global_step += 1
                if self._sig_ckpt_requested:
                    self.save_checkpoint()
                    self._sig_ckpt_requested = False
                if (self.cfg.val_every_steps > 0
                        and self.global_step % self.cfg.val_every_steps == 0):
                    self.run_validation()
                if self.global_step % self.cfg.ckpt_every_steps == 0:
                    self.save_checkpoint()
                    self.save_state()
                    self._log_run_summary(t0)
        except KeyboardInterrupt:
            # checkpoint on interrupt, like `main.py:559-563`
            self.save_checkpoint("interrupted")
            raise
        except Exception:
            # checkpoint on exception (`main.py:1241-1243` "melk")
            self.save_checkpoint("exception")
            self.save_state(os.path.join(self.cfg.logdir,
                                         "train_state_exception.pkl"))
            raise
        self.save_checkpoint("last")
        dt = time.time() - t0
        self._log_run_summary(t0)
        print(f"trained {self.global_step} steps in {dt:.1f}s "
              f"({self.global_step / max(dt, 1e-9):.2f} it/s)", flush=True)
        return self.mgr

    def _log_run_summary(self, t_start: float):
        """Wall-time + peak-device-memory run summary, the `CUDACallback`
        analog (`main.py:702-722` logs per-epoch wall seconds + DDP-reduced
        peak CUDA memory). Emitted into the metrics JSONL at checkpoint
        boundaries (the closest thing to an epoch here) and at fit() end;
        peak HBM via PJRT `memory_stats()` (absent on CPU backends)."""
        dt = time.time() - t_start
        rec: Dict = {"step": self.global_step, "run_summary": True,
                     "elapsed_s": round(dt, 2),
                     "steps_per_sec": round(self.global_step / max(dt, 1e-9), 4)}
        peaks = []
        for d in jax.local_devices()[:max(self._dp, 1)]:
            stats = getattr(d, "memory_stats", lambda: None)()
            if stats and "peak_bytes_in_use" in stats:
                peaks.append(stats["peak_bytes_in_use"])
        if peaks:
            rec["peak_hbm_gib"] = round(max(peaks) / 2**30, 3)
        self._log_f.write(json.dumps(rec) + "\n")
        self._log_f.flush()
        mem = (f", peak HBM {rec['peak_hbm_gib']:.2f} GiB"
               if "peak_hbm_gib" in rec else "")
        print(f"[summary] {self.global_step} steps, {dt:.1f}s "
              f"({rec['steps_per_sec']:.2f} it/s){mem}", flush=True)
