"""End-to-end subject-driven txt2img pipeline.

The TPU-native equivalent of `scripts/stable_txt2img.py` (L6/L7 of
SURVEY.md): tokenize -> patch placeholder embeddings (EmbeddingManager) ->
CLIP-encode the 16-layer prompt batch -> lax.scan DDIM/PLMS with annealed
CFG -> VAE decode. Everything device-side is jitted; compiled executables
are cached per (batch, size, steps) signature.

The layerwise prompt batch is encoded as ONE [L*B, 77, 768] CLIP forward —
big MXU-friendly matmuls instead of the reference's per-call python loop.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from adaface_tpu.data.tokenizer import TokenizerBase
from adaface_tpu.models.clip_text import CLIPTextConfig, CLIPTextEncoder
from adaface_tpu.models.unet import UNetConfig, UNetModel, NUM_CA_LAYERS
from adaface_tpu.models.vae import AutoencoderKL, VAEConfig, SD_VAE_SCALE_FACTOR
from adaface_tpu.ops.schedule import (
    DiffusionSchedule, make_diffusion_schedule, make_ddim_schedule,
)
from adaface_tpu.personalization.embedding_manager import EmbeddingManager
from adaface_tpu.samplers import ddim_sample, plms_sample, make_cfg_eps_fn


def _cfg_dedup_on(unet_cfg=None) -> bool:
    """CFG stem dedup (UNetModel cfg_dedup): run the UNet stem once for the
    identical (cond, uncond) latents and tile before the first cross-attn.
    Mathematically identical outputs (XLA may reassociate the batch-B vs
    batch-2B stem reductions — observed <=1 uint8 step);
    ADAFACE_CFG_DEDUP=0 reverts to the doubled-batch stem for A/B. Requires an attention block at level 0 to tile at — pass
    the UNetConfig so configs without one fall back to the doubled-batch
    stem instead of tripping the model's ValueError."""
    from adaface_tpu import knobs

    if unet_cfg is not None and 0 not in unet_cfg.attention_levels:
        return False
    return knobs.get("ADAFACE_CFG_DEDUP") != "0"


def _cross_kv_on() -> bool:
    """Hoist the loop-invariant cross-attention K/V projections out of the
    sampling scan (`models.unet.precompute_cross_kv`). Numerically identical
    (same bf16 GEMMs, computed once); ADAFACE_CROSS_KV=0 reverts for A/B."""
    from adaface_tpu import knobs

    return knobs.get("ADAFACE_CROSS_KV") != "0"

# The predefined negative prompt of `stable_txt2img.py:349-352`.
DEFAULT_NEGATIVE_PROMPT = (
    "duplicate faces, deformed, distorted, disfigured, poorly drawn, bad anatomy, "
    "wrong anatomy, extra limb, missing limb, floating limbs, mutated hands and "
    "fingers, disconnected limbs, mutation, mutated, ugly, disgusting, amputation"
)


@dataclasses.dataclass
class StableDiffusionPipeline:
    tokenizer: TokenizerBase
    clip: CLIPTextEncoder
    clip_params: dict
    unet: UNetModel
    unet_params: dict
    vae: AutoencoderKL
    vae_params: dict
    embedding_manager: EmbeddingManager
    base_sched: DiffusionSchedule
    dtype: jnp.dtype = jnp.float32
    skip_weights: Tuple[float, float] = (0.5, 0.5)

    def __post_init__(self):
        # Params are explicit jit ARGUMENTS everywhere (never closed over):
        # closed-over arrays embed as HLO constants, which bloats the
        # serialized program by the full model size (fatal for remote-compile
        # transports and wasteful for caching).
        self._encode_jit = jax.jit(self._encode_device)
        self._encode_plain_jit = jax.jit(self._encode_plain_device)
        self._sample_cache: dict = {}
        self.mesh = None  # serving mesh, set via use_mesh()

    # ------------------------------------------------------------ multi-chip
    def use_mesh(self, n_devices: Optional[int] = None, dp: Optional[int] = None,
                 tp: int = 1, mesh=None):
        """Shard serving over a device mesh (BASELINE north star:
        "n_samples sharded data-parallel across chips"): `generate`'s batch
        shards over `dp`; `tp` > 1 additionally Megatron-shards the UNet's
        attention/MLP matmuls (`parallel/mesh.py:param_sharding_rules`) —
        the latency lever for small batches. Params are placed once here
        (UNet per the tp rules, everything else replicated); the compiled
        sampler cache resets so programs re-lower with mesh shardings.

        The reference has no serving-parallelism analog (one GPU per
        `stable_txt2img.py` process); this is the jit/NamedSharding
        re-design of that gap."""
        from adaface_tpu.parallel.mesh import (
            make_mesh, replicate_params, shard_params,
        )

        self.mesh = mesh if mesh is not None else make_mesh(
            n_devices=n_devices, dp=dp, tp=tp)
        self.unet_params = shard_params(self.mesh, self.unet_params)
        self.clip_params = replicate_params(self.mesh, self.clip_params)
        self.vae_params = replicate_params(self.mesh, self.vae_params)
        if self.embedding_manager.embedders:
            self.embedding_manager.embedders = replicate_params(
                self.mesh, self.embedding_manager.embedders)
        self._sample_cache.clear()
        return self.mesh

    def _jit_sampler(self, fn, batch: int):
        """jit a sampling program; over a mesh, pin the image output to
        batch-dim dp sharding — GSPMD propagates the layout backward
        through the VAE decode and the DDIM scan, so the whole program
        runs data-parallel (plus tensor-parallel wherever the UNet params
        carry tp shardings)."""
        if self.mesh is None or batch % self.mesh.shape["dp"] != 0:
            return jax.jit(fn)
        from jax.sharding import NamedSharding, PartitionSpec as P

        return jax.jit(fn, out_shardings=NamedSharding(self.mesh, P("dp")))

    def _aot_wrap(self, sig, jitted):
        """On-disk PJRT-executable cache for a jitted sampling program
        (`adaface_tpu.aot.aot_wrap`): the first call per (signature, arg
        shapes) either loads the serialized executable — skipping the
        remote-side compile entirely — or compiles once and serializes it
        for every future process. The model configs + dtype join the
        signature: shape-invariant config changes (e.g. num_heads) alter
        the program without altering any arg shape, and must not collide
        in the on-disk cache. Single-device programs only (mesh lowerings
        bake shardings)."""
        from adaface_tpu.aot import aot_wrap

        sig = (sig, repr(self.unet.cfg), repr(self.vae.cfg),
               repr(self.clip.cfg), str(self.dtype))
        return aot_wrap(sig, jitted, allow=self.mesh is None)

    # ----------------------------------------------------------- construction
    @classmethod
    def from_random(cls, key: jax.Array, tokenizer: TokenizerBase,
                    unet_cfg: Optional[UNetConfig] = None,
                    vae_cfg: Optional[VAEConfig] = None,
                    clip_cfg: Optional[CLIPTextConfig] = None,
                    dtype=jnp.float32, num_extra_tokens: int = 8,
                    on_device: bool = False) -> "StableDiffusionPipeline":
        """Random-weight pipeline (bench / smoke-test path; weight-file
        loading goes through interop.sd_ckpt + from_params).

        `on_device=True` initializes all params in ONE jitted program on
        the accelerator (flax initializers, already cast to `dtype`)
        instead of host-init + upload: through the tunnel the ~1 GB bf16
        upload costs 3-5 minutes at the observed 3-10 MB/s, which after the
        AOT executable cache is the whole remaining cold start. The init
        program is AOT-cached too, so a warm process starts in seconds.
        Real-weight pipelines (`from_sd_checkpoint`) still pay the upload —
        that part is physics, not compilation."""
        unet_cfg = unet_cfg or UNetConfig.sd_v1()
        vae_cfg = vae_cfg or VAEConfig.sd_v1()
        clip_cfg = clip_cfg or CLIPTextConfig.vit_l_14(num_extra_tokens=num_extra_tokens)
        k1, k2, k3 = jax.random.split(key, 3)
        clip = CLIPTextEncoder(clip_cfg, dtype)
        unet = UNetModel(unet_cfg, dtype)
        vae = AutoencoderKL(vae_cfg, dtype)
        latc = unet_cfg.in_channels

        if on_device:
            # ON-DEVICE twin of host_init below: eval_shape the param trees
            # on host, then ONE jitted (AOT-cached) program fills every
            # leaf with randn*0.02 / ones-for-norm-scales from a per-leaf
            # folded key — NOT the flax module initializers, whose
            # zero-init output convs would make a random UNet context-blind
            # (eps == 0; the exact hazard the host-init comment documents).
            # Skips the ~1 GB host->device upload that dominates cold start
            # once compilation is AOT-cached (PERF.md round 4).
            from adaface_tpu.aot import aot_wrap

            def tree_shapes(fn):
                return jax.eval_shape(fn)["params"]

            shapes = {
                "clip": tree_shapes(lambda: clip.init(
                    k1, input_ids=jnp.zeros((1, 77), jnp.int32))),
                "unet": tree_shapes(lambda: unet.init(
                    k2, jnp.zeros((1, 8, 8, latc)), jnp.zeros((1,), jnp.int32),
                    jnp.zeros((NUM_CA_LAYERS, 1, 77, unet_cfg.context_dim)))),
                "vae": tree_shapes(lambda: vae.init(
                    k3, jnp.zeros((1, 32, 32, 3)), jax.random.PRNGKey(0))),
            }
            paths, treedef = jax.tree_util.tree_flatten_with_path(shapes)

            def init_all(key):
                out = []
                for i, (path, s) in enumerate(paths):
                    kp = str(getattr(path[-1], "key", path[-1]))
                    if "scale" in kp or ("norm" in kp and "bias" not in kp):
                        arr = jnp.ones(s.shape, jnp.float32)
                    elif s.ndim == 0:
                        arr = jnp.zeros((), jnp.float32)
                    else:
                        arr = 0.02 * jax.random.normal(
                            jax.random.fold_in(key, i), s.shape, jnp.float32)
                    if dtype != jnp.float32 and jnp.issubdtype(
                            s.dtype, jnp.floating):
                        arr = arr.astype(dtype)
                    out.append(arr)
                return jax.tree_util.tree_unflatten(treedef, out)

            sig = ("from_random_init", repr(unet_cfg), repr(vae_cfg),
                   repr(clip_cfg), str(dtype))
            params = aot_wrap(sig, jax.jit(init_all))(key)
            return cls(tokenizer=tokenizer, clip=clip,
                       clip_params=params["clip"], unet=unet,
                       unet_params=params["unet"], vae=vae,
                       vae_params=params["vae"],
                       embedding_manager=EmbeddingManager(),
                       base_sched=make_diffusion_schedule(), dtype=dtype)

        # Host-side init: build shapes abstractly (eval_shape) and fill with
        # numpy. The previous on-device init did one dispatch + one `any`
        # READBACK per leaf (~700 synchronous tunnel round-trips) — tens of
        # seconds at the normal ~35ms RTT and tens of MINUTES when the
        # shared axon tunnel is loaded. Host init also covers the
        # zero-initialized SD output convs (a *random* UNet would otherwise
        # be context-blind — eps == 0 — so smoke/bench pipelines wouldn't
        # exercise conditioning).
        import hashlib

        def host_init(shapes, base_seed: int):
            def leaf(path, s):
                name = "/".join(str(p) for p in path).encode()
                seed = (base_seed * 0x9E3779B1
                        + int(hashlib.md5(name).hexdigest()[:8], 16)) % (2**32)
                rng = np.random.default_rng(seed)
                arr = (rng.standard_normal(s.shape).astype(np.float32) * 0.02
                       if s.ndim >= 1 else np.zeros((), np.float32))
                kp = str(path[-1]) if path else ""
                if "scale" in kp or ("norm" in kp and "bias" not in kp):
                    arr = np.ones(s.shape, np.float32)  # LN/GN scales at 1
                return jnp.asarray(arr, s.dtype)

            return jax.tree_util.tree_map_with_path(leaf, shapes)

        clip_shapes = jax.eval_shape(
            lambda k: clip.init(k, input_ids=jnp.zeros((1, 77), jnp.int32)),
            k1)["params"]
        clip_params = host_init(clip_shapes, 1)
        unet_shapes = jax.eval_shape(
            lambda k: unet.init(
                k, jnp.zeros((1, 8, 8, latc)), jnp.zeros((1,), jnp.int32),
                jnp.zeros((NUM_CA_LAYERS, 1, 77, unet_cfg.context_dim))),
            k2)["params"]
        unet_params = host_init(unet_shapes, 2)
        vae_shapes = jax.eval_shape(
            lambda k: vae.init(k, jnp.zeros((1, 32, 32, 3)),
                               jax.random.PRNGKey(0)), k3)["params"]
        vae_params = host_init(vae_shapes, 3)
        return cls(tokenizer=tokenizer, clip=clip, clip_params=clip_params,
                   unet=unet, unet_params=unet_params, vae=vae, vae_params=vae_params,
                   embedding_manager=EmbeddingManager(),
                   base_sched=make_diffusion_schedule(), dtype=dtype)

    @classmethod
    def from_sd_checkpoint(cls, path: str, tokenizer: TokenizerBase,
                           dtype=jnp.float32,
                           num_extra_tokens: int = 8) -> "StableDiffusionPipeline":
        """Build the pipeline from an SD v1.x checkpoint — torch-zip `.ckpt`
        or single-file `.safetensors` — through the torch-free loaders + name
        mappers: the analog of `load_model_from_config` (`main.py:27-50`,
        `stable_txt2img.py:400`; the reference reads torch pickles only).
        """
        from adaface_tpu.interop.torch_pickle import load_sd_state_dict, walk_stub_tree
        from adaface_tpu.interop.sd_unet import map_unet_params
        from adaface_tpu.interop.sd_vae import map_vae_params
        from adaface_tpu.interop.hf_clip import map_clip_text_params

        sd = load_sd_state_dict(path)
        if not isinstance(sd, dict) or not any(
                k.startswith("model.diffusion_model.") for k in sd):
            sd = walk_stub_tree(sd)
        unet_cfg = UNetConfig.sd_v1()
        vae_cfg = VAEConfig.sd_v1()
        clip_cfg = CLIPTextConfig.vit_l_14(num_extra_tokens=num_extra_tokens)
        unet_params = map_unet_params(sd, unet_cfg)
        vae_params = map_vae_params(sd, vae_cfg)
        clip_params = map_clip_text_params(
            sd, prefix="cond_stage_model.transformer.text_model.")
        # fresh extra-token rows for placeholders
        clip = CLIPTextEncoder(clip_cfg, dtype)
        if num_extra_tokens:
            base = np.asarray(clip_params["token_embedding"]["embedding"])
            rng = np.random.default_rng(0)
            clip_params["extra_token_embedding"] = {
                "embedding": rng.standard_normal(
                    (num_extra_tokens, base.shape[1])).astype(base.dtype)
                * float(base.std())}
        return cls(tokenizer=tokenizer, clip=clip, clip_params=clip_params,
                   unet=UNetModel(unet_cfg, dtype), unet_params=unet_params,
                   vae=AutoencoderKL(vae_cfg, dtype), vae_params=vae_params,
                   embedding_manager=EmbeddingManager(),
                   base_sched=make_diffusion_schedule(), dtype=dtype)

    def set_conv_attn_kernel_size(self, ks: int) -> "StableDiffusionPipeline":
        """Enable subject-token conv attention at inference (the embedding
        checkpoint's `use_conv_attn_kernel_size`, `embedding_manager.py:1759`).
        Rebuilds the UNet module with the static kernel size (params are
        structure-identical) and clears compiled sampler caches."""
        import dataclasses as _dc

        self.unet = UNetModel(_dc.replace(self.unet.cfg,
                                          conv_attn_kernel_size=ks),
                              self.dtype)
        self.embedding_manager.use_conv_attn_kernel_size = ks
        self._sample_cache.clear()
        return self

    def cast_params(self, dtype=jnp.bfloat16) -> "StableDiffusionPipeline":
        """Cast the frozen backbone params to `dtype` in place (halves the
        weight HBM traffic for bf16 inference; the hot matmuls already
        compute in the module dtype). Embedder params stay fp32 (they are
        trainable and tiny)."""
        cast = lambda tree: jax.tree_util.tree_map(
            lambda x: x.astype(dtype) if jnp.issubdtype(x.dtype, jnp.floating)
            else x, tree)
        self.unet_params = cast(self.unet_params)
        self.vae_params = cast(self.vae_params)
        self.clip_params = cast(self.clip_params)
        return self

    # ------------------------------------------------------------- encoding
    def _encode_device(self, clip_params: dict, ids: jnp.ndarray,
                       slot_maps: Dict[str, jnp.ndarray],
                       embedders: dict,
                       extra_subj: Optional[dict] = None) -> jnp.ndarray:
        """ids [B,77] + slot maps + embedder param-tree -> [L, B, 77, 768].
        `extra_subj` carries precomputed placeholder embeddings (the
        zero-shot generators' output) that take precedence over the static
        embedders for the same placeholder — one jitted patch+encode
        program serves both the static and the zero-shot paths."""
        from adaface_tpu.personalization.static_embedding import compute_static_embedding

        embedded = self.clip.apply({"params": clip_params}, ids,
                                   method=CLIPTextEncoder.embed_tokens)
        subj = {s: compute_static_embedding(p) for s, p in embedders.items()
                if extra_subj is None or s not in extra_subj}
        if extra_subj:
            subj.update(extra_subj)
        patched = EmbeddingManager.patch_prompt_embeddings(embedded, slot_maps, subj)
        L, B, T, D = patched.shape
        flat = patched.reshape(L * B, T, D)
        ctx = self.clip.apply({"params": clip_params}, input_embeds=flat,
                              skip_weights=jnp.asarray(self.skip_weights))
        return ctx.reshape(L, B, T, D)

    def _encode_plain_device(self, clip_params: dict, ids: jnp.ndarray) -> jnp.ndarray:
        ctx = self.clip.apply({"params": clip_params}, ids,
                              skip_weights=jnp.asarray(self.skip_weights))
        return ctx[None]  # [1, B, T, D]

    def set_zero_shot_features(self, features, forward_template_ids,
                               inverse_template_ids, arcface_token_id,
                               out_id_embs_scale: float = 1.0,
                               is_face: bool = True,
                               inf_emb_type: str = "full_half_pad"):
        """Attach zero-shot reference features (from
        `ZeroShotFeatureExtractor.encode`) so `encode_prompts` conditions on
        them — the `--ref_images` path of `stable_txt2img.py:437,665`.
        `inf_emb_type` is the inference-time inverse-embedding padding variant
        (`--zs_arc2face_inverse_prompt_embs_inf_type`, default matches the
        reference's `full_half_pad`)."""
        self._zs = dict(features=features,
                        forward_template_ids=jnp.asarray(forward_template_ids),
                        inverse_template_ids=jnp.asarray(inverse_template_ids),
                        arcface_token_id=arcface_token_id,
                        out_id_embs_scale=out_id_embs_scale, is_face=is_face,
                        inf_emb_type=inf_emb_type)

    def encode_prompts(self, prompts: Sequence[str], ids=None,
                       slot_maps=None) -> jnp.ndarray:
        """Personalized encoding: [L, B, 77, 768] with placeholders patched.
        Static embedders and/or zero-shot generators both feed the same
        dense slot-map patch. `ids`/`slot_maps` accept precomputed values so
        callers that also need them (img2img's conv-attn slot map) tokenize
        once."""
        if ids is None:
            ids = self.tokenizer(list(prompts))
        mgr = self.embedding_manager
        if slot_maps is None:
            slot_maps = mgr.build_slot_maps(ids)
        zs = getattr(self, "_zs", None)
        if zs is not None and mgr.subj_basis_generators:
            subj, _ = mgr.compute_zero_shot_embeddings(
                zs["features"], zs["inverse_template_ids"],
                forward_template_ids=zs["forward_template_ids"],
                arcface_token_id=zs["arcface_token_id"],
                out_id_embs_scale=zs["out_id_embs_scale"],
                is_face=zs["is_face"],
                inf_emb_type=zs.get("inf_emb_type", "full_half_pad"))
            # [L, 1, K, D] features broadcast over the prompt batch; the
            # patch+encode body runs through the SAME jitted program as the
            # static path (one compile, no per-op eager tunnel RTTs)
            subj = {s: jnp.broadcast_to(
                e[:, :1], (e.shape[0], len(prompts)) + e.shape[2:])
                for s, e in subj.items()}
            return self._encode_jit(
                self.clip_params, jnp.asarray(ids),
                {k: jnp.asarray(v) for k, v in slot_maps.items()},
                mgr.embedders, subj)
        if not slot_maps:
            return jnp.broadcast_to(
                self._encode_plain_jit(self.clip_params, jnp.asarray(ids)),
                (1,) + ids.shape + (self.clip.cfg.hidden_size,))
        return self._encode_jit(self.clip_params, jnp.asarray(ids),
                                {k: jnp.asarray(v) for k, v in slot_maps.items()},
                                self.embedding_manager.embedders)

    def encode_negative(self, prompt: str, batch: int) -> jnp.ndarray:
        ids = self.tokenizer([prompt] * batch)
        return self._encode_plain_jit(self.clip_params, jnp.asarray(ids))

    def _make_kv_fn(self, unet_params):
        """kv_fn for make_cfg_eps_fn: precompute the loop-invariant
        cross-attention K/V projections once, outside the sampling scan."""
        if not _cross_kv_on():
            return None
        from adaface_tpu.models.unet import precompute_cross_kv

        return lambda ctx, ctx_k: precompute_cross_kv(
            unet_params, self.unet.cfg, ctx, ctx_k, dtype=self.unet.dtype)

    def _cfg_slot_map(self, ids, sm=None) -> jnp.ndarray:
        """[2B, T] subject slot map for a CFG (cond; uncond) batch — the
        uncond half carries no subject tokens (slot -1). Shared by
        generate() and img2img() so conv attention conditions identically
        on both paths."""
        if sm is None:
            sm = self.embedding_manager.build_slot_maps(ids)
        if sm and self.unet.cfg.conv_attn_kernel_size > 1:
            subj = next((s for s, i in
                         self.embedding_manager.placeholders.items()
                         if not i.is_background), None)
            cond_map = (np.asarray(sm[subj]) if subj
                        else np.full(ids.shape, -1))
            return jnp.asarray(
                np.concatenate([cond_map, np.full_like(cond_map, -1)]))
        return jnp.full((2 * ids.shape[0], ids.shape[1]), -1, jnp.int32)

    # ------------------------------------------------------------- sampling
    def _get_sampler_fn(self, batch: int, latent_hw: Tuple[int, int], steps: int,
                        guidance, sampler: str):
        from adaface_tpu import knobs

        # knobs.fingerprint(): any flipped ADAFACE_* env retraces instead
        # of silently reusing a stale compiled arm
        sig = (batch, latent_hw, steps,
               tuple(guidance) if isinstance(guidance, (tuple, list)) else guidance,
               sampler, knobs.fingerprint())
        if sig in self._sample_cache:
            return self._sample_cache[sig]
        sched = make_ddim_schedule(self.base_sched, steps, guidance_scale=guidance)

        dedup = _cfg_dedup_on(self.unet.cfg)

        def run_impl(unet_params, vae_params, ctx_c, ctx_u, x_T, slot_map):
            def unet_apply(x, t, ctx, ctx_k, cross_kv=None):
                return self.unet.apply({"params": unet_params}, x, t, ctx,
                                       context_k=ctx_k,
                                       subj_slot_map=slot_map,
                                       cfg_dedup=dedup, cross_kv=cross_kv)

            eps_fn = make_cfg_eps_fn(unet_apply, ctx_c, ctx_u, dedup=dedup,
                                     kv_fn=self._make_kv_fn(unet_params))
            if sampler == "plms":
                g = guidance if not isinstance(guidance, (tuple, list)) else guidance[0]
                z = plms_sample(eps_fn, sched, x_T, guide_scale=g)
            else:
                z = ddim_sample(eps_fn, sched, x_T)
            imgs = self.vae.apply({"params": vae_params},
                                  z / SD_VAE_SCALE_FACTOR,
                                  method=AutoencoderKL.decode)
            return jnp.clip((imgs + 1.0) / 2.0, 0.0, 1.0)

        run_impl = self._aot_wrap(sig, self._jit_sampler(run_impl, batch))

        def run(ctx_c, ctx_u, x_T, slot_map):
            return run_impl(self.unet_params, self.vae_params, ctx_c, ctx_u,
                            x_T, slot_map)

        self._sample_cache[sig] = run
        return run

    def _get_fused_fn(self, batch: int, n_uniq: int, latent_hw: Tuple[int, int],
                      steps: int, guidance, sampler: str, has_slots: bool):
        """Single-dispatch generate: prompt/negative encode + DDIM scan +
        VAE decode in ONE jitted program. Through the remote-TPU tunnel
        each dispatch costs ~35 ms RTT; the split encode/sample path pays
        3-4 of them per batch (~2% of the batch-8 operating point).

        The encode runs on `n_uniq` deduplicated prompt rows (gathered back
        to `batch` by `gather`); the negative prompt encodes ONCE and
        broadcasts."""
        from adaface_tpu import knobs

        # env knobs read at trace time are part of the compiled program —
        # knobs.fingerprint() keys the cache on ALL of them so in-process
        # A/B toggles retrace instead of silently reusing the stale arm
        sig = ("fused", batch, n_uniq, latent_hw, steps,
               tuple(guidance) if isinstance(guidance, (tuple, list)) else guidance,
               sampler, has_slots, knobs.fingerprint())
        if sig in self._sample_cache:
            return self._sample_cache[sig]
        sched = make_ddim_schedule(self.base_sched, steps, guidance_scale=guidance)

        lh, lw = latent_hw
        in_ch = self.unet.cfg.in_channels
        dedup = _cfg_dedup_on(self.unet.cfg)

        def run_full(clip_params, unet_params, vae_params, embedders,
                     ids, neg_ids, slot_maps, gather, seed, slot_map):
            # x_T from the seed ON DEVICE (identical stream to the host-side
            # jax.random.normal it replaces) and uint8 conversion in the same
            # program: one dispatch in, one 4x-smaller uint8 readback out —
            # each host<->device leg costs ~35 ms RTT through the tunnel.
            x_T = jax.random.normal(jax.random.PRNGKey(seed),
                                    (batch, lh, lw, in_ch), jnp.float32)
            if has_slots:
                ctx_c = self._encode_device(clip_params, ids, slot_maps,
                                            embedders)
            else:
                ctx_c = self._encode_plain_device(clip_params, ids)
            if n_uniq != batch:
                ctx_c = ctx_c[:, gather]
            ctx_u = self._encode_plain_device(clip_params, neg_ids)
            ctx_u = jnp.broadcast_to(ctx_u, ctx_u.shape[:1] + (batch,)
                                     + ctx_u.shape[2:])

            def unet_apply(x, t, ctx, ctx_k, cross_kv=None):
                return self.unet.apply({"params": unet_params}, x, t, ctx,
                                       context_k=ctx_k,
                                       subj_slot_map=slot_map,
                                       cfg_dedup=dedup, cross_kv=cross_kv)

            eps_fn = make_cfg_eps_fn(unet_apply, ctx_c, ctx_u, dedup=dedup,
                                     kv_fn=self._make_kv_fn(unet_params))
            if sampler == "plms":
                g = guidance if not isinstance(guidance, (tuple, list)) \
                    else guidance[0]
                z = plms_sample(eps_fn, sched, x_T, guide_scale=g)
            else:
                z = ddim_sample(eps_fn, sched, x_T)
            imgs = self.vae.apply({"params": vae_params},
                                  z / SD_VAE_SCALE_FACTOR,
                                  method=AutoencoderKL.decode)
            imgs = jnp.clip((imgs + 1.0) / 2.0, 0.0, 1.0)
            return (imgs * 255).astype(jnp.uint8)

        run_full = self._aot_wrap(sig, self._jit_sampler(run_full, batch))

        def run(ids, neg_ids, slot_maps, gather, seed, slot_map):
            return run_full(self.clip_params, self.unet_params,
                            self.vae_params, self.embedding_manager.embedders,
                            ids, neg_ids, slot_maps, gather, seed, slot_map)

        self._sample_cache[sig] = run
        return run

    def img2img(
        self,
        init_image: np.ndarray,  # [H, W, 3] uint8
        prompts: Sequence[str],
        strength: float = 0.75,
        negative_prompt: str = DEFAULT_NEGATIVE_PROMPT,
        num_steps: int = 50,
        guidance_scale=(10.0, 4.0),
        seed: int = 0,
    ) -> np.ndarray:
        """Image-to-image via DDIM stochastic encode at t = strength·steps
        then decode (`ddim.py:298-350`, `scripts/img2img.py`)."""
        from adaface_tpu.samplers.ddim import ddim_decode, stochastic_encode

        b = len(prompts)
        ids = self.tokenizer(list(prompts))
        sm = self.embedding_manager.build_slot_maps(ids)
        ctx_c = self.encode_prompts(prompts, ids=ids, slot_maps=sm)
        ctx_u = self.encode_negative(negative_prompt, b)
        slot_map = self._cfg_slot_map(ids, sm)
        from adaface_tpu import knobs

        # memoized like the sampler paths — repeated img2img calls reuse
        # ONE wrapped program instead of re-jitting / re-deserializing the
        # AOT executable per call. Image size rides in the sig (it changes
        # shapes without changing the arg pytree structure).
        sig = ("img2img", b, tuple(init_image.shape), num_steps, strength,
               tuple(guidance_scale)
               if isinstance(guidance_scale, (tuple, list))
               else guidance_scale, knobs.fingerprint())
        if sig not in self._sample_cache:
            sched = make_ddim_schedule(self.base_sched, num_steps,
                                       guidance_scale=guidance_scale)
            t_enc = max(1, min(int(strength * num_steps), num_steps - 1))
            # sched.timesteps is DESCENDING; the last t_enc sampling steps
            # start at index num_steps - t_enc
            start_idx = num_steps - t_enc
            g = (guidance_scale[0]
                 if isinstance(guidance_scale, (tuple, list))
                 else guidance_scale)

            def run(unet_params, vae_params, img, ctx_c, ctx_u, key,
                    slot_map):
                x = img.astype(jnp.float32) / 127.5 - 1.0
                mean, _ = self.vae.apply({"params": vae_params}, x,
                                         method=AutoencoderKL.encode)
                z0 = mean * SD_VAE_SCALE_FACTOR
                t = jnp.full((z0.shape[0],), sched.timesteps[start_idx],
                             jnp.int32)
                z_t = stochastic_encode(self.base_sched, z0, t,
                                        jax.random.normal(key, z0.shape))

                dedup = _cfg_dedup_on(self.unet.cfg)

                def unet_apply(x, tt, c, ck, cross_kv=None):
                    return self.unet.apply({"params": unet_params}, x, tt, c,
                                           context_k=ck, cfg_dedup=dedup,
                                           subj_slot_map=slot_map,
                                           cross_kv=cross_kv)

                eps_fn = make_cfg_eps_fn(unet_apply, ctx_c, ctx_u,
                                         dedup=dedup,
                                         kv_fn=self._make_kv_fn(unet_params))
                z = ddim_decode(eps_fn, sched, z_t, start_idx, guide_scale=g)
                out = self.vae.apply({"params": vae_params},
                                     z / SD_VAE_SCALE_FACTOR,
                                     method=AutoencoderKL.decode)
                return jnp.clip((out + 1.0) / 2.0, 0.0, 1.0)

            self._sample_cache[sig] = self._aot_wrap(sig, jax.jit(run))
        run = self._sample_cache[sig]
        img = jnp.broadcast_to(jnp.asarray(init_image)[None],
                               (b,) + init_image.shape)
        out = run(self.unet_params, self.vae_params, img, ctx_c, ctx_u,
                  jax.random.PRNGKey(seed), slot_map)
        return np.asarray((out * 255).astype(jnp.uint8))

    def generate(
        self,
        prompts: Sequence[str],
        negative_prompt: str = DEFAULT_NEGATIVE_PROMPT,
        num_steps: int = 50,
        guidance_scale=(10.0, 4.0),
        height: int = 512,
        width: int = 512,
        seed: int = 0,
        sampler: str = "ddim",
        compel_cfg_weight_level: float = 0.0,
        x_T: Optional[np.ndarray] = None,  # [B, h, w, C] initial noise
        block: bool = True,
        context: Optional[jnp.ndarray] = None,  # [L|1, B|1, T, D] cond ctx
    ) -> np.ndarray:
        """Returns uint8 images [B, H, W, 3].

        block=False (fused path only): return the on-device uint8 array
        WITHOUT synchronizing, so a caller can pipeline batches — dispatch
        batch i+1 while batch i computes and its readback streams. The
        tunnel readback (~6 MB uint8) and ~35 ms dispatch RTT then overlap
        device compute instead of serializing with it.

        `compel_cfg_weight_level` != 0 amplifies the cond context's offset
        from the empty-prompt context by 1.1^level before sampling
        (`stable_txt2img.py:680-694`: inference applies compel to the cond
        half of the CFG batch only).

        `context` bypasses prompt encoding with a precomputed conditioning
        tensor (layer and batch dims of size 1 broadcast) — the analog of
        the reference's `apply_arc2face_embs` / `apply_arc2face_inverse_embs`
        evaluation modes (`ddpm.py:1004-1030`: raw Arc2Face or inverse prompt
        embeddings drive the UNet directly), and generally useful for serving
        callers with cached contexts. Prompts then only size the batch."""
        b = len(prompts)
        f = 2 ** (len(self.vae.cfg.ch_mult) - 1)  # VAE spatial factor (8 for SD)
        lh, lw = height // f, width // f
        x_T_given = x_T is not None
        if x_T_given:
            x_T = jnp.asarray(x_T, jnp.float32)
        # CFG doubles the batch inside make_cfg_eps_fn (cond; uncond): the
        # uncond half carries no subject tokens -> slot -1
        ids = self.tokenizer(list(prompts))
        sm = self.embedding_manager.build_slot_maps(ids)
        slot_map = self._cfg_slot_map(ids, sm)

        # common case (no compel, no zero-shot features, seed-generated
        # noise): everything in one dispatch — noise + encode + scan +
        # decode + uint8, one compact readback
        if (compel_cfg_weight_level == 0 and getattr(self, "_zs", None) is None
                and not x_T_given and context is None):
            # Dedup identical prompt rows before the CLIP encode: the
            # layerwise context batch is L*B CLIP rows (128 at batch 8), so
            # repeated prompts — the common serving batch — pay L*U instead.
            # Unique key = token row + every slot-map row (a placeholder at
            # a different position must encode separately).
            ids_np = np.asarray(ids)
            sm_np = {k: np.asarray(v) for k, v in sm.items()}
            row_key = {}
            first_idx, gather = [], []
            for i in range(b):
                kr = (ids_np[i].tobytes(),
                      tuple(m[i].tobytes() for m in sm_np.values()))
                if kr not in row_key:
                    row_key[kr] = len(first_idx)
                    first_idx.append(i)
                gather.append(row_key[kr])
            uniq_ids = ids_np[first_idx]
            uniq_sm = {k: jnp.asarray(v[first_idx]) for k, v in sm_np.items()}
            neg_ids = self.tokenizer([negative_prompt])  # 1 row, broadcast
            run = self._get_fused_fn(b, len(first_idx), (lh, lw), num_steps,
                                     guidance_scale, sampler,
                                     has_slots=bool(sm))
            imgs = run(jnp.asarray(uniq_ids), jnp.asarray(neg_ids), uniq_sm,
                       jnp.asarray(np.asarray(gather, np.int32)),
                       jnp.asarray(seed, jnp.uint32), slot_map)
            return np.asarray(imgs) if block else imgs

        if not x_T_given:
            x_T = jax.random.normal(jax.random.PRNGKey(seed),
                                    (b, lh, lw, self.unet.cfg.in_channels),
                                    jnp.float32)
        if context is not None:
            from adaface_tpu.models.unet import NUM_CA_LAYERS

            ctx_c = jnp.asarray(context)
            L = NUM_CA_LAYERS if ctx_c.shape[0] == 1 else ctx_c.shape[0]
            ctx_c = jnp.broadcast_to(ctx_c, (L, b) + ctx_c.shape[2:])
        else:
            ctx_c = self.encode_prompts(prompts)
        ctx_u = self.encode_negative(negative_prompt, b)
        if compel_cfg_weight_level:
            from adaface_tpu.ops.compel import apply_compel_cfg

            empty = self.encode_negative("", 1)[0]
            ctx_c = apply_compel_cfg(ctx_c, empty.astype(ctx_c.dtype),
                                     compel_cfg_weight_level)
        run = self._get_sampler_fn(b, (lh, lw), num_steps, guidance_scale, sampler)
        imgs = run(ctx_c, ctx_u, x_T, slot_map)
        return np.asarray((imgs * 255).astype(jnp.uint8))
