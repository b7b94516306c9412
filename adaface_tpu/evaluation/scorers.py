"""Similarity scorers: CLIP-I / CLIP-T (ViT-B/32) and DINO (ViT-S/16).

TPU-native re-design of `evaluation/clip_eval.py` (OpenAI `clip` package,
ViT-B/32, `CLIPEvaluator:20-140`, `ImageDirEvaluator:184`) and
`evaluation/dino_eval.py` (HF `facebook/dino-vits16`, CLS cosine). Both
towers are the in-repo Flax encoders; weights load from HF-format
checkpoints through the torch-free unpickler.

All scorers share the reference's reduction semantics
('mean' | 'diag' | 'diagmean' | 'none', `clip_eval.py:75-140`).
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from adaface_tpu.models.clip_text import CLIPTextConfig, CLIPTextEncoder
from adaface_tpu.models.clip_vision import (
    CLIPVisionConfig,
    CLIPVisionEncoder,
    preprocess_images,
)
from adaface_tpu.models.vit import ViTConfig, ViTEncoder, preprocess_vit_images


def _reduce(sim: jnp.ndarray, reduction: str) -> jnp.ndarray:
    if reduction == "mean":
        return jnp.mean(sim)
    if reduction == "diag":
        return jnp.diagonal(sim)
    if reduction == "diagmean":
        return jnp.mean(jnp.diagonal(sim))
    if reduction == "none":
        return sim
    raise NotImplementedError(reduction)


class CLIPScorer:
    """Dual-tower CLIP (ViT-B/32 by default) with text/visual projections —
    the contrastive model the reference scores with, not the SD conditioning
    encoder. `text_projection`/`visual_projection`: [D_tower, D_joint]."""

    def __init__(self, tokenizer,
                 text: Optional[CLIPTextEncoder] = None, text_params: Optional[dict] = None,
                 vision: Optional[CLIPVisionEncoder] = None, vision_params: Optional[dict] = None,
                 text_projection: Optional[np.ndarray] = None,
                 visual_projection: Optional[np.ndarray] = None):
        self.tokenizer = tokenizer
        # OpenAI ViT-B/32 text tower: 512 wide, 8 heads, 2048 MLP
        self.text = text or CLIPTextEncoder(
            CLIPTextConfig(hidden_size=512, num_heads=8, intermediate_size=2048))
        self.vision = vision or CLIPVisionEncoder(CLIPVisionConfig.vit_b_32())
        self.text_params = text_params
        self.vision_params = vision_params
        d_joint = 512
        dt = self.text.cfg.hidden_size
        dv = self.vision.cfg.hidden_size
        self.text_projection = (jnp.asarray(text_projection)
                                if text_projection is not None
                                else jnp.eye(dt, d_joint))
        self.visual_projection = (jnp.asarray(visual_projection)
                                  if visual_projection is not None
                                  else jnp.eye(dv, d_joint))

        @jax.jit
        def _img_feats(params, pixels, proj):
            _, pooled, _ = self.vision.apply({"params": params}, pixels)
            feats = pooled @ proj
            return feats / jnp.linalg.norm(feats, axis=-1, keepdims=True)

        @jax.jit
        def _txt_feats(params, ids, proj):
            seq = self.text.apply({"params": params}, ids)
            # pooled = EOT row (highest token id, OpenAI CLIP convention)
            pooled = seq[jnp.arange(seq.shape[0]), jnp.argmax(ids, axis=-1)]
            feats = pooled @ proj
            return feats / jnp.linalg.norm(feats, axis=-1, keepdims=True)

        self._img_feats = _img_feats
        self._txt_feats = _txt_feats

    # images: [B, H, W, 3] uint8/float [0..255]
    def get_image_features(self, images: np.ndarray) -> jnp.ndarray:
        pixels = preprocess_images(jnp.asarray(images),
                                   self.vision.cfg.image_size)
        return self._img_feats(self.vision_params, pixels, self.visual_projection)

    def get_text_features(self, texts: Sequence[str]) -> jnp.ndarray:
        ids = jnp.asarray(self.tokenizer(list(texts)))
        return self._txt_feats(self.text_params, ids, self.text_projection)

    def image_pairwise_similarity(self, images1, images2, reduction="mean"):
        f1 = self.get_image_features(images1)
        f2 = self.get_image_features(images2)
        return _reduce(f1 @ f2.T, reduction)

    def txt_to_img_similarity(self, text, images, reduction="mean"):
        t = self.get_text_features([text] if isinstance(text, str) else text)
        f = self.get_image_features(images)
        return _reduce(t @ f.T, reduction)

    def text_pairwise_similarity(self, texts1, texts2, reduction="mean"):
        f1 = self.get_text_features(texts1)
        f2 = self.get_text_features(texts2)
        return _reduce(f1 @ f2.T, reduction)

    def evaluate(self, gen_samples, ref_images, target_text):
        """`ImageDirEvaluator.evaluate` (`clip_eval.py:184-193`):
        (CLIP-I, CLIP-T)."""
        sim_i = self.image_pairwise_similarity(ref_images, gen_samples)
        sim_t = self.txt_to_img_similarity(target_text, gen_samples)
        return sim_i, sim_t


class DINOScorer:
    """DINO ViT-S/16 CLS-cosine similarity (`dino_eval.py:44-83`)."""

    def __init__(self, vit: Optional[ViTEncoder] = None,
                 params: Optional[dict] = None):
        self.vit = vit or ViTEncoder(ViTConfig.dino_vits16())
        self.params = params

        @jax.jit
        def _feats(params, pixels):
            out = self.vit.apply({"params": params}, pixels)
            cls = out[:, 0]
            return cls / jnp.linalg.norm(cls, axis=-1, keepdims=True)

        self._feats = _feats

    def get_image_features(self, images: np.ndarray) -> jnp.ndarray:
        pixels = preprocess_vit_images(jnp.asarray(images),
                                       self.vit.cfg.image_size)
        return self._feats(self.params, pixels)

    def image_pairwise_similarity(self, images1, images2, reduction="mean"):
        f1 = self.get_image_features(images1)
        f2 = self.get_image_features(images2)
        return _reduce(f1 @ f2.T, reduction)


def init_evaluators(tokenizer=None,
                    clip_ckpt: Optional[str] = None,
                    dino_ckpt: Optional[str] = None):
    """Build the (CLIPScorer, DINOScorer) pair — the reference's
    `init_evaluators` (`evaluation/eval_utils.py:33`, used by
    `scripts/evaluate_subjects.py:69` and `stable_txt2img.py`).

    Real weights come from HF-format checkpoints (state dicts read by the
    torch-free unpickler): `clip_ckpt` / env `CLIP_SCORER_PT` = full
    `CLIPModel` (openai/clip-vit-base-patch32), `dino_ckpt` / env
    `DINO_VITS16_PT` = `ViTModel` (facebook/dino-vits16). Without assets the
    scorers run with random tiny towers — smoke mode, consistent with the
    rest of the asset-gated stack (COMPONENTS.md "Known gaps")."""
    import os

    clip_ckpt = clip_ckpt or os.environ.get("CLIP_SCORER_PT")
    dino_ckpt = dino_ckpt or os.environ.get("DINO_VITS16_PT")

    if tokenizer is None:
        from adaface_tpu.data.tokenizer import CLIPBPETokenizer, HashTokenizer
        vocab = os.environ.get("CLIP_VOCAB_JSON")
        merges = os.environ.get("CLIP_MERGES_TXT")
        if (vocab and merges and os.path.exists(vocab)
                and os.path.exists(merges)):
            tokenizer = CLIPBPETokenizer(vocab, merges)
        else:
            tokenizer = HashTokenizer()
            if clip_ckpt and os.path.exists(clip_ckpt):
                import warnings

                # real text tower + hash token ids = in-range but meaningless
                # CLIP-T scores; make the degradation loud
                warnings.warn(
                    "CLIP_SCORER_PT set but CLIP_VOCAB_JSON/CLIP_MERGES_TXT "
                    "missing: CLIP-T uses a HashTokenizer over real weights, "
                    "so text-image scores are NOT comparable to the "
                    "reference (CLIP-I/DINO are unaffected).")

    def _state_dict(path):
        from adaface_tpu.interop.torch_pickle import load_sd_state_dict
        return load_sd_state_dict(path)

    if clip_ckpt and os.path.exists(clip_ckpt):
        from adaface_tpu.interop.hf_clip import map_clip_model_params
        tparams, vparams, tproj, vproj = map_clip_model_params(
            _state_dict(clip_ckpt))
        clip = CLIPScorer(
            tokenizer,
            CLIPTextEncoder(CLIPTextConfig(hidden_size=512, num_heads=8,
                                           intermediate_size=2048)), tparams,
            CLIPVisionEncoder(CLIPVisionConfig.vit_b_32()), vparams,
            tproj, vproj)
    else:
        import jax

        text = CLIPTextEncoder(CLIPTextConfig.tiny(
            vocab_size=tokenizer.vocab_size, max_position_embeddings=77))
        tparams = text.init(jax.random.PRNGKey(0),
                            input_ids=jnp.zeros((1, 77), jnp.int32))["params"]
        vis = CLIPVisionEncoder(CLIPVisionConfig.tiny())
        vparams = vis.init(jax.random.PRNGKey(1),
                           jnp.zeros((1, 28, 28, 3)))["params"]
        rng = np.random.default_rng(0)
        clip = CLIPScorer(
            tokenizer, text, tparams, vis, vparams,
            rng.standard_normal((64, 32)).astype(np.float32),
            rng.standard_normal((64, 32)).astype(np.float32))

    if dino_ckpt and os.path.exists(dino_ckpt):
        from adaface_tpu.models.vit import map_vit_params
        vit = ViTEncoder(ViTConfig.dino_vits16())
        dino = DINOScorer(vit, map_vit_params(_state_dict(dino_ckpt)))
    else:
        import jax

        vit = ViTEncoder(ViTConfig.tiny())
        dino = DINOScorer(vit, vit.init(jax.random.PRNGKey(2),
                                        jnp.zeros((1, 32, 32, 3)))["params"])
    return clip, dino
