"""Zero-shot image feature extraction — fg/bg CLIP features + face ID embs.

TPU-native re-design of `LatentDiffusion.encode_zero_shot_image_features`
(`ldm/models/diffusion/ddpm.py:2322-2467`):

- reference images -> CLIP-normalized pixels -> masked CLIP vision encoder,
  PENULTIMATE hidden state (`hidden_states[-2]`), minus the features of an
  all-zero "negative" image, multiplied by the resized token mask; run once
  with the fg mask and once with its complement, concatenated to
  [B, 2*257, D] (`:2415-2436`).
- face identity: detector+embedder on host (the reference uses insightface's
  RetinaFace+ArcFace ONNX session, `:2343-2365`); here it's an injected
  callable so the JAX ArcFace port, a fixture, or precomputed embeddings can
  serve. No face -> random unit embedding + `faceless_img_count` bump,
  identical failure semantics.
- non-face subjects: DINO CLS embedding via an injected callable
  (`:2367-2376`).
- `calc_avg` averages CLIP features and L2-normalizes the mean ID embedding
  (`:2442-2462`).

The device compute (two masked vision passes over the whole batch) is one
jitted function; everything per-image/host-bound stays in numpy.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from adaface_tpu.models.clip_vision import (
    CLIPVisionConfig,
    CLIPVisionEncoder,
    preprocess_images,
)


@dataclasses.dataclass
class ZeroShotFeatures:
    """What the EmbeddingManager's zero-shot path consumes
    (`embedding_manager.py:1407-1440`): per-placeholder feature dict keys
    'subj' (fg clip), 'bg' (bg clip), 'id' (ArcFace or DINO)."""

    clip_fg: jnp.ndarray  # [B, 257, D]
    clip_bg: jnp.ndarray  # [B, 257, D]
    id_embs: Optional[jnp.ndarray]  # [B, 512] face / [B, 384] DINO
    faceless_img_count: int = 0

    @property
    def clip_features(self) -> jnp.ndarray:
        """[B, 514, D] fg/bg concat (`ddpm.py:2438`)."""
        return jnp.concatenate([self.clip_fg, self.clip_bg], axis=1)


class ZeroShotFeatureExtractor:
    """Host-side orchestrator holding the CLIP vision tower and the injected
    identity embedders."""

    def __init__(
        self,
        vision: CLIPVisionEncoder,
        vision_params: dict,
        face_embed_fn: Optional[Callable[[np.ndarray], Optional[np.ndarray]]] = None,
        dino_embed_fn: Optional[Callable[[np.ndarray], np.ndarray]] = None,
        feature_layer: int = -2,
    ):
        self.vision = vision
        self.vision_params = vision_params
        self.face_embed_fn = face_embed_fn
        self.dino_embed_fn = dino_embed_fn
        self.feature_layer = feature_layer
        self._neg_features = None

        @functools.partial(jax.jit, static_argnames=("feature_layer",))
        def _masked_pass(params, pixels, mask, feature_layer):
            feats, _, token_mask = self.vision.apply(
                {"params": params}, pixels, attn_mask=mask,
                feature_layer=feature_layer)
            return feats, token_mask

        self._masked_pass = _masked_pass

    def _neg(self, pixels: jnp.ndarray) -> jnp.ndarray:
        """Features of an all-zero image (`ddpm.py:2417-2420`), cached."""
        if self._neg_features is None:
            zero = jnp.zeros_like(pixels[:1])
            feats, _ = self._masked_pass(self.vision_params, zero,
                                         jnp.ones(zero.shape[:3]),
                                         self.feature_layer)
            self._neg_features = feats
        return self._neg_features

    def encode(
        self,
        images: Sequence[np.ndarray],  # list of [H, W, 3] uint8 RGB
        fg_masks: Optional[Sequence[np.ndarray]] = None,  # list of [H, W]
        is_face: bool = True,
        calc_avg: bool = False,
        skip_non_faces: bool = False,
        rng: Optional[np.random.Generator] = None,
    ) -> ZeroShotFeatures:
        rng = rng or np.random.default_rng(0)
        size = self.vision.cfg.image_size
        faceless = 0
        id_embs = []
        keep = []
        for idx, image in enumerate(images):
            if is_face and self.face_embed_fn is not None:
                emb = self.face_embed_fn(image)
                if emb is None:
                    if skip_non_faces:
                        continue
                    emb = rng.standard_normal(512).astype(np.float32)
                    faceless += 1
                id_embs.append(np.asarray(emb, np.float32))
            elif not is_face and self.dino_embed_fn is not None:
                id_embs.append(np.asarray(self.dino_embed_fn(image), np.float32))
            keep.append(idx)

        if not keep:
            # every image was dropped (skip_non_faces with no detectable
            # face, or an empty input list) — np.stack([]) below would
            # raise an unrelated ValueError; fail with the real cause
            raise ValueError(
                f"no usable reference images: {len(images)} given, "
                f"0 kept (skip_non_faces={skip_non_faces})")
        images = [images[i] for i in keep]
        batch = np.stack([_center_crop_resize(im, size) for im in images])
        pixels = preprocess_images(jnp.asarray(batch), size)

        if fg_masks is not None:
            fg_masks = [fg_masks[i] for i in keep]
            mask = np.stack([_resize_mask(m, size) for m in fg_masks])
        else:
            mask = np.ones((len(images), size, size), np.float32)
        mask = jnp.asarray(mask)

        neg = self._neg(pixels)
        fg_feats, fg_tok = self._masked_pass(self.vision_params, pixels, mask,
                                             self.feature_layer)
        bg_feats, bg_tok = self._masked_pass(self.vision_params, pixels,
                                             1.0 - mask, self.feature_layer)
        fg = (fg_feats - neg) * fg_tok
        bg = (bg_feats - neg) * bg_tok

        ids = jnp.asarray(np.stack(id_embs)) if id_embs else None
        if calc_avg:
            fg = jnp.mean(fg, axis=0, keepdims=True)
            bg = jnp.mean(bg, axis=0, keepdims=True)
            if ids is not None:
                ids = jnp.mean(ids, axis=0, keepdims=True)
                ids = ids / (jnp.linalg.norm(ids, axis=-1, keepdims=True) + 1e-12)
        return ZeroShotFeatures(fg, bg, ids, faceless)


def _center_crop_resize(image: np.ndarray, size: int) -> np.ndarray:
    """Square center crop + nearest resize (host half of CLIPImageProcessor)."""
    h, w = image.shape[:2]
    s = min(h, w)
    top, left = (h - s) // 2, (w - s) // 2
    sq = image[top:top + s, left:left + s]
    ri = (np.arange(size) * (s / size)).astype(np.int64)
    return sq[ri][:, ri]


def _resize_mask(mask: np.ndarray, size: int) -> np.ndarray:
    """Mask variant of `_center_crop_resize` (same crop + nearest gather,
    so image and mask stay spatially aligned) with a channel squeeze."""
    m = np.asarray(mask, np.float32)
    if m.ndim == 3:
        m = m[..., 0]
    return _center_crop_resize(m, size)
