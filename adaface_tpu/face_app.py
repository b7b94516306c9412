"""Face analysis orchestration — the insightface `FaceAnalysis` equivalent.

The reference constructs `FaceAnalysis(name='antelopev2')` (SCRFD detector +
glintr100 ArcFace recognizer over onnxruntime) and calls `.get(bgr_image)`
for a list of faces with `bbox` and `normed_embedding`
(`ddpm.py:904-919,2343-2365`, `ldm/util.py:1259-1282`). Here:

- recognition runs on device: the XLA IResNet port (`models/arcface.py`),
  batched + jitted;
- detection stays host-side behind an injected `detect_fn` (the clean
  host/device boundary SURVEY.md §7.2 calls for). `detect_fn(rgb_image) ->
  list of (bbox[4], landmarks[5,2], score)`. `full_image_detector` is the
  no-weights fallback: the whole frame as one face with template landmarks
  — correct for the pre-cropped subject photos the datasets ship.
- `Face.normed_embedding` and biggest-face selection reproduce the
  reference call sites (`sorted by bbox area`, `ddpm.py:2356`).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Callable, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from adaface_tpu.models.arcface import (
    ARCFACE_DST,
    IResNet,
    IResNetConfig,
    estimate_norm,
    preprocess_faces,
    warp_affine_jax,
)


@dataclasses.dataclass
class Face:
    bbox: np.ndarray  # [4] x1 y1 x2 y2
    landmarks: np.ndarray  # [5, 2]
    det_score: float
    embedding: Optional[np.ndarray] = None  # [512]

    @property
    def normed_embedding(self) -> np.ndarray:
        e = self.embedding
        return e / (np.linalg.norm(e) + 1e-12)

    @property
    def area(self) -> float:
        x1, y1, x2, y2 = self.bbox
        return float((x2 - x1) * (y2 - y1))


def full_image_detector(image: np.ndarray) -> List[tuple]:
    """Whole frame as a single 'face' with the ArcFace landmark template
    scaled to the frame — fallback when no detector weights are available
    (dataset photos are already subject crops with `*_mask.png` fg masks)."""
    h, w = image.shape[:2]
    bbox = np.array([0, 0, w, h], np.float32)
    lm = ARCFACE_DST * np.array([w / 112.0, h / 112.0], np.float32)
    return [(bbox, lm, 1.0)]


class FaceApp:
    """`FaceAnalysis`-shaped orchestrator with device-side embedding."""

    def __init__(self, recognizer: Optional[IResNet] = None,
                 params: Optional[dict] = None,
                 detect_fn: Callable = full_image_detector):
        self.recognizer = recognizer or IResNet(IResNetConfig.iresnet100())
        self.params = params
        self.detect_fn = detect_fn

        size = self.recognizer.cfg.input_size

        @jax.jit
        def _embed(params, crops):
            return self.recognizer.apply({"params": params},
                                         preprocess_faces(crops, size))

        self._embed = _embed

        # device-side align+crop (BASELINE config 4: "fused face-align
        # preprocessing"): a SMALL gather program chained device-to-device
        # into `_embed` — the crops never visit the host. The warp
        # recompiles per (canvas bucket x face-count bucket); the IResNet
        # forward recompiles only per face-count bucket (its input is
        # [npad, S, S, 3]), a handful of compiles over a photo folder.
        self._warp = jax.jit(
            functools.partial(warp_affine_jax, size=size))

    @property
    def crop_size(self) -> int:
        return self.recognizer.cfg.input_size

    def get(self, image: np.ndarray) -> List[Face]:
        """RGB [H, W, 3] uint8 -> faces with embeddings. Alignment, crop,
        normalization and the IResNet forward all run on device; the
        aligned crops flow jit-to-jit without visiting the host. Only
        detection stays host-side. The canvas zero-pads up to a multiple
        of 256 and the face count to a power of two, bounding total
        compiles to a handful of warp programs (per canvas x count
        bucket) plus one embed program per count bucket."""
        dets = self.detect_fn(image)
        if not dets:
            return []
        size = self.crop_size
        faces = [Face(np.asarray(bbox, np.float32),
                      np.asarray(lm, np.float32), float(score))
                 for bbox, lm, score in dets]
        Ms = np.stack([estimate_norm(f.landmarks, size) for f in faces])
        dets2 = Ms[:, 0, 0] * Ms[:, 1, 1] - Ms[:, 0, 1] * Ms[:, 1, 0]
        if not np.isfinite(Ms).all() or (np.abs(dets2) < 1e-12).any():
            # degenerate landmarks: coincident points -> zero variance in
            # the Umeyama fit (non-finite M), or mirrored/collapsed
            # layouts -> scale ~ 0 (finite M but singular — the device
            # warp divides by det). Fail loudly rather than silently
            # embedding NaN/zero crops.
            raise ValueError("degenerate face landmarks: singular or "
                             "non-finite alignment transform")
        n = len(faces)
        npad = 1 << max(0, (n - 1).bit_length())  # next power of two
        if npad != n:  # pad with identity maps so N doesn't recompile
            eye = np.tile(np.eye(2, 3, dtype=np.float32), (npad - n, 1, 1))
            Ms = np.concatenate([Ms, eye])
        h, w = image.shape[:2]
        ph, pw = ((h + 255) // 256) * 256, ((w + 255) // 256) * 256
        canvas = image
        if (ph, pw) != (h, w):
            canvas = np.zeros((ph, pw) + image.shape[2:], image.dtype)
            canvas[:h, :w] = image
        crops = self._warp(jnp.asarray(canvas), jnp.asarray(Ms))
        embs = np.asarray(self._embed(self.params, crops))
        for f, e in zip(faces, embs[:n]):
            f.embedding = e
        return faces

    def embed_image(self, image: np.ndarray) -> Optional[np.ndarray]:
        """Biggest face's normed embedding, or None — the `face_embed_fn`
        contract of `ZeroShotFeatureExtractor` / eval face-sim
        (`ddpm.py:2350-2360`: sorted by area, largest wins)."""
        faces = self.get(image)
        if not faces:
            return None
        return max(faces, key=lambda f: f.area).normed_embedding
