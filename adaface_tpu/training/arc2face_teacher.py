"""Arc2Face teacher assembly — the reference `Arc2FaceWrapper` equivalent.

The reference loads a diffusers `UNet2DConditionModel` (arc2face release
weights) plus a fine-tuned `CLIPTextModelWrapper` and, per distillation
iteration, generates teacher prompt embeddings from face identity
embeddings (`/root/reference/ldm/models/diffusion/ddpm.py:5398-5475`,
`gen_arc2face_prompt_embs` `:5413-5425`). Here:

- the teacher UNet is our `UNetModel` with params imported through
  `interop.diffusers_unet.load_diffusers_unet`;
- the prompt-embedding generation is `arc2face.forward_face_embs` on our
  `CLIPTextEncoder` (weights via `interop.hf_clip`);
- the identity source is either a `face_embed_fn` over the batch images
  (real faces) or random embeddings (`p_gen_arc2face_rand_face`,
  `ddpm.py:1714-1779`), with optional noise + first-subject batch collapse.

`Arc2FaceTeacher.as_tuple()` returns the `(teacher_unet, teacher_params,
teacher_ctx_fn)` triple `Trainer.fit(arc2face_teacher=...)` consumes.
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from adaface_tpu.models.clip_text import CLIPTextConfig, CLIPTextEncoder
from adaface_tpu.models.unet import UNetConfig, UNetModel
from adaface_tpu.personalization.arc2face import (
    ARCFACE_EMB_DIM,
    FORWARD_TEMPLATE,
    forward_face_embs,
)


class Arc2FaceTeacher:
    def __init__(self, unet: UNetModel, unet_params: dict,
                 encoder: CLIPTextEncoder, enc_params: dict, tokenizer,
                 face_embed_fn: Optional[Callable] = None, seed: int = 0):
        self.unet = unet
        self.unet_params = unet_params
        self.encoder = encoder
        self.enc_params = enc_params
        self.face_embed_fn = face_embed_fn
        self._fwd_ids = jnp.asarray(tokenizer([FORWARD_TEMPLATE]))
        self._id_tok = int(tokenizer.encode("id")[0])
        self._rng = np.random.default_rng(seed)

    def _id_embs(self, examples: Sequence[dict], plan) -> np.ndarray:
        B = len(examples)
        if plan.gen_arc2face_rand_face or self.face_embed_fn is None:
            embs = self._rng.standard_normal((B, ARCFACE_EMB_DIM)).astype(np.float32)
        else:
            embs = []
            for e in examples:
                v = self.face_embed_fn(e["image_unnorm"])
                if v is None:  # faceless fallback (`ddpm.py:2350-2363`)
                    v = self._rng.standard_normal(ARCFACE_EMB_DIM).astype(np.float32)
                embs.append(np.asarray(v, np.float32))
            embs = np.stack(embs)
        return embs / (np.linalg.norm(embs, axis=-1, keepdims=True) + 1e-12)

    def ctx(self, examples: Sequence[dict], plan) -> jnp.ndarray:
        """[B, 77, D] arc2face prompt embeddings for the teacher UNet."""
        id_embs = jnp.asarray(self._id_embs(examples, plan))
        full, _ = forward_face_embs(self.encoder, self.enc_params, id_embs,
                                    self._fwd_ids, self._id_tok)
        return full

    def as_tuple(self):
        return self.unet, self.unet_params, self.ctx


def load_arc2face_teacher(unet_path: str, text_encoder_path: str, tokenizer,
                          face_embed_fn: Optional[Callable] = None,
                          dtype=jnp.float32,
                          unet_cfg: Optional[UNetConfig] = None) -> Arc2FaceTeacher:
    """Build the teacher from released arc2face weights: `unet_path` is the
    diffusers UNet dir/file, `text_encoder_path` a CLIPTextModel(.wrapper)
    state dict (.safetensors or torch .bin/.pt)."""
    from adaface_tpu.interop.diffusers_unet import load_diffusers_unet
    from adaface_tpu.interop.hf_clip import map_clip_text_params
    from adaface_tpu.interop.torch_pickle import (
        load_safetensors,
        load_torch_checkpoint,
    )

    ucfg = unet_cfg or UNetConfig.sd_v1()
    unet_params = jax.tree_util.tree_map(
        lambda a: jnp.asarray(a, dtype), load_diffusers_unet(unet_path, ucfg))

    import os

    path = text_encoder_path
    if os.path.isdir(path):
        for name in ("model.safetensors", "pytorch_model.bin"):
            cand = os.path.join(path, name)
            if os.path.exists(cand):
                path = cand
                break
    sd = (load_safetensors(path) if path.endswith(".safetensors")
          else load_torch_checkpoint(path))
    sd = {k: np.asarray(v) for k, v in dict(sd).items()}
    prefix = "text_model." if any(k.startswith("text_model.") for k in sd) \
        else ""
    n_layers = 1 + max(int(k.split("encoder.layers.")[1].split(".")[0])
                       for k in sd if "encoder.layers." in k)
    enc_params = jax.tree_util.tree_map(
        jnp.asarray, map_clip_text_params(sd, num_layers=n_layers,
                                          prefix=prefix))
    hidden = int(sd[prefix + "embeddings.token_embedding.weight"].shape[1])
    inter = int(sd[prefix + "encoder.layers.0.mlp.fc1.weight"].shape[0])
    heads = next(h for h in (12, 8, 4, 2, 1) if hidden % h == 0)
    enc = CLIPTextEncoder(CLIPTextConfig.vit_l_14(
        hidden_size=hidden, num_layers=n_layers, num_heads=heads,
        intermediate_size=inter))
    return Arc2FaceTeacher(UNetModel(ucfg, dtype), unet_params, enc,
                           enc_params, tokenizer, face_embed_fn)
