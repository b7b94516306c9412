"""Zero-shot subject-basis generator — TPU-native.

Re-design of the reference `SubjBasisGenerator`
(`ldm/modules/subj_basis_generator.py:369-622`), which maps identity
evidence for a NEW subject into the 16-layer × K-vector prompt embeddings
that the per-subject (non-zero-shot) path would have optimized offline:

- subject (fg) branch: Arc2Face core identity embeddings [B,16,768]
  (from `arc2face.forward_face_embs`) are inverted into the token-embedding
  space by a fine-tuned CLIP text encoder (`prompt2token_proj`, gradient
  scaled 0.4) with learnable last-3-hidden-state layer weights (init
  [1,2,4], gradient scaled 5), then broadcast to all 16 CA layers
  (`:482-560`).
- object branch: DINO ViT-S/16 features [B,384] expanded to 16 token
  embeddings by `ExpandEmbs` (`:408`). (In the reference this path computes
  `id_embs` but then falls through to an undefined `core_id_embs` — dead
  code; here the expansion IS the core embedding, which is the evident
  intent.)
- background branch: masked CLIP image features [B,257,D_img] projected and
  attended by `num_out_layers*K` latent queries through a Perceiver-style
  cross-attention (`prompt_translator`, `:448-475,536-550`), output scaled
  by `output_dim**-0.5`.

All branches blend the result with the (stop-gradient) pad-prompt
embeddings by `out_id_embs_scale` (`:552-556`). Flax-native: no module
surgery, no monkey-patching; dropout is explicit via `deterministic`.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from adaface_tpu.models.clip_text import CLIPTextConfig, CLIPTextEncoder
from adaface_tpu.ops.grad import scale_grad
from adaface_tpu.personalization.arc2face import (
    CORE_BEGIN,
    NUM_CORE_EMBS,
    inverse_face_prompt_embs_fn,
)


class PerceiverCrossAttention(nn.Module):
    """The reference's resampler `CrossAttention`
    (`subj_basis_generator.py:234-367`) in the configuration used by the
    background `prompt_translator`: linear+LN q/k/v projections, v skip
    connection from the context, identity output projection
    (`identity_to_out=True`, `:465-475`)."""

    dim: int
    num_heads: int = 6
    p_dropout: float = 0.05
    v_has_skip: bool = True
    identity_to_out: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray, context: jnp.ndarray,
                 deterministic: bool = True) -> jnp.ndarray:
        h = self.num_heads
        d = self.dim // h
        proj = lambda name: nn.Sequential([
            nn.Dense(self.dim, use_bias=False, name=f"{name}_dense"),
            nn.LayerNorm(name=f"{name}_ln"),
        ])
        q = proj("to_q")(x)  # [B, Q, D]
        k = proj("to_k")(context)  # [B, L, D]
        v = proj("to_v")(context)
        if self.v_has_skip:
            v = v + context

        B, Q, _ = q.shape
        L = k.shape[1]
        split = lambda t, n: t.reshape(B, n, h, d).transpose(0, 2, 1, 3)
        scale = d ** -0.25
        sim = jnp.einsum("bhqd,bhkd->bhqk", split(q, Q) * scale,
                         split(k, L) * scale,
                         preferred_element_type=jnp.float32)
        attn = jax.nn.softmax(sim, axis=-1).astype(v.dtype)
        attn = nn.Dropout(self.p_dropout)(attn, deterministic=deterministic)
        out = jnp.einsum("bhqk,bhkd->bhqd", attn, split(v, L))
        out = out.transpose(0, 2, 1, 3).reshape(B, Q, self.dim)
        if not self.identity_to_out:
            out = nn.Dense(self.dim, use_bias=False, name="to_out")(out)
            out = nn.Dropout(self.p_dropout)(out, deterministic=deterministic)
            out = nn.LayerNorm(name="to_out_ln")(out)
        return out


class SubjBasisGenerator(nn.Module):
    """One generator per placeholder string (fg subject or bg), exactly as
    the reference registers them (`embedding_manager.py:1160-1177`)."""

    placeholder_is_bg: bool = False
    num_out_layers: int = 16  # UNet CA layers
    num_out_embs_per_layer: int = 16  # K: 16 subj (== core count), 4 bg
    output_dim: int = 768
    image_embedding_dim: int = 1280  # CLIP vision feature dim (laion 1280 / openai 768)
    dino_embedding_dim: int = 384
    num_heads: int = 6
    prompt2token_proj_grad_scale: float = 0.4
    hidden_state_weights_grad_scale: float = 5.0
    zs_extra_words_scale: float = 0.5
    # text-encoder config for prompt2token_proj (subject branch only)
    proj_cfg: Optional[CLIPTextConfig] = None
    pad_token_id: int = 49407
    bg_num_id_vecs: int = 257  # CLIP vision tokens (`num_id_vecs['bg']`)
    # fg pos_embs row count; the reference defaults `num_id_vecs['subj']` to
    # 77 (`subj_basis_generator.py:375`) and never uses fg pos_embs — kept
    # configurable so imported checkpoints shape-match exactly
    fg_num_id_vecs: int = 77

    def setup(self):
        D = self.output_dim
        num_id_vecs = self.bg_num_id_vecs if self.placeholder_is_bg else self.fg_num_id_vecs
        self.pos_embs = self.param(
            "pos_embs", nn.initializers.normal(1.0), (1, num_id_vecs, D))
        self.pos_embs_ln = nn.LayerNorm(name="pos_embs_ln")

        if self.placeholder_is_bg:
            self.bg_proj_in = nn.Sequential([
                nn.Dense(D, use_bias=False, name="bg_proj_dense"),
                nn.LayerNorm(name="bg_proj_ln"),
            ])
            n_latents = self.num_out_layers * self.num_out_embs_per_layer
            self.latent_queries = self.param(
                "latent_queries", nn.initializers.normal(1.0), (1, n_latents, D))
            self.latent_queries_ln = nn.LayerNorm(name="latent_queries_ln")
            self.prompt_translator = PerceiverCrossAttention(
                dim=D, num_heads=self.num_heads, name="prompt_translator")
        else:
            cfg = self.proj_cfg or CLIPTextConfig.vit_l_14()
            self.prompt2token_proj = CLIPTextEncoder(cfg, name="prompt2token_proj")
            # learnable last-3-hidden-state weights, init [1, 2, 4]
            # (`subj_basis_generator.py:571-578`)
            self.hidden_state_layer_weights = self.param(
                "hidden_state_layer_weights",
                lambda _: jnp.array([[1.0], [2.0], [4.0]]))
            # ExpandEmbs for DINO object features (`:137-144,408`)
            self.obj_proj_in = nn.Sequential([
                nn.Dense(NUM_CORE_EMBS * D, use_bias=False, name="obj_proj_dense"),
            ])
            self.obj_proj_ln = nn.LayerNorm(name="obj_proj_ln")

    def _pad_embeddings(self, length: int) -> jnp.ndarray:
        """[T, D] all-pad prompt embeddings incl. positions, detached
        (`generate_pad_embeddings`, `subj_basis_generator.py:583-599`)."""
        ids = jnp.full((1, length), self.pad_token_id, dtype=jnp.int32)
        tok = self.prompt2token_proj.embed_tokens(ids)[0]
        pos = self.prompt2token_proj.position_embedding(
            jnp.arange(length, dtype=jnp.int32))
        return jax.lax.stop_gradient(tok + pos.astype(tok.dtype))

    def __call__(
        self,
        clip_features: Optional[jnp.ndarray],  # [B, 257, D_img] (bg branch)
        raw_id_embs: Optional[jnp.ndarray],  # [B, 384] DINO (object branch)
        arc2face_id_embs: Optional[jnp.ndarray],  # [B, 16, D] (face branch)
        out_id_embs_scale: float = 1.0,
        is_face: bool = True,
        is_training: bool = False,
        inverse_template_ids: Optional[jnp.ndarray] = None,  # [1, 77]
        arc2face_inverse_prompt_embs_inf_type: str = "full_half_pad",
        deterministic: bool = True,
    ) -> Tuple[jnp.ndarray, Optional[jnp.ndarray]]:
        """Returns (output_embs [B, L, K, D], inverse_prompt_embs [B,77,D] or
        None). Mirrors `SubjBasisGenerator.forward` (`:482-560`)."""
        D = self.output_dim
        K = self.num_out_embs_per_layer
        L = self.num_out_layers
        inverse_prompt_embs = None

        if self.placeholder_is_bg:
            B = clip_features.shape[0]
            id_embs = self.bg_proj_in(clip_features)
            id_embs = id_embs + self.pos_embs_ln(self.pos_embs)
            latents = jnp.broadcast_to(
                self.latent_queries_ln(self.latent_queries),
                (B, L * K, D))
            out = self.prompt_translator(latents, id_embs,
                                         deterministic=deterministic)
            output_embs = out.reshape(B, L, K, D) * (D ** -0.5)
            # No pad blend on the bg branch. The reference's blend site
            # (`subj_basis_generator.py:557-558`) would dereference
            # `self.pad_embeddings` — an attribute its bg __init__
            # (`:448-474`) NEVER creates (only the fg is_face path
            # generates it, `:508-511`) — i.e. the reference bg forward
            # can only ever have run at its default
            # zs_out_id_embs_scale_range=(1.0, 1.0), where the blend is
            # the identity. Scale-multiply-only is therefore the faithful
            # live behavior; a non-1 scale here shrinks rather than
            # crashes.
            if out_id_embs_scale != 1.0:
                output_embs = output_embs * out_id_embs_scale
            return output_embs, None

        # ------------------------------------------------ subject branch
        if is_face:
            assert arc2face_id_embs is not None
            B = arc2face_id_embs.shape[0]
            T = (inverse_template_ids.shape[1]
                 if inverse_template_ids is not None else 77)
            pad_embeddings = self._pad_embeddings(T)
            hslw = scale_grad(self.hidden_state_layer_weights,
                              self.hidden_state_weights_grad_scale)
            emb_type = "full_pad" if is_training else \
                arc2face_inverse_prompt_embs_inf_type
            embed_fn = lambda ids: self.prompt2token_proj.embed_tokens(ids)
            encode_fn = lambda e, w, n: self.prompt2token_proj(
                input_embeds=e, skip_weights=w, num_skip_layers=n)
            inverse_prompt_embs, core_id_embs = inverse_face_prompt_embs_fn(
                embed_fn, encode_fn, arc2face_id_embs, inverse_template_ids,
                pad_embeddings, (emb_type, "core"),
                hidden_state_layer_weights=hslw,
                zs_extra_words_scale=self.zs_extra_words_scale)
            # reduce the update rate of prompt2token_proj (`:530-533`)
            inverse_prompt_embs = scale_grad(inverse_prompt_embs,
                                             self.prompt2token_proj_grad_scale)
            core_id_embs = scale_grad(core_id_embs,
                                      self.prompt2token_proj_grad_scale)
        elif raw_id_embs is not None:
            B = raw_id_embs.shape[0]
            T = 77
            pad_embeddings = self._pad_embeddings(T)
            core_id_embs = self.obj_proj_ln(
                self.obj_proj_in(raw_id_embs).reshape(B, NUM_CORE_EMBS, D))
        else:
            raise ValueError("subject branch needs arc2face_id_embs or raw_id_embs")

        # [B, 16, D] -> [B, L, 16, D]; K must equal the core count for the
        # subject branch, like the reference (`:545-556`).
        assert K == NUM_CORE_EMBS, (
            f"subject K={K} must equal the {NUM_CORE_EMBS} core id embeddings")
        id_embs_out = jnp.broadcast_to(core_id_embs[:, None],
                                       (B, L, NUM_CORE_EMBS, D))
        pad_rows = pad_embeddings[CORE_BEGIN - 2:CORE_BEGIN - 2 + K]
        output_embs = (id_embs_out * out_id_embs_scale
                       + pad_rows[None, None] * (1.0 - out_id_embs_scale))
        return output_embs, inverse_prompt_embs
