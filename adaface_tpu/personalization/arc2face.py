"""Arc2Face face-conditioned text encoding — TPU-native.

Re-design of the reference's Arc2Face stack:

- `CLIPTextModelWrapper` (`ldm/modules/arc2face_models.py:178-302`): an HF
  CLIPTextModel accepting precomputed token embeddings and a weighted blend
  of the last-N hidden states. Here that capability is *native* to
  `CLIPTextEncoder` (`input_embeds` + `skip_weights`); this module only adds
  the Arc2Face prompt-template logic as pure functions.
- `arc2face_forward_face_embs` (`ldm/util.py:1085-1131`): "photo of a id
  person" with the 'id' token embedding replaced by the zero-padded 512-d
  ArcFace embedding; the encoder output rows 4:20 are the 16 "core"
  identity prompt embeddings.
- `arc2face_inverse_face_prompt_embs` (`ldm/util.py:1138-1237`): a
  "photo of a " + 16×", " template whose comma token embeddings (rows 4:20)
  are replaced by the core identity embeddings; the fine-tuned encoder
  (`prompt2token_proj`) inverts them into the *token embedding* space,
  with several padding variants of the full 77-row output.
- `CLIPAttentionMKV.extend_weights` (`arc2face_models.py:47-87`): K/V
  capacity extension, here a pure parameter transform + a
  `kv_multipliers` config change (no module surgery).

All functions are jit-compatible: templates are tokenized on host once and
passed as int arrays; all row indices are static Python slices.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from adaface_tpu.models.clip_text import CLIPTextConfig, CLIPTextEncoder
from adaface_tpu.ops.grad import add_noise_to_tensor

# Rows 4:20 of the 77-row template hold the identity ("photo of a" = BOS + 3
# tokens, then 16 id/comma slots, `ldm/util.py:1127-1131,1189-1196`).
CORE_BEGIN, CORE_END = 4, 20
NUM_CORE_EMBS = CORE_END - CORE_BEGIN

FORWARD_TEMPLATE = "photo of a id person"
INVERSE_TEMPLATE = "photo of a " + ", " * NUM_CORE_EMBS

ARCFACE_EMB_DIM = 512


def make_template_ids(tokenizer, template: str, max_length: int = 77) -> np.ndarray:
    """[1, T] int32 ids for a prompt template (host-side, cacheable)."""
    return tokenizer([template], max_length=max_length)


def forward_face_embs_fn(
    embed_fn,  # ids [B,T] -> token embeddings [B,T,D]
    encode_fn,  # (input_embeds, skip_weights, num_skip_layers) -> [B,T,D]
    face_embs: jnp.ndarray,  # [B, 512] L2-normalized ArcFace embeddings
    template_ids: jnp.ndarray,  # [1, T] ids of FORWARD_TEMPLATE
    arcface_token_id: int,  # id of the word "id" in the tokenizer
    hidden_size: int,
    skip_weights: Optional[jnp.ndarray] = None,
    num_skip_layers: int = 1,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """ArcFace embedding -> (full [B,77,D], core [B,16,D]) prompt embeddings.

    The TPU-native `arc2face_forward_face_embs` (`ldm/util.py:1085-1131`):
    the 'id' token embedding row is replaced by the zero-padded face
    embedding via a dense mask (no boolean scatter). Callable-based so it
    runs both standalone (with `encoder.apply`) and inside flax modules.
    """
    B = face_embs.shape[0]
    ids = jnp.broadcast_to(template_ids, (B, template_ids.shape[1]))
    token_embs = embed_fn(ids)
    # zero-pad 512 -> hidden (`ldm/util.py:1093-1096`); tiny test configs
    # with hidden < 512 truncate instead
    k = min(face_embs.shape[-1], hidden_size)
    padded = jnp.pad(face_embs[..., :k], ((0, 0), (0, hidden_size - k)))
    is_id = (ids == arcface_token_id)[..., None]
    token_embs = jnp.where(is_id, padded[:, None, :].astype(token_embs.dtype),
                           token_embs)
    full = encode_fn(token_embs, skip_weights, num_skip_layers)
    return full, full[:, CORE_BEGIN:CORE_END]


def forward_face_embs(
    encoder: CLIPTextEncoder, params: dict, face_embs: jnp.ndarray,
    template_ids: jnp.ndarray, arcface_token_id: int,
    skip_weights: Optional[jnp.ndarray] = None, num_skip_layers: int = 1,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """`forward_face_embs_fn` bound to (encoder, params)."""
    embed_fn = lambda ids: encoder.apply({"params": params}, ids,
                                         method="embed_tokens")
    encode_fn = lambda e, w, n: encoder.apply(
        {"params": params}, input_embeds=e, skip_weights=w, num_skip_layers=n)
    return forward_face_embs_fn(embed_fn, encode_fn, face_embs, template_ids,
                                arcface_token_id, encoder.cfg.hidden_size,
                                skip_weights, num_skip_layers)


def inverse_face_prompt_embs_fn(
    embed_fn,
    encode_fn,
    face_prompt_embs: jnp.ndarray,  # [B, 16, D] core identity embeddings
    template_ids: jnp.ndarray,  # [1, T] ids of INVERSE_TEMPLATE
    pad_embeddings: jnp.ndarray,  # [T, D] from `make_pad_embeddings`
    return_emb_types: Sequence[str],
    hidden_state_layer_weights: Optional[jnp.ndarray] = None,  # [3,1]
    extra_words_embs: bool = False,
    zs_extra_words_scale: float = 0.5,
) -> List[jnp.ndarray]:
    """Core identity embeddings -> inverse (token-space) prompt embeddings.

    Port of `arc2face_inverse_face_prompt_embs` (`ldm/util.py:1138-1237`).
    Emb types: 'full', 'full_pad', 'full_half_pad', 'full_zeroed_extra',
    'b_core_e', 'core'. All row indices static.
    """
    B = face_prompt_embs.shape[0]
    T = template_ids.shape[1]
    ids = jnp.broadcast_to(template_ids, (B, T))
    token_embs = embed_fn(ids)
    token_embs = token_embs.at[:, CORE_BEGIN:CORE_END].set(
        face_prompt_embs.astype(token_embs.dtype))

    n_skip = (hidden_state_layer_weights.shape[0]
              if hidden_state_layer_weights is not None else 1)
    full = encode_fn(token_embs, hidden_state_layer_weights, n_skip)

    core = full[:, CORE_BEGIN:CORE_END]
    if extra_words_embs:
        # rows 20:22 hold (at most) two extra words (`ldm/util.py:1204-1207`)
        core = jnp.concatenate(
            [core, full[:, CORE_END:CORE_END + 2] * zs_extra_words_scale], axis=1)

    pad = pad_embeddings.astype(full.dtype)
    outs: List[jnp.ndarray] = []
    for emb_type in return_emb_types:
        if emb_type == "full":
            outs.append(full)
        elif emb_type == "full_pad":
            outs.append(full.at[:, 24:-1].set(pad[None, 24:-1]))
        elif emb_type == "full_half_pad":
            n_pads = T - 25
            half = n_pads // 2
            if half >= 1:
                outs.append(full.at[:, 24:24 + half].set(pad[None, 24:24 + half]))
            else:
                outs.append(full)
        elif emb_type == "full_zeroed_extra":
            out = full.at[:, 22:24].set(pad[None, 22:24])
            outs.append(out.at[:, 24:-1].set(0.0))
        elif emb_type == "b_core_e":
            outs.append(jnp.concatenate([full[:, :22], full[:, -1:]], axis=1))
        elif emb_type == "core":
            outs.append(core)
        else:
            raise ValueError(f"unknown emb type {emb_type!r}")
    return outs


def inverse_face_prompt_embs(
    encoder: CLIPTextEncoder, params: dict, face_prompt_embs: jnp.ndarray,
    template_ids: jnp.ndarray, pad_embeddings: jnp.ndarray,
    return_emb_types: Sequence[str],
    hidden_state_layer_weights: Optional[jnp.ndarray] = None,
    extra_words_embs: bool = False, zs_extra_words_scale: float = 0.5,
) -> List[jnp.ndarray]:
    """`inverse_face_prompt_embs_fn` bound to (encoder, params)."""
    embed_fn = lambda ids: encoder.apply({"params": params}, ids,
                                         method="embed_tokens")
    encode_fn = lambda e, w, n: encoder.apply(
        {"params": params}, input_embeds=e, skip_weights=w, num_skip_layers=n)
    return inverse_face_prompt_embs_fn(
        embed_fn, encode_fn, face_prompt_embs, template_ids, pad_embeddings,
        return_emb_types, hidden_state_layer_weights, extra_words_embs,
        zs_extra_words_scale)


def make_pad_embeddings(encoder: CLIPTextEncoder, params: dict,
                        pad_token_id: int, length: int = 77) -> jnp.ndarray:
    """[T, D] embeddings of an all-pad prompt INCLUDING positional
    embeddings (`subj_basis_generator.py:587-599` uses
    `clip_embeddings(pad_tokens)[0]` which adds positions).

    Unbound-module twin of `SubjBasisGenerator._pad_embeddings` (which
    runs inside flax scope and can call its submodules directly) — keep
    the two in sync; this one reads the position table straight from the
    param tree because no bound module exists at its call sites."""
    ids = jnp.full((1, length), pad_token_id, dtype=jnp.int32)
    token = encoder.apply({"params": params}, ids, method="embed_tokens")[0]
    pos_table = params["position_embedding"]["embedding"]
    return token + pos_table[:length].astype(token.dtype)


# --------------------------------------------------------------------------
# K/V capacity extension (CLIPAttentionMKV as a pure param transform)
# --------------------------------------------------------------------------

def extend_clip_mkv_params(
    params: dict,
    cfg: CLIPTextConfig,
    key: jax.Array,
    multiplier: int = 2,
    noise_std: float = 0.1,
    begin_layer_idx: int = -1,
    end_layer_idx: int = -1,
) -> Tuple[dict, CLIPTextConfig]:
    """Tile each affected layer's k/v projection `multiplier`× along the
    output dim, perturbing the extra copies with relative-std noise
    (`arc2face_models.py:47-87`, `extend_clip_attention_MKV_multiplier`
    `:285-302`). Returns (new param tree, new config with kv_multipliers).
    """
    begin = 0 if begin_layer_idx < 0 else begin_layer_idx
    end = cfg.num_layers if end_layer_idx < 0 else end_layer_idx
    mults = list(cfg.kv_multipliers or (1,) * cfg.num_layers)
    new_params = jax.tree_util.tree_map(lambda x: x, params)  # shallow copy

    for i in range(begin, min(end, cfg.num_layers)):
        layer = dict(new_params[f"layers_{i}"])
        attn = dict(layer["self_attn"])
        for pname in ("k_proj", "v_proj"):
            proj = dict(attn[pname])
            kernel, bias = proj["kernel"], proj["bias"]  # [Din, Dout*m0], [Dout*m0]
            tiled_k = jnp.concatenate([kernel] * multiplier, axis=1)
            tiled_b = jnp.concatenate([bias] * multiplier, axis=0)
            orig_out = kernel.shape[1]
            key, sub = jax.random.split(key)
            noised_extra = add_noise_to_tensor(
                sub, tiled_k[:, orig_out:], noise_std, noise_std_is_relative=True)
            proj["kernel"] = jnp.concatenate([kernel, noised_extra], axis=1)
            proj["bias"] = tiled_b
            attn[pname] = proj
        layer["self_attn"] = attn
        new_params[f"layers_{i}"] = layer
        mults[i] *= multiplier

    new_cfg = dataclasses.replace(cfg, kv_multipliers=tuple(mults))
    return new_params, new_cfg
