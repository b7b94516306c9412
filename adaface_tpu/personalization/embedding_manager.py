"""Embedding manager: placeholder registry + layerwise prompt patching.

TPU-native re-design of the reference `EmbeddingManager`
(`ldm/modules/embedding_manager.py:940-2259`). The reference intercepts the
CLIP token-embedding layer, repeats each prompt 16× along the batch dim and
scatter-writes subject embeddings at dynamically-found placeholder indices.
Here (SURVEY.md §7.1):

- placeholder occupancy is a dense `[B, T]` slot map (k-index or -1) built
  on host at tokenization time — device code is a static-shape gather +
  where, no dynamic scatter;
- the layer dim is a leading axis `[L, B, T, D]`, never tucked into batch;
- multi-vector tokens occupy K *consecutive* slots, exactly like the
  reference which overwrites the K-1 following positions (`:1556-1559`;
  the data pipeline pads prompts with ", " to make room,
  `personalized.py:888-893`).

Checkpoint import reads the reference's `embeddings_gs-*.pt` (pickled
torch modules) through the restricted unpickler; native checkpoints are
plain .npz trees.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from adaface_tpu.personalization.static_embedding import (
    StaticEmbedderParams,
    compute_static_embedding,
    init_static_embedder,
    static_embedder_from_torch_stub,
)
from adaface_tpu.interop.torch_pickle import (
    TorchObjectStub,
    load_torch_checkpoint,
    walk_stub_tree,
)

NUM_CA_LAYERS = 16


@dataclasses.dataclass
class PlaceholderInfo:
    """Host-side static metadata for one placeholder string."""

    string: str
    token_id: int  # id in the (extended) vocab
    num_vectors: int  # K
    is_background: bool = False


class EmbeddingManager:
    """Host-side orchestrator. Embedder params live in a dict pytree so they
    can be passed through jit/grad; this object only holds static metadata
    and the param tree."""

    def __init__(self):
        self.placeholders: Dict[str, PlaceholderInfo] = {}
        self.embedders: Dict[str, StaticEmbedderParams] = {}
        self.emb_global_scale_scores: Dict[str, float] = {}
        # zero-shot: placeholder -> (SubjBasisGenerator module, params)
        self.subj_basis_generators: Dict[str, tuple] = {}
        # frozen Arc2Face text encoder (module, params) for the forward pass
        self.arc2face_encoder = None
        self.use_conv_attn_kernel_size: int = -1

    # ---------------------------------------------------------------- zero-shot
    def add_zero_shot_placeholder(self, string: str, token_id: int,
                                  generator, generator_params: dict,
                                  num_vectors: Optional[int] = None,
                                  is_background: bool = False):
        """Register a placeholder whose embeddings come from a
        `SubjBasisGenerator` instead of an optimized static embedder
        (`embedding_manager.py:1160-1177`). In zero-shot mode the static
        embedder degenerates to a passthrough (`:507-514`), so none is
        created here. `num_vectors` defaults to the generator's K (16 fg /
        4 bg) — a mismatch would mark more prompt slots than the generator
        emits, and JAX's clipping gather would then silently duplicate the
        last embedding into the extra slots."""
        gen_k = getattr(generator, "num_out_embs_per_layer", None)
        if num_vectors is None:
            num_vectors = gen_k if gen_k is not None else 16
        elif gen_k is not None and num_vectors != gen_k:
            raise ValueError(
                f"placeholder '{string}': num_vectors={num_vectors} != the "
                f"generator's num_out_embs_per_layer={gen_k}")
        self.placeholders[string] = PlaceholderInfo(
            string, token_id, num_vectors, is_background)
        self.subj_basis_generators[string] = (generator, generator_params)
        self.emb_global_scale_scores.setdefault(string, 0.0)

    def compute_zero_shot_embeddings(
        self,
        features,  # ZeroShotFeatures
        inverse_template_ids: jnp.ndarray,  # [1, 77]
        forward_template_ids: Optional[jnp.ndarray] = None,  # [1, 77]
        arcface_token_id: Optional[int] = None,
        out_id_embs_scale: float = 1.0,
        is_face: bool = True,
        is_training: bool = False,
        inf_emb_type: str = "full_half_pad",
    ) -> Tuple[Dict[str, jnp.ndarray], Optional[jnp.ndarray]]:
        """placeholder -> [L, B, K, D] zero-shot subject embeddings, plus the
        inverse prompt embeddings of the (single) fg subject. The zero-shot
        dataflow of `get_static_embedding` (`embedding_manager.py:1400-1505`):
        id embs -> frozen Arc2Face forward -> SubjBasisGenerator inverse.
        """
        from adaface_tpu.personalization.arc2face import forward_face_embs

        arc2face_id_embs = None
        if is_face and features.id_embs is not None:
            assert self.arc2face_encoder is not None, \
                "set arc2face_encoder=(module, params) for zero-shot faces"
            enc, enc_params = self.arc2face_encoder
            _, arc2face_id_embs = forward_face_embs(
                enc, enc_params, jax.lax.stop_gradient(features.id_embs),
                forward_template_ids, arcface_token_id)

        out: Dict[str, jnp.ndarray] = {}
        inverse_prompt_embs = None
        for s, (gen, gparams) in self.subj_basis_generators.items():
            info = self.placeholders[s]
            clip_feats = features.clip_bg if info.is_background else features.clip_fg
            embs, inv = gen.apply(
                {"params": gparams}, clip_feats,
                None if is_face else features.id_embs,
                arc2face_id_embs,
                out_id_embs_scale=out_id_embs_scale,
                is_face=is_face, is_training=is_training,
                inverse_template_ids=inverse_template_ids,
                arc2face_inverse_prompt_embs_inf_type=inf_emb_type)
            # [B, L, K, D] -> [L, B, K, D] (our layerwise-leading layout)
            out[s] = jnp.transpose(embs, (1, 0, 2, 3))
            if inv is not None and not info.is_background:
                inverse_prompt_embs = inv
        return out, inverse_prompt_embs

    # ------------------------------------------------------------------ setup
    def add_placeholder(self, string: str, token_id: int, num_vectors: int = 1,
                        is_background: bool = False,
                        embedder: Optional[StaticEmbedderParams] = None,
                        init_key: Optional[jax.Array] = None,
                        init_vecs: Optional[np.ndarray] = None,
                        init_vec_weights: Optional[np.ndarray] = None,
                        rank: int = 6, emb_dim: int = 768):
        info = PlaceholderInfo(string, token_id, num_vectors, is_background)
        self.placeholders[string] = info
        if embedder is None:
            key = init_key if init_key is not None else jax.random.PRNGKey(len(self.placeholders))
            embedder = init_static_embedder(
                key, NUM_CA_LAYERS, num_vectors, emb_dim=emb_dim, rank=rank,
                init_vecs=init_vecs, init_vec_weights=init_vec_weights)
        self.embedders[string] = embedder
        self.emb_global_scale_scores.setdefault(string, 0.0)

    # --------------------------------------------------------------- host side
    def build_slot_maps(self, token_ids: np.ndarray) -> Dict[str, np.ndarray]:
        """For each placeholder: [B, T] int map, value k in [0, K) if the
        position is the k-th vector slot of that placeholder, else -1.
        Only the FIRST occurrence per instance becomes the subject slots
        (`embedding_manager.py:1369-1371`); later occurrences are left as
        ordinary tokens."""
        token_ids = np.asarray(token_ids)
        B, T = token_ids.shape
        maps = {}
        for s, info in self.placeholders.items():
            m = np.full((B, T), -1, dtype=np.int32)
            for b in range(B):
                pos = np.nonzero(token_ids[b] == info.token_id)[0]
                if len(pos) == 0:
                    continue
                p = int(pos[0])
                for k in range(info.num_vectors):
                    if p + k < T:
                        m[b, p + k] = k
            maps[s] = m
        return maps

    # -------------------------------------------------------------- device side
    def compute_subject_embeddings(self) -> Dict[str, jnp.ndarray]:
        """placeholder -> [L, K, D] (jit-able through the param pytree)."""
        return {s: compute_static_embedding(p) for s, p in self.embedders.items()}

    @staticmethod
    def patch_prompt_embeddings(
        embedded_text: jnp.ndarray,  # [B, T, D] CLIP token embeddings
        slot_maps: Dict[str, jnp.ndarray],  # placeholder -> [B, T]
        subject_embs: Dict[str, jnp.ndarray],  # placeholder -> [L, K, D] or [L, B, K, D]
    ) -> jnp.ndarray:
        """Returns [L, B, T, D]: per-CA-layer token embeddings with
        placeholder slots replaced by the subject embeddings. Static
        [L, K, D] embeddings (per-subject inversion) broadcast over the
        batch; zero-shot embeddings are per-instance [L, B, K, D]
        (`embedding_manager.py:1505-1559`)."""
        out = jnp.broadcast_to(embedded_text[None],
                               (NUM_CA_LAYERS,) + embedded_text.shape)
        B = embedded_text.shape[0]
        for s, emb in subject_embs.items():
            sm = jnp.asarray(slot_maps[s])  # [B, T]
            k = jnp.clip(sm, 0)
            if emb.ndim == 3:
                gathered = emb[:, k]  # [L, B, T, D]
            else:
                gathered = emb[:, jnp.arange(B)[:, None], k]  # [L, B, T, D]
            keep = (sm >= 0)[None, :, :, None]
            out = jnp.where(keep, gathered.astype(out.dtype), out)
        return out

    @staticmethod
    def distribute_cls_embeddings(ctx: jnp.ndarray,
                                  slot_map: jnp.ndarray) -> jnp.ndarray:
        """Class-prompt analog of multi-vector subject tokens
        (`distribute_embedding_to_M_tokens`, `ldm/util.py:883-919`, applied
        to the cls halves of the 4-type battery at `ddpm.py:2039-2046`):
        the class prompt pads a single class word with commas to align with
        the K subject vectors ("person , , ,"), so at the K aligned
        positions (slot map from the SUBJECT prompt) the encoded class
        embeddings are replaced by the first position's embedding / sqrt(K)
        — the class word distributed over the pad slots, damped so
        cross-attention doesn't over-focus on it. ctx: [L, B, T, D];
        slot_map: [B, T] (k at the k-th vector slot, -1 elsewhere).
        Instances without the placeholder (or K=1) pass through."""
        sm = jnp.asarray(slot_map)
        is_slot = sm >= 0  # [B, T]
        m = is_slot.sum(axis=1)  # [B]
        B = sm.shape[0]
        pos0 = jnp.argmax(sm == 0, axis=1)  # [B] first-slot position
        first = ctx[:, jnp.arange(B), pos0]  # [L, B, D]
        repl = first / jnp.sqrt(jnp.maximum(m, 1).astype(ctx.dtype)
                                )[None, :, None]
        keep = (is_slot & (m > 1)[:, None])[None, :, :, None]
        return jnp.where(keep, repl[:, :, None, :], ctx)

    # ------------------------------------------------------------- checkpoints
    def save_native(self, path: str):
        """Native checkpoint: flat .npz + a tiny JSON header."""
        import json

        arrays = {}
        header = {"placeholders": [], "use_conv_attn_kernel_size": self.use_conv_attn_kernel_size}
        for s, info in self.placeholders.items():
            if s not in self.embedders:
                # generator-backed (zero-shot) placeholder: the trained
                # artifact is the SubjBasisGenerator, exported separately
                # (`scripts/export_embeddings.py --zs`) — nothing static
                # to save here, and indexing would KeyError
                continue
            header["placeholders"].append(dataclasses.asdict(info))
            header.setdefault("scores", {})[s] = float(self.emb_global_scale_scores[s])
            p = self.embedders[s]
            for fname in ("basis_rand_weights", "basis_comm_weights", "basis_vecs",
                          "pre_vecs", "bias"):
                v = getattr(p, fname)
                if v is not None:
                    arrays[f"{s}::{fname}"] = np.asarray(v)
        arrays["__header__"] = np.frombuffer(json.dumps(header).encode(), dtype=np.uint8)
        np.savez(path, **arrays)

    @classmethod
    def load_native(cls, path: str) -> "EmbeddingManager":
        import json

        z = np.load(path)
        header = json.loads(bytes(z["__header__"]).decode())
        mgr = cls()
        mgr.use_conv_attn_kernel_size = header.get("use_conv_attn_kernel_size", -1)
        for pdict in header["placeholders"]:
            s = pdict["string"]
            fields = {}
            for fname in ("basis_rand_weights", "basis_comm_weights", "basis_vecs",
                          "pre_vecs", "bias"):
                key = f"{s}::{fname}"
                fields[fname] = jnp.asarray(z[key]) if key in z.files else None
            mgr.placeholders[s] = PlaceholderInfo(**pdict)
            mgr.embedders[s] = StaticEmbedderParams(**fields)
            mgr.emb_global_scale_scores[s] = header.get("scores", {}).get(s, 0.0)
        return mgr

    def load_reference_checkpoint(self, path: str,
                                  token_id_resolver=None,
                                  placeholder_remap: Optional[Dict[str, str]] = None,
                                  load_subj_basis_generators: bool = True,
                                  extend_attention_multiplier: int = -1,
                                  ext_perturb_ratio: float = 0.0,
                                  ext_key: Optional[jax.Array] = None):
        """Import a reference `embeddings_gs-*.pt` (format:
        `embedding_manager.py:1820-1834`). `token_id_resolver(string)` maps a
        placeholder string to a token id in OUR vocab (defaults to sequential
        ids starting at 49408). `placeholder_remap` renames placeholders on
        load, the analog of the reference's `ckpt:z-z2` syntax
        (`embedding_manager.py:1869-1883`).

        Zero-shot: `string_to_subj_basis_generator_dict` modules are imported
        into flax `SubjBasisGenerator`s (`interop/subj_basis.py`), including
        MKV-extended prompt2token_proj attention.
        `extend_attention_multiplier` replays the reference's load-time
        surgery (`embedding_manager.py:1884-1977`): if the checkpoint is
        unextended, extend all proj layers by the multiplier; if already
        extended by `m0` and the request is `m0*r`, further extend the first
        3 layers by `r` (the reference's second-ext recipe)."""
        ckpt = load_torch_checkpoint(path)
        remap = placeholder_remap or {}
        token2num = {str(k): int(np.asarray(v)) for k, v in
                     dict(ckpt.get("token2num_vectors", {})).items()}
        # ckpt scores are a flat tensor aligned with string_to_token_dict
        # order (`embedding_manager.py:2003-2004`); carried for checkpoint
        # round-trip fidelity (the reference's only live use is a load-time
        # print — its application site, `ddpm.py:1024-1035`, is commented
        # out, so nothing here applies them either)
        score_by_name = {}
        if "emb_global_scale_scores" in ckpt:
            names = list(dict(ckpt.get("string_to_token_dict", {})).keys())
            scores = np.asarray(ckpt["emb_global_scale_scores"]).reshape(-1)
            score_by_name = {str(n): float(scores[i])
                             for i, n in enumerate(names) if i < len(scores)}
        bg_strings = list(ckpt.get("background_strings") or [])
        embedders = ckpt["string_to_static_embedder"]
        # ParameterDict stub: modules under _parameters/_modules or plain attrs
        if isinstance(embedders, TorchObjectStub):
            d = embedders.__dict__
            items = dict(d.get("_parameters") or {})
            items.update(d.get("_modules") or {})
        else:
            items = dict(embedders)
        next_id = 49408 + len(self.placeholders)
        for name, stub in items.items():
            target = remap.get(name, name)
            flat = walk_stub_tree(stub)
            params = static_embedder_from_torch_stub(flat)
            K = token2num.get(name, 1)
            if params.bias is not None:
                K = params.bias.shape[1]
            if token_id_resolver is not None:
                tid = token_id_resolver(target)
            else:
                tid = next_id
                next_id += 1
            self.placeholders[target] = PlaceholderInfo(
                string=target, token_id=tid, num_vectors=K,
                is_background=(name in bg_strings))
            if params.basis_vecs is not None or params.pre_vecs is not None:
                self.embedders[target] = params
            # else: do_zero_shot degenerate embedder (reference
            # `embedding_manager.py:426-435`: basis_vecs=pre_vecs=None,
            # a passthrough) — the subj-basis generator supplies the
            # embeddings; registering it would crash
            # compute_static_embedding on the no-basis param set
            self.emb_global_scale_scores[target] = score_by_name.get(
                name, self.emb_global_scale_scores.get(target, 0.0))
        if "use_conv_attn_kernel_size" in ckpt and ckpt["use_conv_attn_kernel_size"] is not None:
            try:
                self.use_conv_attn_kernel_size = int(np.asarray(ckpt["use_conv_attn_kernel_size"]))
            except (TypeError, ValueError):
                pass

        if load_subj_basis_generators:
            self._load_subj_basis_generators(
                ckpt, remap, extend_attention_multiplier, ext_perturb_ratio,
                ext_key)
        return self

    def _load_subj_basis_generators(self, ckpt, remap,
                                    extend_attention_multiplier=-1,
                                    ext_perturb_ratio=0.0, ext_key=None):
        """Import `string_to_subj_basis_generator_dict` (zero-shot ckpts)."""
        from adaface_tpu.interop.subj_basis import (
            build_generator_from_meta,
            map_subj_basis_generator,
        )

        gens = ckpt.get("string_to_subj_basis_generator_dict")
        if gens is None:
            return
        if isinstance(gens, TorchObjectStub):
            items = dict(gens.__dict__.get("_modules") or {})
        else:
            items = dict(gens)
        for name, stub in items.items():
            target = remap.get(name, name)
            params, meta = map_subj_basis_generator(stub)
            params = jax.tree_util.tree_map(jnp.asarray, params)

            if (not meta.placeholder_is_bg
                    and extend_attention_multiplier > 1):
                from adaface_tpu.personalization.arc2face import (
                    extend_clip_mkv_params,
                )
                from adaface_tpu.models.clip_text import CLIPTextConfig

                proj_cfg = CLIPTextConfig.vit_l_14(
                    kv_multipliers=meta.kv_multipliers,
                    num_layers=meta.num_proj_layers or 12)
                key = ext_key if ext_key is not None else jax.random.PRNGKey(0)
                m0 = max(meta.kv_multipliers or (1,))
                if m0 == 1:
                    # unextended ckpt: extend ALL layers (`:1934-1940`)
                    params["prompt2token_proj"], proj_cfg = extend_clip_mkv_params(
                        params["prompt2token_proj"], proj_cfg, key,
                        multiplier=extend_attention_multiplier,
                        noise_std=ext_perturb_ratio)
                elif extend_attention_multiplier % m0 == 0 \
                        and extend_attention_multiplier > m0:
                    # already extended by m0: second-ext of the first 3
                    # layers by the ratio (`:1957-1971`)
                    params["prompt2token_proj"], proj_cfg = extend_clip_mkv_params(
                        params["prompt2token_proj"], proj_cfg, key,
                        multiplier=extend_attention_multiplier // m0,
                        noise_std=ext_perturb_ratio,
                        begin_layer_idx=0, end_layer_idx=3)
                meta = dataclasses.replace(
                    meta, kv_multipliers=proj_cfg.kv_multipliers)

            gen = build_generator_from_meta(meta)
            info = self.placeholders.get(target)
            if info is not None:
                info.is_background = meta.placeholder_is_bg or info.is_background
                self.subj_basis_generators[target] = (gen, params)
            else:
                self.add_zero_shot_placeholder(
                    target, token_id=49408 + len(self.placeholders),
                    generator=gen, generator_params=params,
                    num_vectors=meta.num_out_embs_per_layer,
                    is_background=meta.placeholder_is_bg)
