"""Static layerwise subject embeddings (the per-subject learned artifact).

Pure-function re-implementation of the reference `StaticLayerwiseEmbedding`
(`ldm/modules/embedding_manager.py:360-537`): K embeddings per token × L=16
cross-attention layers, generated from a low-rank basis:

    weights  = basis_rand_weights + basis_comm_weights        # [L, K, r]
    basis    = concat(pre_vecs, basis_vecs, axis=1)           # [K, r, D]
    out[l,k] = LayerNorm_no_affine(weights[l,k] @ basis[k]) / sqrt(D) + bias[l,k]

In zero-shot mode the embedder degenerates to a passthrough of the
SubjBasisGenerator output (`embedding_manager.py:507-514`); that path lives
in the embedding manager, not here.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct


@struct.dataclass
class StaticEmbedderParams:
    basis_rand_weights: jnp.ndarray  # [L, K, r]
    basis_comm_weights: jnp.ndarray  # [1, K, r]
    basis_vecs: Optional[jnp.ndarray]  # [K, r-N, D] (None if fully spanned by pre_vecs)
    pre_vecs: Optional[jnp.ndarray]  # [K, N, D] init-word vectors (None if N=0)
    bias: Optional[jnp.ndarray]  # [L, K, D]


def init_static_embedder(
    key: jax.Array,
    num_layers: int = 16,
    num_vectors: int = 1,
    emb_dim: int = 768,
    rank: int = 6,
    init_vecs: Optional[np.ndarray] = None,  # [N, D] class-word embeddings
    init_vec_weights: Optional[np.ndarray] = None,  # [N], sums to 1
    init_noise_stds=(0.1, 0.04),
    has_bias: bool = True,
) -> StaticEmbedderParams:
    """Init matching `embedding_manager.py:414-495`: random weights scaled by
    init_noise_stds around the common weights; random basis vectors
    normalized /4 with the last zeroed; pre_vecs = repeated init vectors."""
    k1, k2 = jax.random.split(key)
    L, K, r, D = num_layers, num_vectors, rank, emb_dim
    brw = jax.random.normal(k1, (L, K, r), jnp.float32)
    if init_vecs is not None:
        init_vecs = np.asarray(init_vecs, np.float32)
        N = init_vecs.shape[0]
        pre_vecs = jnp.asarray(np.tile(init_vecs[None], (K, 1, 1)))
        bcw = jnp.full((1, K, r), 1.0 / N, jnp.float32)
        bcw = bcw.at[:, :, N:].multiply(0.4)
        if init_vec_weights is not None:
            bcw = bcw.at[:, :, :N].set(jnp.asarray(init_vec_weights)[None, None, :])
        brw = brw.at[:, :, :N].multiply(init_noise_stds[1])
        brw = brw.at[:, :, N:].multiply(init_noise_stds[0])
    else:
        N = 0
        pre_vecs = None
        bcw = jnp.full((1, K, r), 1.0 / r, jnp.float32)
    bv = jax.random.normal(k2, (K, r - N, D), jnp.float32)
    bv = bv / jnp.linalg.norm(bv, axis=-1, keepdims=True) / 4.0
    bv = bv.at[-1].set(0.0) if (r - N) > 0 else bv
    basis_vecs = bv if (r - N) > 0 else None
    bias = jnp.zeros((L, K, D), jnp.float32) if has_bias else None
    return StaticEmbedderParams(brw, bcw, basis_vecs, pre_vecs, bias)


def compute_static_embedding(p: StaticEmbedderParams) -> jnp.ndarray:
    """[L, K, D] embeddings (`embedding_manager.py:500-537` forward)."""
    weights = p.basis_rand_weights + p.basis_comm_weights  # [L, K, r]
    parts = [v for v in (p.pre_vecs, p.basis_vecs) if v is not None]
    basis = jnp.concatenate(parts, axis=1) if len(parts) > 1 else parts[0]  # [K, r, D]
    out = jnp.einsum("lkr,krd->lkd", weights.astype(jnp.float32),
                     basis.astype(jnp.float32))
    # per-(layer, k) LayerNorm without affine, then /sqrt(D)
    mean = out.mean(axis=-1, keepdims=True)
    var = out.var(axis=-1, keepdims=True)
    out = (out - mean) * jax.lax.rsqrt(var + 1e-5)
    out = out / jnp.sqrt(out.shape[-1]).astype(jnp.float32)
    if p.bias is not None:
        out = out + p.bias
    return out


def static_embedder_from_torch_stub(stub_params: dict) -> StaticEmbedderParams:
    """Build params from the tensors of a pickled torch
    StaticLayerwiseEmbedding (via interop.torch_pickle stubs)."""
    g = lambda n: (jnp.asarray(stub_params[n]) if n in stub_params and
                   stub_params[n] is not None else None)
    return StaticEmbedderParams(
        basis_rand_weights=g("basis_rand_weights"),
        basis_comm_weights=g("basis_comm_weights"),
        basis_vecs=g("basis_vecs"),
        pre_vecs=g("pre_vecs"),
        bias=g("bias"),
    )
