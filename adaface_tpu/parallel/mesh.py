"""Device mesh + sharding rules.

The reference's distributed story is pure data parallelism under Lightning
DDP/NCCL (SURVEY.md §2.8). The TPU-native mapping: a 1-D `dp` mesh over
chips; batch-dim NamedSharding on inputs; replicated params; XLA inserts
the gradient all-reduce over ICI. CFG's doubled batch and the 4-type
prompt batch shard naturally on the batch dim.

A second `tp` axis is plumbed through for tensor-sharding the UNet/CLIP
matmuls when serving wants lower latency per image than DP can give —
shardings are expressed as PartitionSpec rules so the same jitted function
runs 1-chip or N-chip unchanged.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None, dp: Optional[int] = None,
              tp: int = 1, devices: Optional[Sequence] = None) -> Mesh:
    """1-D (dp) or 2-D (dp, tp) mesh over the available devices.

    SINGLE-PROCESS ONLY (by design, like the reference — single-node
    Lightning DDP, SURVEY §2.8): every sharding/IO path here assumes one
    controller process owning all mesh devices. A multi-host pod would need
    `jax.distributed.initialize`, `process_index()==0` guards on
    checkpoint/log IO, and per-process batch sharding in `shard_batch` /
    `shard_train_batch` (host arrays must become per-process shards via
    `jax.make_array_from_process_local_data`). None of that exists — fail
    loudly rather than silently mis-shard.
    """
    if jax.process_count() > 1:
        raise NotImplementedError(
            "adaface_tpu is single-process: multi-host meshes are out of "
            "scope (the reference is single-node DDP too, SURVEY §2.8). "
            "Run one process with all local devices, or shard the subject "
            "corpus across independent runs.")
    devices = list(devices if devices is not None else jax.devices())
    n = n_devices or len(devices)
    devices = devices[:n]
    dp = dp or (n // tp)
    assert dp * tp == n, f"dp({dp}) * tp({tp}) != devices({n})"
    arr = np.array(devices).reshape(dp, tp)
    return Mesh(arr, ("dp", "tp"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) dim over dp, replicate the rest."""
    return NamedSharding(mesh, P("dp"))


def context_sharding(mesh: Mesh) -> NamedSharding:
    """Layerwise context [L, B, T, D]: batch is dim 1."""
    return NamedSharding(mesh, P(None, "dp"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, tree):
    """Device-put a host batch pytree with batch-dim sharding (leading axis
    for >=1-D leaves; scalars replicated)."""
    bs = batch_sharding(mesh)
    rep = replicated(mesh)

    def put(x):
        if hasattr(x, "ndim") and x.ndim >= 1:
            return jax.device_put(x, bs)
        return jax.device_put(x, rep)

    return jax.tree_util.tree_map(put, tree)


def replicate_params(mesh: Mesh, params):
    rep = replicated(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, rep), params)


# per-iteration host-sampled knobs that must replicate even when their
# leading dim happens to divide dp (cls_mix_ranges is [4], skip_weights [2],
# a PRNG key [2], ...)
_REPLICATED_BATCH_FIELDS = frozenset({
    "skip_weights", "emb_noise_key", "emb_noise_std", "dropout_key",
    "training_percent", "compel_level", "cls_mix_ranges",
    "preserve_loss_scale",
})
# leading dim is the denoising-step axis S, batch rides dim 1
# (Arc2FaceBatch.noises [S, B, h, w, 4] / relative_ts [S-1, B])
_DIM1_BATCH_FIELDS = frozenset({"noises", "relative_ts"})


def train_batch_shardings(mesh: Mesh, batch):
    """NamedSharding tree for a train-step batch NamedTuple (ReconBatch /
    ComposBatch / Arc2FaceBatch / the zero-shot twins): batch-dim leaves
    shard over `dp`, per-iteration scalars/knobs replicate. The batch dim
    is recognized structurally — dim 0 (dim 1 for the per-step-noise
    fields) when it divides dp and isn't the degenerate 1 (the zs compos
    batch carries [1, ...] block-level conditioning that must replicate).

    Returns a pytree of NamedShardings matching `batch`, suitable for
    `jax.device_put(batch, shardings)`; jit then propagates the dp layout
    through the step (computation follows data — no in_shardings needed).
    """
    dp = mesh.shape["dp"]
    rep = replicated(mesh)
    bs0 = NamedSharding(mesh, P("dp"))
    bs1 = NamedSharding(mesh, P(None, "dp"))

    def leaf_rule(x, dim1=False):
        if not hasattr(x, "ndim") or x.ndim == 0:
            return rep
        if dim1:
            ok = x.ndim >= 2 and x.shape[1] % dp == 0 and x.shape[1] > 1
            return bs1 if ok else rep
        ok = x.shape[0] % dp == 0 and x.shape[0] > 1
        return bs0 if ok else rep

    out = {}
    for name, val in batch._asdict().items():
        if name in _REPLICATED_BATCH_FIELDS:
            out[name] = jax.tree_util.tree_map(lambda _: rep, val)
        elif hasattr(val, "_asdict"):
            # nested batch (DreamBoothBatch.train/.reg): recurse so the
            # inner per-iteration knobs keep their replication rules
            out[name] = train_batch_shardings(mesh, val)
        else:
            dim1 = name in _DIM1_BATCH_FIELDS
            out[name] = jax.tree_util.tree_map(
                lambda x: leaf_rule(x, dim1), val)
    return type(batch)(**out)


def shard_train_batch(mesh: Mesh, batch):
    """Device-put a train-step batch with `train_batch_shardings`."""
    return jax.device_put(batch, train_batch_shardings(mesh, batch))


# ----------------------------------------------------------- tensor parallel

def _match(path: str, *subs: str) -> bool:
    return any(s in path for s in subs)


def param_sharding_rules(mesh: Mesh, params, kind: str = "unet"):
    """PartitionSpec tree for tensor-sharding the matmul-heavy params over
    the `tp` axis (Megatron-style column/row split around each attention
    and MLP pair): q/k/v + MLP-in kernels shard the OUTPUT feature dim,
    out-proj + MLP-out kernels shard the INPUT dim, so each attention/MLP
    pair needs one all-reduce that XLA inserts automatically. Convs, norms
    and embeddings replicate (they are bandwidth-, not compute-, bound).

    Works for both the UNet ('to_q/to_k/to_v/to_out', 'ff_in/ff_out') and
    the CLIP towers ('q_proj/k_proj/v_proj/out_proj', 'fc1/fc2').
    """
    col = NamedSharding(mesh, P(None, "tp"))  # shard output features
    row = NamedSharding(mesh, P("tp", None))  # shard input features
    rep = replicated(mesh)

    def rule(path_tuple, leaf):
        path = "/".join(str(getattr(p, "key", p)) for p in path_tuple)
        if not hasattr(leaf, "ndim") or leaf.ndim != 2:
            return rep
        if _match(path, "to_q/", "to_k/", "to_v/", "ff_in/",
                  "q_proj/", "k_proj/", "v_proj/", "fc1/"):
            return col
        if _match(path, "to_out/", "ff_out/", "out_proj/", "fc2/"):
            return row
        return rep

    return jax.tree_util.tree_map_with_path(rule, params)


def shard_params(mesh: Mesh, params, kind: str = "unet"):
    """Device-put params with tensor-parallel shardings (falls back to
    replication for anything unmatched). Shardable dims must divide the tp
    size — true for SD's head counts/MLP widths on tp in {2, 4, 8}."""
    rules = param_sharding_rules(mesh, params, kind)
    return jax.tree_util.tree_map(jax.device_put, params, rules)


# ------------------------------------------------------- optimizer sharding

def zero1_sharding_rules(mesh: Mesh, opt_state, axis: str = "dp",
                         min_elems: int = 65536):
    """ZeRO-1-style NamedSharding tree for an optimizer state: each large
    leaf shards its largest divisible axis over `axis`; small leaves
    (scalars, Prodigy's global d, step counters) replicate.

    Beyond the reference (DDP replicates optimizer state on every rank,
    SURVEY §2.8) — this is what makes the zero-shot flagship mode scale:
    its 123M-param SubjBasisGenerator carries ~4x123M fp32 of Prodigy
    state, which OOMs a single v5e at batch 6 (PERF.md) but drops to
    1/dp-th per chip here. Gradients stay replicated; XLA inserts the
    (re)sharding collectives around the elementwise optimizer update."""
    n = mesh.shape[axis]
    rep = replicated(mesh)

    def rule(leaf):
        if not hasattr(leaf, "ndim") or leaf.size < min_elems:
            return rep
        sizes = list(leaf.shape)
        # largest axis divisible by the mesh axis
        cands = [(s, i) for i, s in enumerate(sizes) if s % n == 0]
        if not cands:
            return rep
        _, dim = max(cands)
        spec = [None] * leaf.ndim
        spec[dim] = axis
        return NamedSharding(mesh, P(*spec))

    return jax.tree_util.tree_map(rule, opt_state)


def shard_opt_state(mesh: Mesh, opt_state, axis: str = "dp",
                    min_elems: int = 65536):
    """Device-put an optimizer state with ZeRO-1 shardings."""
    rules = zero1_sharding_rules(mesh, opt_state, axis, min_elems)
    return jax.tree_util.tree_map(jax.device_put, opt_state, rules)
