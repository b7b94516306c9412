"""Attribute the 64x64 SpatialTransformer budget (B8, c320, 8 heads, D40).

Measures, RTT-corrected via chained scans (see perf_micro.py):
  - the head-split/merge transposes alone
  - LN + qkv projection (fused and unfused)
  - flash self-attention alone
  - cross-attention (77 keys) sub-path
  - LN + GEGLU feed-forward
  - full SpatialTransformer for reference
"""

import functools
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
from scripts.perf_micro import rtt, timeit_chained, _zeros_params  # noqa: E402


def main(batch=8, h=64, w=64, c=320, heads=8, d=40, dtype=jnp.bfloat16):
    import flax.linen as nn

    from adaface_tpu.models.unet import SpatialTransformer
    from adaface_tpu.ops.flash_attention import flash_attention

    rtt()
    l = h * w
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (batch, l, c), dtype)
    xh = jax.random.normal(key, (batch, heads, l, d), dtype)
    w_qkv = jax.random.normal(key, (c, 3 * c), dtype) * 0.02
    w_ff1 = jax.random.normal(key, (c, 8 * c), dtype) * 0.02
    w_ff2 = jax.random.normal(key, (4 * c, c), dtype) * 0.02
    ln_s = jnp.ones((c,), dtype)

    # 1. transposes alone: split + merge round trip
    def split_merge(x):
        t = x.reshape(batch, l, heads, d).transpose(0, 2, 1, 3)
        t = t + 1.0
        return t.transpose(0, 2, 1, 3).reshape(batch, l, c)

    dt = timeit_chained(lambda x: split_merge(x), x, ())
    print(f"split+merge round trip: {dt*1e3:6.3f} ms", flush=True)

    # 2. LN + fused qkv projection + split of q/k/v (everything before flash)
    def pre_attn(x, w_qkv, ln_s):
        y = (x - x.mean(-1, keepdims=True)) / jnp.sqrt(
            x.var(-1, keepdims=True) + 1e-5)
        y = (y * ln_s).astype(x.dtype)
        qkv = y @ w_qkv
        q, k, v = jnp.split(qkv, 3, axis=-1)
        sp = lambda t: t.reshape(batch, l, heads, d).transpose(0, 2, 1, 3)
        return (sp(q) + sp(k) + sp(v)).transpose(0, 2, 1, 3).reshape(batch, l, c)

    dt = timeit_chained(pre_attn, x, (w_qkv, ln_s))
    print(f"LN + qkv proj + 3 splits (+merge dep): {dt*1e3:6.3f} ms", flush=True)

    # 3. flash alone
    scale = d ** -0.5
    def fl(q):
        return flash_attention(q, q, q, scale=scale)

    dt = timeit_chained(fl, xh, ())
    print(f"flash alone [B,H,L,D]: {dt*1e3:6.3f} ms", flush=True)

    # 4. LN + GEGLU FF
    def ff(x, w1, w2, ln_s):
        y = (x - x.mean(-1, keepdims=True)) / jnp.sqrt(
            x.var(-1, keepdims=True) + 1e-5)
        y = (y * ln_s).astype(x.dtype)
        u = y @ w1
        a, b = jnp.split(u, 2, axis=-1)
        return (a * jax.nn.gelu(b)) @ w2

    dt = timeit_chained(ff, x, (w_ff1, w_ff2, ln_s))
    print(f"LN + GEGLU FF: {dt*1e3:6.3f} ms", flush=True)

    # 5. full SpatialTransformer (the number to explain)
    m = SpatialTransformer(heads, dtype, True, -1)
    xs = jax.random.normal(key, (batch, h, w, c), dtype)
    ctx = jax.random.normal(key, (batch, 77, 768), dtype)
    shapes = jax.eval_shape(lambda: m.init(jax.random.PRNGKey(0), xs, ctx, ctx))
    params = _zeros_params(shapes, dtype)["params"]

    def full(xs, p, ctx):
        out, _ = m.apply({"params": p}, xs, ctx, ctx)
        return out

    dt = timeit_chained(full, xs, (params, ctx))
    print(f"full SpatialTransformer: {dt*1e3:6.3f} ms", flush=True)

    # 6. cross-attn analog: q from x, k/v from 77-token ctx (einsum path)
    wq = jax.random.normal(key, (c, c), dtype) * 0.02
    wkv = jax.random.normal(key, (768, 2 * c), dtype) * 0.02
    ctx2 = jax.random.normal(key, (batch, 77, 768), dtype)

    def cross(x, wq, wkv, ctx):
        q = (x @ wq).reshape(batch, l, heads, d).transpose(0, 2, 1, 3)
        kv = ctx @ wkv
        k, v = jnp.split(kv, 2, axis=-1)
        sp = lambda t: t.reshape(batch, 77, heads, d).transpose(0, 2, 1, 3)
        kh, vh = sp(k), sp(v)
        s = jnp.einsum("bhqd,bhkd->bhqk", q, kh,
                       preferred_element_type=jnp.float32) * scale
        p = jax.nn.softmax(s, axis=-1)
        o = jnp.einsum("bhqk,bhkd->bhqd", p.astype(vh.dtype), vh)
        return o.transpose(0, 2, 1, 3).reshape(batch, l, c)

    dt = timeit_chained(lambda x: cross(x, wq, wkv, ctx2), x, ())
    print(f"cross-attn (77 keys) sub-path: {dt*1e3:6.3f} ms", flush=True)


if __name__ == "__main__":
    print(f"devices: {jax.devices()}", flush=True)
    main()


def probe_transpose_cost(batch=8, l=4096, c=320, heads=8, d=40,
                         dtype=jnp.bfloat16):
    """flash called on pre-split tensors vs on [B,L,C] with split/merge."""
    from adaface_tpu.ops.flash_attention import flash_attention

    rtt()
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (batch, l, c), dtype)
    scale = d ** -0.5

    def path(x):
        t = x.reshape(batch, l, heads, d).transpose(0, 2, 1, 3)
        o = flash_attention(t, t, t, scale=scale)
        return o.transpose(0, 2, 1, 3).reshape(batch, l, c)

    dt = timeit_chained(path, x, ())
    print(f"split -> flash -> merge [B,L,C] path: {dt*1e3:6.3f} ms", flush=True)


if __name__ == "__main__" and len(sys.argv) > 1 and sys.argv[1] == "tcost":
    probe_transpose_cost()
