"""Microbenchmarks for the sampling hot path on the real chip.

Usage: python scripts/perf_micro.py [attn|unet|vae|all]

The axon tunnel has ~30-40 ms dispatch round-trip latency and
block_until_ready does NOT block until device completion, so every
measurement here chains N iterations of the op inside a single jitted
lax.scan (output feeds the next input) and reads back one scalar; the
round-trip is measured with a no-op jit and subtracted.
"""

import functools
import sys
import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_RTT = None


def rtt():
    global _RTT
    if _RTT is None:
        x = jnp.zeros((8, 128), jnp.float32)
        f = jax.jit(lambda x: x.sum())
        float(f(x))
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            float(f(x))
            ts.append(time.perf_counter() - t0)
        _RTT = min(ts)
        print(f"# dispatch round-trip: {_RTT*1e3:.1f} ms", flush=True)
    return _RTT


def timeit_chained(fn, q, extra, n=20, reps=3):
    """fn(q, *extra) -> tensor of q's shape; time per call, RTT-corrected."""

    @jax.jit
    def run(q, extra):
        def body(x, _):
            return fn(x, *extra).astype(x.dtype).reshape(x.shape), None
        x, _ = jax.lax.scan(body, q, None, length=n)
        return x.astype(jnp.float32).sum()

    float(run(q, extra))  # compile + first
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        float(run(q, extra))
        best = min(best, time.perf_counter() - t0)
    return max(best - rtt(), 1e-9) / n


# ---------------------------------------------------------- bf16 flash variant
def _flash_kernel_bf16(q_ref, k_ref, v_ref, o_ref, *, block_k, scale):
    q = q_ref[0]  # native dtype into the MXU
    lk = k_ref.shape[1]
    bq, d = q.shape
    num_kb = lk // block_k

    def body(i, carry):
        acc, m, l = carry
        ks = k_ref[0, pl.ds(i * block_k, block_k), :]
        vs = v_ref[0, pl.ds(i * block_k, block_k), :]
        s = jax.lax.dot_general(q, ks, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32) * scale
        m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp(s - m_new)
        corr = jnp.exp(m - m_new)
        l_new = l * corr + jnp.sum(p, axis=-1, keepdims=True)
        acc_new = acc * corr + jax.lax.dot_general(
            p.astype(vs.dtype), vs, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return acc_new, m_new, l_new

    acc0 = jnp.zeros((bq, d), jnp.float32)
    m0 = jnp.full((bq, 1), -1e30, jnp.float32)
    l0 = jnp.zeros((bq, 1), jnp.float32)
    acc, m, l = jax.lax.fori_loop(0, num_kb, body, (acc0, m0, l0))
    o_ref[0] = (acc / l).astype(o_ref.dtype)


def flash_bf16(q, k, v, scale, block_q=256, block_k=512):
    b, h, lq, d = q.shape
    lk = k.shape[2]
    dp = max(128, ((d + 127) // 128) * 128)
    if dp != d:
        pad = [(0, 0), (0, 0), (0, 0), (0, dp - d)]
        q, k, v = jnp.pad(q, pad), jnp.pad(k, pad), jnp.pad(v, pad)
    bh = b * h
    q2, k2, v2 = (t.reshape(bh, t.shape[2], dp) for t in (q, k, v))
    bq = min(block_q, lq)
    bk = min(block_k, lk)
    kernel = functools.partial(_flash_kernel_bf16, block_k=bk, scale=scale)
    out = pl.pallas_call(
        kernel,
        grid=(bh, lq // bq),
        in_specs=[
            pl.BlockSpec((1, bq, dp), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, lk, dp), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, lk, dp), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, bq, dp), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bh, lq, dp), q.dtype),
    )(q2, k2, v2)
    return out.reshape(b, h, lq, dp)[..., :d]


def bench_attn():
    from adaface_tpu.ops.flash_attention import flash_attention, _reference_attention

    rtt()
    shapes = [(8, 8, 4096, 40), (8, 8, 1024, 80), (8, 8, 256, 160),
              (16, 8, 4096, 40)]
    for b, h, l, d in shapes:
        key = jax.random.PRNGKey(0)
        q = jax.random.normal(key, (b, h, l, d), jnp.bfloat16)
        k = jax.random.normal(key, (b, h, l, d), jnp.bfloat16)
        v = jax.random.normal(key, (b, h, l, d), jnp.bfloat16)
        scale = d ** -0.5
        flops = 4 * b * h * l * l * d
        t_cur = timeit_chained(
            lambda q, k, v: flash_attention(q, k, v, scale=scale), q, (k, v))
        t_bf = timeit_chained(
            lambda q, k, v: flash_bf16(q, k, v, scale), q, (k, v))
        res = (f"B{b} H{h} L{l} D{d}: cur_flash {t_cur*1e3:7.2f} ms "
               f"({flops/t_cur/1e12:5.1f} TF/s) | bf16_flash {t_bf*1e3:7.2f} ms "
               f"({flops/t_bf/1e12:5.1f} TF/s)")
        if l <= 1024:
            t_ein = timeit_chained(
                lambda q, k, v: _reference_attention(q, k, v, None, scale),
                q, (k, v))
            res += f" | einsum {t_ein*1e3:7.2f} ms"
        print(res, flush=True)


def _zeros_params(shapes, dtype):
    return jax.tree_util.tree_map(
        lambda s: jnp.zeros(s.shape, dtype if jnp.issubdtype(s.dtype, jnp.floating)
                            else s.dtype), shapes)


def bench_unet(batch=8, use_flash=True, dtype=jnp.bfloat16, n=10):
    from adaface_tpu.models.unet import UNetConfig, UNetModel, NUM_CA_LAYERS

    rtt()
    cfg = UNetConfig.sd_v1(use_flash_attention=use_flash)
    model = UNetModel(cfg, dtype)
    x = jax.random.normal(jax.random.PRNGKey(1), (batch, 64, 64, 4), dtype)
    t = jnp.full((batch,), 500, jnp.int32)
    ctx = jax.random.normal(jax.random.PRNGKey(2),
                            (NUM_CA_LAYERS, batch, 77, 768), dtype)
    shapes = jax.eval_shape(lambda: model.init(jax.random.PRNGKey(0), x, t, ctx))
    params = _zeros_params(shapes, dtype)["params"]

    dt = timeit_chained(
        lambda x, p, t, c: model.apply({"params": p}, x, t, c),
        x, (params, t, ctx), n=n)
    tflops_img = 0.68
    print(f"UNet fwd B{batch} flash={use_flash}: {dt*1e3:.1f} ms "
          f"-> ~{batch*tflops_img/dt:.0f} TF/s eff; 50 CFG steps(B{batch}) = {dt*50:.2f}s",
          flush=True)


def bench_vae(batch=4, dtype=jnp.bfloat16, n=5):
    from adaface_tpu.models.vae import AutoencoderKL, VAEConfig

    rtt()
    cfg = VAEConfig.sd_v1()
    model = AutoencoderKL(cfg, dtype)
    z = jax.random.normal(jax.random.PRNGKey(1), (batch, 64, 64, 4), dtype)
    shapes = jax.eval_shape(lambda: model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)), jax.random.PRNGKey(0)))
    params = _zeros_params(shapes, dtype)["params"]

    def step(z, p):
        out = model.apply({"params": p}, z, method=AutoencoderKL.decode)
        # cheap dependency back to latent shape
        return out[:, ::8, ::8, :1] + jnp.pad(z[..., :0], ((0, 0),) * 3 + ((0, 1),))

    dt = timeit_chained(lambda z, p: step(z, p), z, (params,), n=n)
    print(f"VAE decode B{batch}: {dt*1e3:.1f} ms", flush=True)



def bench_blocks(batch=8, dtype=jnp.bfloat16):
    """Per-block timing at the real SD shapes to localize the UNet budget."""
    from adaface_tpu.models.unet import ResBlock, SpatialTransformer

    rtt()
    # (name, module factory, x shape, extra args builder, count in UNet)
    def time_res(h, w, cin, cout, count, n=30):
        m = ResBlock(cout, dtype)
        x = jax.random.normal(jax.random.PRNGKey(0), (batch, h, w, cin), dtype)
        emb = jax.random.normal(jax.random.PRNGKey(1), (batch, 1280), dtype)
        shapes = jax.eval_shape(lambda: m.init(jax.random.PRNGKey(0), x, emb))
        params = _zeros_params(shapes, dtype)["params"]
        def fn(x, p, emb):
            out = m.apply({"params": p}, x, emb)
            if cout == cin:
                return out
            reps = -(-cin // cout)
            return jnp.concatenate([out] * reps, axis=-1)[..., :cin]
        dt = timeit_chained(fn, x, (params, emb), n=n)
        print(f"res {h}x{w} {cin}->{cout} x{count}: {dt*1e3:6.2f} ms each, "
              f"{dt*count*1e3:6.1f} ms total", flush=True)
        return dt * count

    def time_attn(h, w, c, count, n=30):
        m = SpatialTransformer(8, dtype, True, -1)
        x = jax.random.normal(jax.random.PRNGKey(0), (batch, h, w, c), dtype)
        ctx = jax.random.normal(jax.random.PRNGKey(1), (batch, 77, 768), dtype)
        shapes = jax.eval_shape(lambda: m.init(jax.random.PRNGKey(0), x, ctx, ctx))
        params = _zeros_params(shapes, dtype)["params"]
        def fn(x, p, ctx):
            out, _ = m.apply({"params": p}, x, ctx, ctx)
            return out
        dt = timeit_chained(fn, x, (params, ctx), n=n)
        print(f"attn {h}x{w} c{c} x{count}: {dt*1e3:6.2f} ms each, "
              f"{dt*count*1e3:6.1f} ms total", flush=True)
        return dt * count

    total = 0.0
    total += time_res(64, 64, 320, 320, 4)   # down L0 x2, up approx
    total += time_res(64, 64, 960, 320, 1)
    total += time_res(64, 64, 640, 320, 2)
    total += time_res(32, 32, 320, 640, 1)
    total += time_res(32, 32, 640, 640, 2)
    total += time_res(32, 32, 960, 640, 1)
    total += time_res(32, 32, 1280, 640, 1)
    total += time_res(16, 16, 640, 1280, 1)
    total += time_res(16, 16, 1280, 1280, 2)
    total += time_res(16, 16, 1920, 1280, 2)
    total += time_res(8, 8, 1280, 1280, 7)   # down L3 x2 + mid x2 + up L3 x3 (approx cin)
    total += time_res(8, 8, 2560, 1280, 3)
    total += time_attn(64, 64, 320, 5)
    total += time_attn(32, 32, 640, 5)
    total += time_attn(16, 16, 1280, 5)
    total += time_attn(8, 8, 1280, 1)
    print(f"# block-sum estimate: {total*1e3:.1f} ms (vs full UNet fwd measured separately)",
          flush=True)

def bench_vae_blocks(batch=4, dtype=jnp.bfloat16):
    """Localize the VAE decoder budget."""
    from adaface_tpu.models.vae import ResnetBlock, AttnBlock

    rtt()

    def time_block(mod, x, count, label, n=10):
        shapes = jax.eval_shape(lambda: mod.init(jax.random.PRNGKey(0), x))
        params = _zeros_params(shapes, dtype)["params"]
        def fn(x, p):
            out = mod.apply({"params": p}, x)
            cout, cin = out.shape[-1], x.shape[-1]
            if cout == cin:
                return out
            reps = -(-cin // cout)
            return jnp.concatenate([out] * reps, axis=-1)[..., :cin]
        dt = timeit_chained(fn, x, (params,), n=n)
        print(f"{label} x{count}: {dt*1e3:6.2f} ms each, {dt*count*1e3:6.1f} ms total",
              flush=True)
        return dt * count

    total = 0.0
    k = jax.random.PRNGKey(0)
    total += time_block(ResnetBlock(512, dtype), jax.random.normal(k, (batch, 64, 64, 512), dtype), 5, "vae res 64x64x512")
    total += time_block(AttnBlock(dtype), jax.random.normal(k, (batch, 64, 64, 512), dtype), 1, "vae attn 64x64x512")
    total += time_block(ResnetBlock(512, dtype), jax.random.normal(k, (batch, 128, 128, 512), dtype), 3, "vae res 128x128x512")
    total += time_block(ResnetBlock(256, dtype), jax.random.normal(k, (batch, 256, 256, 512), dtype), 1, "vae res 256 512->256")
    total += time_block(ResnetBlock(256, dtype), jax.random.normal(k, (batch, 256, 256, 256), dtype), 2, "vae res 256x256x256")
    total += time_block(ResnetBlock(128, dtype), jax.random.normal(k, (batch, 512, 512, 256), dtype), 1, "vae res 512 256->128")
    total += time_block(ResnetBlock(128, dtype), jax.random.normal(k, (batch, 512, 512, 128), dtype), 2, "vae res 512x512x128")
    print(f"# vae block-sum (excl. upsamples/convs in/out): {total*1e3:.1f} ms", flush=True)


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    print(f"devices: {jax.devices()}", flush=True)
    if which in ("attn", "all"):
        bench_attn()
    if which in ("unet", "all"):
        bench_unet(8)
    if which in ("vae", "all"):
        bench_vae(4)
    if which == "blocks":
        bench_blocks(8)
    if which == "vaeblocks":
        bench_vae_blocks(4)
