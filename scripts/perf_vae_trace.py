"""Capture an xprof trace of N chained VAE decodes and print per-op totals.

Usage: python scripts/perf_vae_trace.py [batch] [outdir]

The VAE decode is ~2.7% of the headline run (138 ms at B8/512px) but has
never had per-op attribution. Reuses the trace parser from
perf_unet_trace.py.
"""

import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
from scripts.perf_micro import _zeros_params  # noqa: E402
from scripts.perf_unet_trace import analyze  # noqa: E402


def run(batch=8, outdir="/tmp/vae_trace", n=5):
    from adaface_tpu.models.vae import SD_VAE_SCALE_FACTOR, AutoencoderKL, VAEConfig

    model = AutoencoderKL(VAEConfig.sd_v1(), jnp.bfloat16)
    z = jax.random.normal(jax.random.PRNGKey(1), (batch, 64, 64, 4), jnp.float32)
    shapes = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), z, method=AutoencoderKL.decode))
    params = _zeros_params(shapes, jnp.bfloat16)["params"]

    @jax.jit
    def chained(z, params):
        def body(h, _):
            img = model.apply({"params": params}, h / SD_VAE_SCALE_FACTOR,
                              method=AutoencoderKL.decode)
            # fold the image back to latent shape to keep the carry static
            # (tiny-but-nonzero scale so XLA can't DCE the decode)
            sub = img.astype(h.dtype)[:, ::8, ::8, :]
            sub = jnp.pad(sub, ((0, 0), (0, 0), (0, 0), (0, 1)))
            return h + sub * 1e-30, None
        h, _ = jax.lax.scan(body, z, None, length=n)
        return h.astype(jnp.float32).sum()

    float(chained(z, params))  # compile
    t0 = time.perf_counter()
    float(chained(z, params))
    print(f"# steady: {(time.perf_counter()-t0)/n*1e3:.1f} ms/decode (incl RTT/n)",
          flush=True)
    with jax.profiler.trace(outdir):
        float(chained(z, params))
    print(f"# trace in {outdir}", flush=True)
    analyze(outdir, n)


if __name__ == "__main__":
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    outdir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/vae_trace"
    print(f"devices: {jax.devices()}", flush=True)
    run(batch, outdir)
