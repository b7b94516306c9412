"""On-chip training-step timing (PERF.md training section).

Times one jitted recon train step at the reference's operating point
(512px latents, batch 3, SD backbone frozen, static embedders trainable,
AdamW + clip) — with and without the complementary-loss battery (capture
forward) — and one zs-style flash-backward probe at L4096 self-attention.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
import optax

from adaface_tpu.data.tokenizer import HashTokenizer
from adaface_tpu.models.clip_text import CLIPTextConfig, CLIPTextEncoder
from adaface_tpu.models.unet import UNetConfig, UNetModel
from adaface_tpu.ops.schedule import make_diffusion_schedule
from adaface_tpu.personalization.static_embedding import init_static_embedder
from adaface_tpu.training.train_step import ReconBatch, make_recon_train_step


def main():
    import sys

    print(f"devices: {jax.devices()}", flush=True)
    tok = HashTokenizer()
    # argv: [batch] [remat|noremat]  (default: 3 remat)
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    remat = "noremat" not in sys.argv[2:]
    T, HW = 77, 64  # 512px latents
    clip_cfg = CLIPTextConfig(vocab_size=tok.vocab_size, num_extra_tokens=8)
    clip = CLIPTextEncoder(clip_cfg, jnp.bfloat16)
    clip_params = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x,
        clip.init(jax.random.PRNGKey(0),
                  input_ids=jnp.zeros((1, T), jnp.int32))["params"])
    ucfg = UNetConfig.sd_v1(use_remat=remat)
    unet = UNetModel(ucfg, jnp.bfloat16)
    uparams = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x,
        unet.init(jax.random.PRNGKey(1), jnp.zeros((1, HW, HW, 4)),
                  jnp.zeros((1,), jnp.int32),
                  jnp.zeros((1, 1, T, 768)))["params"])
    sched = make_diffusion_schedule()
    embedders = {
        "z": init_static_embedder(jax.random.PRNGKey(2), num_vectors=9,
                                  emb_dim=768, rank=12),
        "y": init_static_embedder(jax.random.PRNGKey(3), num_vectors=4,
                                  emb_dim=768, rank=12),
    }
    opt = optax.chain(optax.clip_by_global_norm(0.5), optax.adamw(7e-4))
    opt_state = opt.init(embedders)

    rng = np.random.default_rng(0)
    ids = rng.integers(0, 40000, size=(B, T)).astype(np.int32)
    zslot = np.full((B, T), -1, np.int32)
    yslot = np.full((B, T), -1, np.int32)
    zslot[:, 2:11] = np.arange(9)
    yslot[:, 13:17] = np.arange(4)
    batch = ReconBatch(
        latents=jnp.asarray(rng.standard_normal((B, HW, HW, 4)), jnp.float32),
        token_ids=jnp.asarray(ids),
        slot_maps={"z": jnp.asarray(zslot), "y": jnp.asarray(yslot)},
        fg_mask=jnp.asarray((rng.random((B, HW, HW, 1)) > 0.5), jnp.float32),
        timesteps=jnp.asarray(rng.integers(0, 1000, (B,)), jnp.int32),
        noise=jnp.asarray(rng.standard_normal((B, HW, HW, 4)), jnp.float32),
    )
    fz = {"clip": clip_params, "unet": uparams}

    def timeit(step, label):
        e, s = embedders, opt_state
        t0 = time.time()
        e, s, m = step(e, s, batch, fz)
        jax.block_until_ready(m["loss"])
        compile_s = time.time() - t0
        ts = []
        for _ in range(5):
            t0 = time.time()
            e, s, m = step(e, s, batch, fz)
            jax.block_until_ready(m["loss"])
            ts.append(time.time() - t0)
        best = min(ts)
        print(f"{label}: {best*1e3:.1f} ms/step ({B/best:.1f} imgs/s) "
              f"compile {compile_s:.0f}s loss={float(m['loss']):.4f}",
              flush=True)

    plain = jax.jit(make_recon_train_step(clip, clip_params, unet, uparams,
                                          sched, opt))
    timeit(plain, f"recon step (plain, B{B}, remat={remat})")
    complem = jax.jit(make_recon_train_step(
        clip, clip_params, unet, uparams, sched, opt,
        complem_weight=2e-4, xlayer_weight=5e-5, use_bg_token=True,
        bg_placeholders=frozenset({"y"})))
    timeit(complem, f"recon step (+complem battery, B{B}, remat={remat})")


if __name__ == "__main__":
    main()
