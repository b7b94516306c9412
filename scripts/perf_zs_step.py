"""On-chip zero-shot ("AdaFace") training-step timing — the flagship mode.

Times one jitted `make_zero_shot_recon_step` at full SD width: the
SubjBasisGenerator (incl. its CLIP-L prompt2token_proj) is the trainable
under Prodigy, the SD backbone + Arc2Face prompt encoder ride frozen in
`fz`, and the complementary-loss battery runs (capture forward), matching
the shipped zero-shot configuration (`ddpm.py:5192-5209` optimizer,
`embedding_manager.py:1400-1505` embedding path).

Usage: python scripts/perf_zs_step.py [batch ...]  (default: 3 6)
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from adaface_tpu.data.tokenizer import HashTokenizer
from adaface_tpu.models.clip_text import CLIPTextConfig, CLIPTextEncoder
from adaface_tpu.models.unet import UNetConfig, UNetModel
from adaface_tpu.ops.schedule import make_diffusion_schedule
from adaface_tpu.personalization.arc2face import (FORWARD_TEMPLATE,
                                                  INVERSE_TEMPLATE)
from adaface_tpu.personalization.subj_basis_generator import SubjBasisGenerator
from adaface_tpu.training.prodigy import prodigy
from adaface_tpu.training.train_step import (ZeroShotReconBatch,
                                             make_zero_shot_recon_step)

T, HW = 77, 64  # 512px latents


def bf16(tree):
    return jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x,
        tree)


def main():
    print(f"devices: {jax.devices()}", flush=True)
    args = [a for a in sys.argv[1:]]
    remat = "noremat" not in args
    batches = [int(a) for a in args if a.isdigit()] or [3, 6]
    tok = HashTokenizer()

    clip_cfg = CLIPTextConfig(vocab_size=tok.vocab_size, num_extra_tokens=8)
    clip = CLIPTextEncoder(clip_cfg, jnp.bfloat16)
    clip_params = bf16(clip.init(
        jax.random.PRNGKey(0), input_ids=jnp.zeros((1, T), jnp.int32))["params"])
    unet = UNetModel(UNetConfig.sd_v1(use_remat=remat), jnp.bfloat16)
    uparams = bf16(unet.init(
        jax.random.PRNGKey(1), jnp.zeros((1, HW, HW, 4)),
        jnp.zeros((1,), jnp.int32), jnp.zeros((1, 1, T, 768)))["params"])
    sched = make_diffusion_schedule()

    # frozen Arc2Face prompt encoder (CLIP-L text width)
    arc_cfg = CLIPTextConfig(vocab_size=tok.vocab_size)
    arc_enc = CLIPTextEncoder(arc_cfg, jnp.bfloat16)
    arc_params = bf16(arc_enc.init(
        jax.random.PRNGKey(2), input_ids=jnp.zeros((1, T), jnp.int32))["params"])
    fwd_ids = jnp.asarray(tok([FORWARD_TEMPLATE]))
    inv_ids = jnp.asarray(tok([INVERSE_TEMPLATE]))
    arc_tid = int(tok.encode("id")[0])

    # the trainable: fg SubjBasisGenerator at reference size (generator
    # params stay fp32 — they are the optimizer state dtype)
    gen = SubjBasisGenerator(proj_cfg=CLIPTextConfig(vocab_size=tok.vocab_size),
                             pad_token_id=tok.eos_id)
    gparams = gen.init(jax.random.PRNGKey(3), jnp.zeros((1, 77, 1280)), None,
                       jnp.zeros((1, 16, 768)),
                       inverse_template_ids=inv_ids)["params"]
    n_params = sum(np.prod(x.shape) for x in jax.tree_util.tree_leaves(gparams))
    print(f"generator params: {n_params/1e6:.1f} M", flush=True)
    gens = {"z": gen}
    gen_tree = {"z": gparams}
    opt = prodigy(learning_rate=1.0, d_coef=10.0)
    opt_state = opt.init(gen_tree)

    step = jax.jit(make_zero_shot_recon_step(
        clip, clip_params, unet, uparams, sched, opt,
        generators=gens, bg_placeholders=frozenset(),
        arc2face_encoder=arc_enc, arc2face_params=arc_params,
        forward_template_ids=fwd_ids, inverse_template_ids=inv_ids,
        arcface_token_id=arc_tid,
        complem_weight=2e-4, xlayer_weight=5e-5, use_bg_token=False))
    fz = {"clip": clip_params, "unet": uparams, "arc": arc_params}

    rng = np.random.default_rng(0)
    for B in batches:
        ids = rng.integers(0, 40000, size=(B, T)).astype(np.int32)
        zslot = np.full((B, T), -1, np.int32)
        zslot[:, 2:18] = np.arange(16)  # 16 zs vectors
        batch = ZeroShotReconBatch(
            latents=jnp.asarray(rng.standard_normal((B, HW, HW, 4)), jnp.float32),
            token_ids=jnp.asarray(ids),
            slot_maps={"z": jnp.asarray(zslot)},
            fg_mask=jnp.asarray((rng.random((B, HW, HW, 1)) > 0.5), jnp.float32),
            timesteps=jnp.asarray(rng.integers(0, 1000, (B,)), jnp.int32),
            noise=jnp.asarray(rng.standard_normal((B, HW, HW, 4)), jnp.float32),
            clip_fg=jnp.asarray(rng.standard_normal((B, 77, 1280)), jnp.float32),
            clip_bg=jnp.asarray(rng.standard_normal((B, 257, 1280)), jnp.float32),
            id_embs=jnp.asarray(rng.standard_normal((B, 512)), jnp.float32),
        )
        g, s = gen_tree, opt_state
        try:
            t0 = time.time()
            g, s, m = step(g, s, batch, fz)
            jax.block_until_ready(m["loss"])
            compile_s = time.time() - t0
            ts = []
            for _ in range(5):
                t0 = time.time()
                g, s, m = step(g, s, batch, fz)
                jax.block_until_ready(m["loss"])
                ts.append(time.time() - t0)
            best = min(ts)
            print(f"zs recon step (B{B}, remat={remat}, +complem, Prodigy): {best*1e3:.1f} "
                  f"ms/step ({B/best:.1f} imgs/s) compile {compile_s:.0f}s "
                  f"loss={float(m['loss']):.4f}", flush=True)
        except Exception as e:  # OOM at larger batches — report and continue
            print(f"zs recon step (B{B}): FAILED "
                  f"{type(e).__name__}: {str(e)[:100]}", flush=True)


if __name__ == "__main__":
    main()
