#!/usr/bin/env python
"""Image-to-image + inpainting CLI.

Equivalent of `scripts/img2img.py` (293 LoC) + `scripts/inpaint.py` (98):
DDIM stochastic encode at t = strength * steps then decode; with `--mask`,
per-step masked latent blending keeps the unmasked region from the init
image (the standard non-inpaint-model SD inpainting trick).
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def parse_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--init_img", required=True)
    p.add_argument("--prompt", required=True)
    p.add_argument("--mask", default=None,
                   help="white = repaint region (inpainting mode)")
    p.add_argument("--strength", type=float, default=0.75)
    p.add_argument("--steps", type=int, default=50)
    p.add_argument("--n_samples", type=int, default=2)
    p.add_argument("--size", type=int, default=512)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--scale", type=float, nargs="+", default=[7.5])
    p.add_argument("--ckpt", default=None)
    p.add_argument("--embedding_paths", nargs="*", default=[])
    p.add_argument("--subject_string", default="z")
    p.add_argument("--num_vectors_per_subj_token", type=int, default=9)
    p.add_argument("--out", dest="outdir", default="outputs/img2img")
    p.add_argument("--bf16", action="store_true")
    p.add_argument("--tiny", action="store_true")
    return p.parse_args(argv)


def main(opt):
    import numpy as np
    from PIL import Image

    import txt2img as t2i

    pipe, tok = t2i.build_pipeline(opt)
    init = np.asarray(Image.open(opt.init_img).convert("RGB")
                      .resize((opt.size, opt.size)))
    k = max((i.num_vectors for i in
             pipe.embedding_manager.placeholders.values()), default=1)
    prompt = t2i.pad_placeholders(opt.prompt, opt.subject_string, k)
    guidance = tuple(opt.scale) if len(opt.scale) > 1 else opt.scale[0]

    if opt.mask:
        mask = np.asarray(Image.open(opt.mask).convert("L")
                          .resize((opt.size, opt.size))) / 255.0
        imgs = inpaint(pipe, init, mask, [prompt] * opt.n_samples,
                       num_steps=opt.steps, guidance_scale=guidance,
                       seed=opt.seed)
    else:
        imgs = pipe.img2img(init, [prompt] * opt.n_samples,
                            strength=opt.strength, num_steps=opt.steps,
                            guidance_scale=guidance, seed=opt.seed)
    os.makedirs(opt.outdir, exist_ok=True)
    for i, im in enumerate(imgs):
        Image.fromarray(im).save(os.path.join(opt.outdir, f"{i:05}.jpg"))
    print(f"wrote {len(imgs)} images to {opt.outdir}")
    return 0


def inpaint(pipe, init_image, mask, prompts, num_steps=50,
            guidance_scale=7.5, seed=0):
    """Masked latent blending inpainting (`scripts/inpaint.py` semantics on
    a non-inpaint SD model): at each DDIM step the unmasked region is reset
    to the correspondingly-noised init latent."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from adaface_tpu.models.vae import SD_VAE_SCALE_FACTOR, AutoencoderKL
    from adaface_tpu.ops.schedule import make_ddim_schedule
    from adaface_tpu.pipeline import _cfg_dedup_on
    from adaface_tpu.samplers.ddim import ddim_step, make_cfg_eps_fn

    b = len(prompts)
    ctx_c = pipe.encode_prompts(prompts)
    ctx_u = pipe.encode_negative("", b)
    # conv attention conditions on the subject slot map; omitting it here
    # silently disabled conv attn on the inpaint path (generate()/img2img()
    # thread it)
    slot_map = pipe._cfg_slot_map(pipe.tokenizer(list(prompts)))
    dedup = _cfg_dedup_on(pipe.unet.cfg)
    sched = make_ddim_schedule(pipe.base_sched, num_steps,
                               guidance_scale=guidance_scale)
    f = 2 ** (len(pipe.vae.cfg.ch_mult) - 1)
    lh = init_image.shape[0] // f

    @jax.jit
    def run(unet_params, vae_params, img, m, ctx_c, ctx_u, key, slot_map):
        x = img.astype(jnp.float32) / 127.5 - 1.0
        mean, _ = pipe.vae.apply({"params": vae_params}, x[None],
                                 method=AutoencoderKL.encode)
        z0 = jnp.broadcast_to(mean * SD_VAE_SCALE_FACTOR,
                              (b,) + mean.shape[1:])
        # latent-res mask: 1 = repaint
        ml = jax.image.resize(m[None, :, :, None], (1, lh, lh, 1), "nearest")
        ml = jnp.broadcast_to(ml, z0.shape[:3] + (1,))

        def unet_apply(x, t, c, ck, cross_kv=None):
            return pipe.unet.apply({"params": unet_params}, x, t, c,
                                   context_k=ck, cfg_dedup=dedup,
                                   subj_slot_map=slot_map,
                                   cross_kv=cross_kv)

        eps_fn = make_cfg_eps_fn(unet_apply, ctx_c, ctx_u, dedup=dedup,
                                 kv_fn=pipe._make_kv_fn(unet_params))
        x_t = jax.random.normal(key, z0.shape)

        def step(x, per_step):
            t, a, a_prev, s1m, sigma, g, nkey = per_step
            tb = jnp.full((b,), t, jnp.int32)
            eps = eps_fn(x, tb, g)
            x_prev, _ = ddim_step(x, eps, a, a_prev, s1m, sigma,
                                  jnp.zeros_like(x))
            # re-noise the init latent to the PREVIOUS step's level and
            # paste it outside the mask
            noise = jax.random.normal(jax.random.PRNGKey(0), z0.shape)
            z0_noised = jnp.sqrt(a_prev) * z0 + jnp.sqrt(1 - a_prev) * noise
            x_prev = ml * x_prev + (1 - ml) * z0_noised
            return x_prev, None

        xs = (sched.timesteps, sched.alphas, sched.alphas_prev,
              sched.sqrt_one_minus_alphas, sched.sigmas,
              sched.guidance_scales, sched.timesteps)
        z, _ = jax.lax.scan(step, x_t, xs)
        out = pipe.vae.apply({"params": vae_params}, z / SD_VAE_SCALE_FACTOR,
                             method=AutoencoderKL.decode)
        return jnp.clip((out + 1.0) / 2.0, 0.0, 1.0)

    out = run(pipe.unet_params, pipe.vae_params, jnp.asarray(init_image),
              jnp.asarray(mask, jnp.float32), ctx_c, ctx_u,
              jax.random.PRNGKey(seed), slot_map)
    return np.asarray((out * 255).astype(jnp.uint8))


if __name__ == "__main__":
    sys.exit(main(parse_args()))
