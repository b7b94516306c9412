#!/usr/bin/env python
"""Zero-shot stack sanity harness.

Equivalent of `scripts-private/arc2face_test.py` (183 LoC): run the
zero-shot conditioning path standalone — reference images -> masked CLIP
features + face identity -> Arc2Face forward -> SubjBasisGenerator ->
personalized generation — and report tensor stats at each stage. With
random weights this is a shape/flow sanity check; with real checkpoints a
quality harness.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main(opt):
    import numpy as np
    import jax
    import jax.numpy as jnp
    from PIL import Image

    import txt2img as t2i

    from adaface_tpu.models.clip_text import CLIPTextConfig, CLIPTextEncoder
    from adaface_tpu.models.clip_vision import CLIPVisionConfig, CLIPVisionEncoder
    from adaface_tpu.personalization.arc2face import (
        FORWARD_TEMPLATE, INVERSE_TEMPLATE,
    )
    from adaface_tpu.personalization.embedding_manager import NUM_CA_LAYERS
    from adaface_tpu.personalization.subj_basis_generator import SubjBasisGenerator
    from adaface_tpu.personalization.zero_shot import ZeroShotFeatureExtractor
    from filter_faces import default_face_app

    pipe, tok = t2i.build_pipeline(opt)
    D = pipe.clip.cfg.hidden_size

    # vision tower (tiny random in smoke mode; HF ckpt via env in real runs)
    if opt.tiny:
        vis_cfg = CLIPVisionConfig.tiny(hidden_size=48)
    else:
        vis_cfg = CLIPVisionConfig.vit_l_14()
    vision = CLIPVisionEncoder(vis_cfg)
    vparams = vision.init(jax.random.PRNGKey(3),
                          jnp.zeros((1, vis_cfg.image_size,
                                     vis_cfg.image_size, 3)))["params"]
    app = default_face_app()
    ex = ZeroShotFeatureExtractor(vision, vparams, face_embed_fn=app.embed_image)

    imgs = [np.asarray(Image.open(p).convert("RGB")) for p in opt.ref_images]
    feats = ex.encode(imgs, None, is_face=True, calc_avg=True)
    print(f"clip features: {feats.clip_features.shape} "
          f"std={float(jnp.std(feats.clip_features)):.4f}; "
          f"id emb: {feats.id_embs.shape} "
          f"norm={float(jnp.linalg.norm(feats.id_embs)):.4f}; "
          f"faceless={feats.faceless_img_count}")

    txt_cfg = CLIPTextConfig.tiny(vocab_size=tok.vocab_size, hidden_size=D,
                                  num_layers=2, max_position_embeddings=77) \
        if opt.tiny else CLIPTextConfig.vit_l_14()
    arc_enc = CLIPTextEncoder(txt_cfg)
    arc_params = arc_enc.init(jax.random.PRNGKey(4),
                              input_ids=jnp.zeros((1, 77), jnp.int32))["params"]
    gen = SubjBasisGenerator(placeholder_is_bg=False,
                             num_out_layers=NUM_CA_LAYERS,
                             num_out_embs_per_layer=16, output_dim=D,
                             proj_cfg=txt_cfg, pad_token_id=tok.eos_id,
                             zs_extra_words_scale=opt.zs_extra_words_scale)
    inv_ids = jnp.asarray(tok([INVERSE_TEMPLATE], max_length=77))
    fwd_ids = jnp.asarray(tok([FORWARD_TEMPLATE], max_length=77))
    gparams = gen.init(jax.random.PRNGKey(5), None, None,
                       jnp.zeros((1, 16, D)),
                       inverse_template_ids=inv_ids)["params"]

    mgr = pipe.embedding_manager
    zid = tok.add_placeholder(opt.subject_string)
    mgr.add_zero_shot_placeholder(opt.subject_string, zid, gen, gparams,
                                  num_vectors=16)
    mgr.arc2face_encoder = (arc_enc, arc_params)
    pipe.set_zero_shot_features(
        feats, fwd_ids, inv_ids, int(tok.encode("id")[0]),
        out_id_embs_scale=opt.zs_out_id_embs_scale,
        inf_emb_type=opt.zs_arc2face_inverse_prompt_embs_inf_type)

    if opt.prompt:
        import re

        # insert "a {cls_delta}" before the subject token
        # (`stable_txt2img.py:491-493`), then pad to the vector count
        prompt = opt.prompt
        if opt.zs_cls_delta_string:
            prompt = re.sub(
                " " + re.escape(opt.subject_string) + r"(, )*",
                " a " + opt.zs_cls_delta_string + r"\g<0> ", prompt)
        prompt = t2i.pad_placeholders(prompt, opt.subject_string, 16)
    else:
        prompt = (f"a photo of a {opt.subject_string} " + ", " * 15
                  + opt.zs_cls_delta_string)

    context = None
    if opt.apply_arc2face_embs:
        # evaluate the raw Arc2Face model: its forward prompt embeddings
        # drive the UNet directly, tiled over the 16 CA layers
        # (`ddpm.py:1004-1008`)
        from adaface_tpu.personalization.arc2face import forward_face_embs

        full_embs, _ = forward_face_embs(
            arc_enc, arc_params, feats.id_embs, fwd_ids,
            int(tok.encode("id")[0]))
        context = full_embs[None, :1]  # [1, 1, 77, D] -> broadcast [L, B]
        print(f"arc2face forward context: {full_embs.shape} "
              f"std={float(jnp.std(full_embs)):.4f}")
    elif opt.apply_arc2face_inverse_embs:
        # evaluate the inverse pass: the CLIP-encoded Arc2Face inverse
        # prompt embeddings ARE the conditioning (`ddpm.py:993,1010-1012`)
        _, inv_embs = mgr.compute_zero_shot_embeddings(
            feats, inv_ids, forward_template_ids=fwd_ids,
            arcface_token_id=int(tok.encode("id")[0]),
            out_id_embs_scale=opt.zs_out_id_embs_scale,
            inf_emb_type=opt.zs_arc2face_inverse_prompt_embs_inf_type)
        if inv_embs.shape[1] != 77:
            raise SystemExit(
                f"--apply_arc2face_inverse_embs needs a full-width inverse "
                f"context (77 tokens); inf type "
                f"{opt.zs_arc2face_inverse_prompt_embs_inf_type!r} produced "
                f"{inv_embs.shape[1]} rows — use a full* variant")
        context = inv_embs[None, :1]
        print(f"arc2face inverse context: {inv_embs.shape} "
              f"std={float(jnp.std(inv_embs)):.4f}")
    else:
        ctx = pipe.encode_prompts([prompt])
        print(f"personalized context: {ctx.shape} std={float(jnp.std(ctx)):.4f}")
    out = pipe.generate([prompt] * opt.n_samples, num_steps=opt.steps,
                        height=opt.size, width=opt.size, seed=opt.seed,
                        context=context)
    os.makedirs(opt.outdir, exist_ok=True)
    for i, im in enumerate(out):
        Image.fromarray(im).save(os.path.join(opt.outdir, f"{i:05}.jpg"))
    print(f"wrote {len(out)} zero-shot samples to {opt.outdir}")
    return 0


if __name__ == "__main__":
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--ref_images", nargs="+", required=True)
    p.add_argument("--subject_string", default="z")
    p.add_argument("--prompt", default=None,
                   help="custom prompt containing the subject string "
                        "(cls-delta rewrite + vector padding applied)")
    p.add_argument("--zs_cls_delta_string", default="person")
    p.add_argument("--zs_extra_words_scale", type=float, default=0.5)
    p.add_argument("--zs_out_id_embs_scale", type=float, default=1.0)
    p.add_argument("--apply_arc2face_embs", action="store_true",
                   help="evaluate the raw Arc2Face forward embeddings")
    p.add_argument("--apply_arc2face_inverse_embs", action="store_true",
                   help="condition on the CLIP-encoded inverse embeddings")
    p.add_argument("--zs_arc2face_inverse_prompt_embs_inf_type",
                   default="full_half_pad",
                   choices=["full_zeroed_extra", "full", "full_half_pad",
                            "full_pad", "b_core_e"])
    p.add_argument("--steps", type=int, default=50)
    p.add_argument("--size", type=int, default=512)
    p.add_argument("--n_samples", type=int, default=2)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--ckpt", default=None)
    p.add_argument("--embedding_paths", nargs="*", default=[])
    p.add_argument("--num_vectors_per_subj_token", type=int, default=16)
    p.add_argument("--out", dest="outdir", default="outputs/zero_shot")
    p.add_argument("--bf16", action="store_true")
    p.add_argument("--tiny", action="store_true")
    sys.exit(main(p.parse_args()))
