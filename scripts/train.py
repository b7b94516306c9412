#!/usr/bin/env python
"""Subject personalization training CLI.

TPU-native equivalent of `main.py` (1262 LoC): build the dataset +
pipeline backbone, register placeholder tokens/embedders, run the Trainer
(iteration-plan machine, Prodigy/AdamW + accumulation + clipping,
checkpoints every 500 steps, SIGUSR1 checkpoint).

YAML configs follow the reference's target/params shape
(`configs/*.yaml` here; `adaface_tpu.config.load_config` +
`apply_dotlist`). Without `--actual_resume`, runs with random backbone
weights (smoke mode — the reference *requires* an SD ckpt, `main.py:188`).
"""

import argparse
import dataclasses
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def parse_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--base", nargs="*", default=[], help="YAML config(s)")
    p.add_argument("--data_root", type=str, required=True,
                   help="subject image folder (one subject) or parent of "
                        "per-subject folders with --subjects")
    p.add_argument("--subjects", nargs="*", default=None)
    p.add_argument("--actual_resume", type=str, default=None,
                   help="SD v1.x .ckpt or .safetensors backbone (random weights if absent)")
    p.add_argument("--subject_string", type=str, default="z")
    p.add_argument("--background_string", type=str, default="y")
    p.add_argument("--wds_background_string", type=str, default="w",
                   help="dedicated bg placeholder for wds composite "
                        "backgrounds (main.py:327; registered only when "
                        "wds shards are configured)")
    p.add_argument("--cls_delta_string", type=str, default="person")
    p.add_argument("--num_vectors_per_subj_token", type=int, default=9)
    p.add_argument("--num_vectors_per_bg_token", type=int, default=4)
    p.add_argument("--subj_init_word_weights", nargs="*", type=float,
                   default=None,
                   help="per-token weights for the cls_delta_string init "
                        "words (main.py:237)")
    p.add_argument("--bg_init_string", type=str, default="unknown",
                   help="words initializing the background embedder "
                        "(main.py:233)")
    p.add_argument("--layerwise_lora_rank", type=int, default=10,
                   help="static embedder basis rank (main.py:286)")
    p.add_argument("--clip_last_layers_skip_weights", nargs="+", type=float,
                   default=None,
                   help="relative weights of CLIP's last hidden layers "
                        "(main.py:331; default [1, 1])")
    p.add_argument("--randomize_clip_skip_weights", action="store_true",
                   help="resample the skip weights per iteration from "
                        "Dirichlet(weights) (main.py:335)")
    p.add_argument("--template_set", choices=("object", "style"),
                   default="object",
                   help="training template bank; style = TI style inversion (ldm/data/personalized_style.py)")
    p.add_argument("--common_placeholder_prefix", type=str, default=None,
                   help="comma-separated prefixes sampled per example and "
                        "prepended to subject+class strings (main.py:229)")
    p.add_argument("--matmul_prec", type=str, default=None,
                   help="matmul precision: jax names or torch aliases "
                        "highest/high/medium (main.py:339,849-851)")
    p.add_argument("--embedding_manager_ckpt", type=str, default=None,
                   help="warm-start embedders from a .pt/.npz checkpoint "
                        "(main.py --embedding_manager_ckpt)")
    p.add_argument("--max_steps", type=int, default=2000)
    p.add_argument("--batch_size", type=int, default=3)
    p.add_argument("--num_devices", type=int, default=1,
                   help="dp mesh size (the reference's --gpus / DDP analog,"
                        " main.py:862): batches shard over the chips,"
                        " batch_size stays per-device; -1 = all devices")
    p.add_argument("--accumulate_grad_batches", type=int, default=2)
    p.add_argument("--lr", type=float, default=7e-4)
    p.add_argument("--optimizer", choices=("prodigy", "adamw"), default="prodigy")
    p.add_argument("--size", type=int, default=512)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--logdir", "-l", type=str, default="logs/run")
    p.add_argument("--ckpt_every_steps", type=int, default=500)
    p.add_argument("--val_every", type=int, default=0,
                   help="run a `val/` loss pass (+ val sample grid when the "
                        "image logger is on) every N steps; 0 disables "
                        "(the reference's val dataloader + validation_step, "
                        "`main.py:447-545`, `ddpm.py:645-651`)")
    p.add_argument("--composition_regs_iter_gap", type=int, default=3)
    p.add_argument("--bf16", action="store_true")
    p.add_argument("--tiny", action="store_true",
                   help="tiny random models (CPU smoke/verify mode)")
    p.add_argument("--resume", "-r", type=str, default=None,
                   help="train_state.pkl to resume from")
    p.add_argument("--perturb_ratio", type=float, default=0.0,
                   help="multiplicative U(1-r,1+r) param perturbation after "
                        "resume (perturb_model_parameters analog)")
    p.add_argument("--arc2face_unet", type=str, default=None,
                   help="diffusers-layout arc2face teacher UNet dir/file; "
                        "enables arc2face distillation iterations")
    p.add_argument("--arc2face_text_encoder", type=str, default=None,
                   help="arc2face CLIPTextModel weights (.safetensors/.bin)")
    p.add_argument("--zeroshot", action="store_true",
                   help="train the zero-shot SubjBasisGenerator over the "
                        "corpus (the reference's main.py --zeroshot "
                        "flagship mode; CLIP_VISION_PT / ARCFACE_ONNX env "
                        "assets, random towers in smoke mode)")
    p.add_argument("--dreambooth", action="store_true",
                   help="DreamBooth baseline (main_db.py analog)")
    p.add_argument("--reg_data_root", type=str, default=None,
                   help="class regularization image folder (dreambooth)")
    p.add_argument("--db_reg_weight", type=float, default=1.0)
    p.add_argument("overrides", nargs="*", default=[],
                   help="dotlist config overrides a.b=c")
    return p.parse_args(argv)


def main(opt):
    import jax
    import jax.numpy as jnp

    from adaface_tpu.config import apply_dotlist, load_config
    from adaface_tpu.data.personalized import PersonalizedDataset, SubjectSpec
    from adaface_tpu.data.tokenizer import HashTokenizer
    from adaface_tpu.pipeline import StableDiffusionPipeline
    from adaface_tpu.training.iter_plan import IterPlanConfig
    from adaface_tpu.training.trainer import Trainer, TrainerConfig

    cfg = load_config(*opt.base) if opt.base else {}
    cfg = apply_dotlist(cfg, opt.overrides)
    # precedence: explicit CLI flag > YAML config > argparse default
    # (the reference's OmegaConf merge order, `main.py:853-864`)
    explicit = {a.split("=")[0].lstrip("-").replace("-", "_")
                for a in sys.argv[1:] if a.startswith("--")}

    def cfg_opt(section: str, key: str, flag: str = None):
        """Overlay cfg[section][key] onto opt.<flag> unless the flag was
        given on the command line."""
        flag = flag or key
        if flag not in explicit and key in cfg.get(section, {}):
            setattr(opt, flag, cfg[section][key])

    for k in ("subject_string", "background_string",
              "num_vectors_per_subj_token", "num_vectors_per_bg_token"):
        cfg_opt("personalization", k)
    cfg_opt("data", "wds_background_string")
    cfg_opt("data", "size")
    for k in ("max_steps", "batch_size", "accumulate_grad_batches",
              "ckpt_every_steps"):
        cfg_opt("trainer", k)
    cfg_opt("iter_plan", "composition_regs_iter_gap")
    if "use_prodigy" in cfg.get("trainer", {}) and "optimizer" not in explicit:
        opt.optimizer = "prodigy" if cfg["trainer"]["use_prodigy"] else "adamw"
    if cfg.get("model", {}).get("params", {}).get("dtype") == "bfloat16" \
            and "bf16" not in explicit:
        opt.bf16 = True

    def dataclass_cfg(dc_cls, section: str, skip=()):
        """cfg[section] keys that are fields of dc_cls (for fields without
        a dedicated CLI flag: grad_clip, d_coef, wds_*, compel, ...)."""
        names = {f.name for f in dataclasses.fields(dc_cls)}
        return {k: (tuple(v) if isinstance(v, list) else v)
                for k, v in cfg.get(section, {}).items()
                if k in names and k not in skip}

    # dataset
    if opt.subjects:
        specs = [SubjectSpec(name=s, folder=os.path.join(opt.data_root, s),
                             subject_string=opt.subject_string,
                             background_string=opt.background_string,
                             cls_delta_string=opt.cls_delta_string)
                 for s in opt.subjects]
    else:
        specs = [SubjectSpec(name=os.path.basename(opt.data_root.rstrip("/")),
                             folder=opt.data_root,
                             subject_string=opt.subject_string,
                             background_string=opt.background_string,
                             cls_delta_string=opt.cls_delta_string)]
    dataset = PersonalizedDataset(
        specs, size=opt.size,
        num_vectors_per_subj_token=opt.num_vectors_per_subj_token,
        num_vectors_per_bg_token=opt.num_vectors_per_bg_token,
        common_placeholder_prefix=opt.common_placeholder_prefix,
        template_set=opt.template_set,
        seed=opt.seed)

    # backbone
    tok = HashTokenizer()
    dtype = jnp.bfloat16 if opt.bf16 else jnp.float32
    if opt.actual_resume:
        pipe = StableDiffusionPipeline.from_sd_checkpoint(
            opt.actual_resume, tok, dtype=dtype)
    else:
        print("NOTE: no --actual_resume ckpt; random backbone (smoke mode)")
        kw = {}
        if opt.tiny:
            from adaface_tpu.models.clip_text import CLIPTextConfig
            from adaface_tpu.models.unet import UNetConfig
            from adaface_tpu.models.vae import VAEConfig
            kw = dict(
                clip_cfg=CLIPTextConfig.tiny(
                    vocab_size=tok.vocab_size, max_position_embeddings=77,
                    num_extra_tokens=8),
                unet_cfg=UNetConfig(model_channels=32, channel_mult=(1, 2),
                                    num_res_blocks=1, attention_levels=(0, 1),
                                    num_heads=4, context_dim=64,
                                    use_flash_attention=False),
                vae_cfg=VAEConfig.tiny())
        pipe = StableDiffusionPipeline.from_random(
            jax.random.PRNGKey(opt.seed), tok, dtype=dtype, **kw)

    # model_options: UNetConfig overrides from the YAML (use_remat etc.) —
    # rebuild the UNet module around the same params, like
    # set_conv_attn_kernel_size does
    mo = cfg.get("model_options", {})
    if mo:
        import dataclasses as _dc

        pipe.unet = type(pipe.unet)(_dc.replace(pipe.unet.cfg, **mo),
                                    pipe.unet.dtype)

    if opt.matmul_prec:
        # torch.set_float32_matmul_precision aliases -> JAX precisions
        # (`main.py:849-851`)
        prec = {"highest": "highest", "high": "tensorfloat32",
                "medium": "bfloat16"}.get(opt.matmul_prec, opt.matmul_prec)
        jax.config.update("jax_default_matmul_precision", prec)
        print(f"matmul precision: {prec}")

    if opt.clip_last_layers_skip_weights:
        w = [float(x) for x in opt.clip_last_layers_skip_weights]
        pipe.skip_weights = tuple(x / sum(w) for x in w)

    # placeholders — initialized from class/init-word embeddings like the
    # reference (`embedding_manager.py:414-495`: pre_vecs = the CLIP token
    # embeddings of cls_delta_string / bg_init_string, weighted by
    # --subj_init_word_weights), not randomly
    import numpy as np

    mgr = pipe.embedding_manager
    emb_dim = pipe.clip.cfg.hidden_size
    table = np.asarray(pipe.clip_params["token_embedding"]["embedding"])

    def word_init(words: str, weights=None):
        tids = [t for t in tok.encode(words) if 0 <= t < table.shape[0]]
        if not tids:
            return {}
        if len(tids) > opt.layerwise_lora_rank:
            raise SystemExit(
                f"{words!r} tokenizes to {len(tids)} init tokens but "
                f"--layerwise_lora_rank is {opt.layerwise_lora_rank}; the "
                f"rank must be >= the init-token count")
        vecs = table[np.asarray(tids)]
        kw = dict(init_vecs=vecs)
        if weights:
            if len(weights) != len(tids):
                raise SystemExit(
                    f"--subj_init_word_weights: {len(weights)} weights for "
                    f"{len(tids)} init tokens of {words!r}")
            w = np.asarray(weights, np.float32)
            kw["init_vec_weights"] = w / w.sum()
        return kw

    if not opt.zeroshot:
        # zero-shot placeholders are generator-backed (run_zero_shot)
        mgr.add_placeholder(opt.subject_string,
                            token_id=tok.add_placeholder(opt.subject_string),
                            num_vectors=opt.num_vectors_per_subj_token,
                            init_key=jax.random.PRNGKey(opt.seed + 1),
                            emb_dim=emb_dim, rank=opt.layerwise_lora_rank,
                            **word_init(opt.cls_delta_string,
                                        opt.subj_init_word_weights))
        if opt.background_string:
            mgr.add_placeholder(
                opt.background_string,
                token_id=tok.add_placeholder(opt.background_string),
                num_vectors=opt.num_vectors_per_bg_token,
                is_background=True,
                init_key=jax.random.PRNGKey(opt.seed + 2),
                emb_dim=emb_dim, rank=opt.layerwise_lora_rank,
                **word_init(opt.bg_init_string))
        if (opt.background_string and opt.wds_background_string
                and cfg.get("data", {}).get("wds_shards")):
            # dedicated wds background embedder ('w'): wds captions swap
            # the ordinary bg token for it (`main.py:376-382`)
            mgr.add_placeholder(
                opt.wds_background_string,
                token_id=tok.add_placeholder(opt.wds_background_string),
                num_vectors=opt.num_vectors_per_bg_token,
                is_background=True,
                init_key=jax.random.PRNGKey(opt.seed + 3),
                emb_dim=emb_dim, rank=opt.layerwise_lora_rank,
                **word_init(opt.bg_init_string))
    if opt.embedding_manager_ckpt:
        path = opt.embedding_manager_ckpt
        if path.endswith(".npz"):
            loaded = type(mgr).load_native(path)
            for s, info in loaded.placeholders.items():
                info.token_id = tok.add_placeholder(s)
                mgr.placeholders[s] = info
                mgr.embedders[s] = loaded.embedders[s]
                # save_native reads a score per placeholder
                mgr.emb_global_scale_scores.setdefault(
                    s, loaded.emb_global_scale_scores.get(s, 0.0))
        else:
            mgr.load_reference_checkpoint(
                path, token_id_resolver=tok.add_placeholder)
        print(f"warm-started embedding manager from {path}")

    cli_handled = {"max_steps", "batch_size", "accumulate_grad_batches",
                   "ckpt_every_steps", "use_prodigy", "learning_rate",
                   "seed", "logdir", "randomize_clip_skip_weights",
                   "clip_skip_weights_alpha", "wds_background_string",
                   "num_devices", "val_every_steps"}
    # precedence: explicit CLI flag > config file > argparse default —
    # the file's learning_rate/use_prodigy win only when the CLI flag was
    # left at its default
    file_trainer = cfg.get("trainer", {})
    lr = opt.lr
    if opt.lr == 7e-4 and "learning_rate" in file_trainer:
        lr = float(file_trainer["learning_rate"])
    use_prodigy = opt.optimizer == "prodigy"
    if opt.optimizer == "prodigy" and "use_prodigy" in file_trainer:
        use_prodigy = bool(file_trainer["use_prodigy"])
    tcfg = TrainerConfig(
        **dataclass_cfg(TrainerConfig, "trainer", skip=cli_handled),
        **dataclass_cfg(TrainerConfig, "data", skip=cli_handled),
        max_steps=opt.max_steps, batch_size=opt.batch_size,
        num_devices=opt.num_devices,
        accumulate_grad_batches=opt.accumulate_grad_batches,
        learning_rate=lr, use_prodigy=use_prodigy,
        ckpt_every_steps=opt.ckpt_every_steps, seed=opt.seed,
        val_every_steps=(opt.val_every if opt.val_every
                         else int(file_trainer.get("val_every_steps", 0))),
        logdir=opt.logdir,
        randomize_clip_skip_weights=opt.randomize_clip_skip_weights,
        wds_background_string=opt.wds_background_string or "",
        clip_skip_weights_alpha=tuple(
            float(x) for x in (opt.clip_last_layers_skip_weights or (1, 1))))
    pcfg = IterPlanConfig(
        **dataclass_cfg(IterPlanConfig, "iter_plan",
                        skip={"composition_regs_iter_gap", "max_steps"}),
        composition_regs_iter_gap=opt.composition_regs_iter_gap,
        max_steps=opt.max_steps)
    if opt.zeroshot:
        return run_zero_shot(opt, pipe, tok, dataset, tcfg, pcfg)
    if opt.dreambooth:
        return run_dreambooth(opt, pipe, tok)
    trainer = Trainer(pipe, dataset, tcfg, pcfg)
    if opt.resume:
        trainer.load_state(opt.resume)
    if opt.perturb_ratio > 0:
        from adaface_tpu.ops.grad import perturb_params

        trainer.mgr.embedders = perturb_params(
            jax.random.PRNGKey(opt.seed + 9), trainer.mgr.embedders,
            opt.perturb_ratio)
        print(f"perturbed embedder params by U(1±{opt.perturb_ratio})")
    teacher = None
    if opt.arc2face_unet:
        from adaface_tpu.training.arc2face_teacher import load_arc2face_teacher

        if not opt.arc2face_text_encoder:
            raise SystemExit("--arc2face_unet requires --arc2face_text_encoder")
        teacher = load_arc2face_teacher(
            opt.arc2face_unet, opt.arc2face_text_encoder, tok,
            dtype=dtype).as_tuple()
        print(f"arc2face teacher loaded from {opt.arc2face_unet}")
    trainer.fit(arc2face_teacher=teacher)
    trainer.save_state()
    return 0


def run_zero_shot(opt, pipe, tok, dataset, tcfg, pcfg):
    """The reference's flagship `--zeroshot` training mode (`main.py:260`,
    `ddpm.py:127` do_zero_shot): train SubjBasisGenerators that map face
    identity + masked CLIP vision features to the layerwise prompt
    embeddings, over a multi-subject corpus. Real towers load from
    CLIP_VISION_PT (HF CLIPVisionModel state dict) and
    --arc2face_text_encoder; ARCFACE_ONNX drives the identity embedder;
    random towers otherwise (smoke mode)."""
    import dataclasses as _dc

    import jax
    import jax.numpy as jnp
    import numpy as np

    from adaface_tpu.models.clip_text import CLIPTextConfig, CLIPTextEncoder
    from adaface_tpu.models.clip_vision import (
        CLIPVisionConfig,
        CLIPVisionEncoder,
    )
    from adaface_tpu.personalization.arc2face import INVERSE_TEMPLATE
    from adaface_tpu.personalization.embedding_manager import NUM_CA_LAYERS
    from adaface_tpu.personalization.subj_basis_generator import (
        SubjBasisGenerator,
    )
    from adaface_tpu.personalization.zero_shot import ZeroShotFeatureExtractor
    from adaface_tpu.training.zs_trainer import ZeroShotTrainer
    from filter_faces import default_face_app

    D = pipe.clip.cfg.hidden_size

    # vision tower (masked CLIP features)
    vis_ckpt = os.environ.get("CLIP_VISION_PT")
    if opt.tiny or not (vis_ckpt and os.path.exists(vis_ckpt)):
        if not opt.tiny:
            print("NOTE: no CLIP_VISION_PT; random vision tower (smoke mode)")
        vis_cfg = CLIPVisionConfig.tiny(hidden_size=48)
        vision = CLIPVisionEncoder(vis_cfg)
        vparams = vision.init(jax.random.PRNGKey(opt.seed + 3),
                              jnp.zeros((1, vis_cfg.image_size,
                                         vis_cfg.image_size, 3)))["params"]
    else:
        from adaface_tpu.interop.hf_clip import map_clip_vision_params
        from adaface_tpu.interop.torch_pickle import load_sd_state_dict

        sd = load_sd_state_dict(vis_ckpt)
        prefix = ("vision_model." if any(
            k.startswith("vision_model.") for k in sd) else "")
        vis_cfg = CLIPVisionConfig.vit_l_14()
        vision = CLIPVisionEncoder(vis_cfg)
        vparams = map_clip_vision_params(sd, prefix=prefix)
        print(f"vision tower loaded from {vis_ckpt}")
    app = default_face_app()
    ext = ZeroShotFeatureExtractor(vision, vparams,
                                   face_embed_fn=app.embed_image)

    # arc2face face-conditioned text encoder (frozen)
    arc_ckpt = opt.arc2face_text_encoder
    if opt.tiny or not (arc_ckpt and os.path.exists(arc_ckpt)):
        if not opt.tiny:
            print("NOTE: no --arc2face_text_encoder; random encoder "
                  "(smoke mode)")
        arc_cfg = CLIPTextConfig.tiny(vocab_size=tok.vocab_size,
                                      hidden_size=D, num_layers=2,
                                      max_position_embeddings=77)
        arc_enc = CLIPTextEncoder(arc_cfg)
        arc_params = arc_enc.init(
            jax.random.PRNGKey(opt.seed + 4),
            input_ids=jnp.zeros((1, 77), jnp.int32))["params"]
    else:
        from adaface_tpu.interop.hf_clip import map_clip_text_params
        from adaface_tpu.interop.torch_pickle import load_sd_state_dict

        sd = load_sd_state_dict(arc_ckpt)
        prefix = ("text_model." if any(
            k.startswith("text_model.") for k in sd) else "")
        arc_cfg = CLIPTextConfig.vit_l_14()
        arc_enc = CLIPTextEncoder(arc_cfg)
        arc_params = map_clip_text_params(sd, prefix=prefix)
        print(f"arc2face text encoder loaded from {arc_ckpt}")

    # generators: fg subject (K=16 core rows) + optional bg
    mgr = pipe.embedding_manager
    inv_ids = jnp.asarray(tok([INVERSE_TEMPLATE], max_length=77))
    gen = SubjBasisGenerator(placeholder_is_bg=False,
                             num_out_layers=NUM_CA_LAYERS,
                             num_out_embs_per_layer=16, output_dim=D,
                             proj_cfg=arc_cfg, pad_token_id=tok.eos_id)
    gparams = gen.init(jax.random.PRNGKey(opt.seed + 5), None, None,
                       jnp.zeros((1, 16, D)),
                       inverse_template_ids=inv_ids)["params"]
    gens = {opt.subject_string: gen}
    gen_tree = {opt.subject_string: gparams}
    mgr.add_zero_shot_placeholder(
        opt.subject_string, tok.add_placeholder(opt.subject_string),
        gen, gparams, num_vectors=16)
    bg_placeholders = frozenset()
    bg_strings = [opt.background_string] if opt.background_string else []
    if bg_strings and opt.wds_background_string and tcfg.wds_shards:
        # dedicated wds background generator ('w'), same architecture as
        # the ordinary bg generator (`main.py:404-410`)
        bg_strings.append(opt.wds_background_string)
    for i, bg_s in enumerate(bg_strings):
        bg_gen = SubjBasisGenerator(
            placeholder_is_bg=True, num_out_layers=NUM_CA_LAYERS,
            num_out_embs_per_layer=opt.num_vectors_per_bg_token,
            output_dim=D, image_embedding_dim=vis_cfg.hidden_size,
            num_heads=4, bg_num_id_vecs=vis_cfg.num_tokens)
        bg_params = bg_gen.init(
            jax.random.PRNGKey(opt.seed + 6 + i),
            jnp.zeros((1, vis_cfg.num_tokens, vis_cfg.hidden_size)),
            None, None)["params"]
        gens[bg_s] = bg_gen
        gen_tree[bg_s] = bg_params
        mgr.add_zero_shot_placeholder(
            bg_s, tok.add_placeholder(bg_s),
            bg_gen, bg_params, num_vectors=opt.num_vectors_per_bg_token,
            is_background=True)
    bg_placeholders = frozenset(bg_strings)

    if opt.embedding_manager_ckpt:
        mgr.load_reference_checkpoint(opt.embedding_manager_ckpt,
                                      token_id_resolver=tok.add_placeholder)
        for s, (g, gp) in mgr.subj_basis_generators.items():
            gens[s] = g
            gen_tree[s] = gp
        print(f"zs generators warm-started from {opt.embedding_manager_ckpt}")

    trainer = ZeroShotTrainer(
        pipe, dataset, ext, gens, gen_tree, arc_enc, arc_params,
        tcfg, plan_cfg=_dc.replace(pcfg, do_zero_shot=True),
        bg_placeholders=bg_placeholders)
    if opt.resume:
        trainer.load_checkpoint(opt.resume)
    teacher = None
    if opt.arc2face_unet:
        from adaface_tpu.training.arc2face_teacher import load_arc2face_teacher

        if not opt.arc2face_text_encoder:
            raise SystemExit("--arc2face_unet requires --arc2face_text_encoder")
        teacher = load_arc2face_teacher(
            opt.arc2face_unet, opt.arc2face_text_encoder, tok).as_tuple()
        print(f"arc2face teacher loaded from {opt.arc2face_unet}")
    trainer.fit(arc2face_teacher=teacher)
    trainer.save_checkpoint("last")
    return 0


def run_dreambooth(opt, pipe, tok):
    """DreamBooth baseline loop (`main_db.py`): subject recon + weighted
    class-prior preservation, AdamW, no iteration-type machine."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    import optax

    from adaface_tpu.data.personalized_db import DreamBoothDataset
    from adaface_tpu.models.vae import SD_VAE_SCALE_FACTOR, AutoencoderKL
    from adaface_tpu.training.train_step import (
        DreamBoothBatch, ReconBatch, make_dreambooth_train_step,
    )

    assert opt.reg_data_root, "--dreambooth needs --reg_data_root"
    ds = DreamBoothDataset(opt.data_root, opt.reg_data_root,
                           placeholder=opt.subject_string,
                           class_word=opt.cls_delta_string,
                           size=opt.size, seed=opt.seed)
    mgr = pipe.embedding_manager
    optimizer = optax.chain(optax.clip_by_global_norm(0.5),
                            optax.adamw(opt.lr))
    opt_state = optimizer.init(mgr.embedders)
    # dp mesh (the main_db.py DDP analog): one (train, reg) pair PER
    # DEVICE, twin batches sharded on the batch dim like the Trainer
    nd = opt.num_devices
    if nd == -1:
        nd = len(jax.devices())
    mesh = None
    if nd > 1:
        from adaface_tpu.parallel.mesh import (
            make_mesh, replicate_params, shard_opt_state, shard_train_batch,
        )

        mesh = make_mesh(nd)
        mgr.embedders = replicate_params(mesh, mgr.embedders)
        opt_state = shard_opt_state(mesh, opt_state)
    step = jax.jit(make_dreambooth_train_step(
        pipe.clip, pipe.clip_params, pipe.unet, pipe.unet_params,
        pipe.base_sched, optimizer, skip_weights=pipe.skip_weights,
        db_reg_weight=opt.db_reg_weight))
    encode = jax.jit(lambda params, x: pipe.vae.apply(
        {"params": params}, x, method=AutoencoderKL.encode))
    rng = np.random.default_rng(opt.seed)
    os.makedirs(opt.logdir, exist_ok=True)

    def mk_recon(es, sw=None):
        lat = encode(pipe.vae_params,
                     jnp.asarray(np.stack([e["image"] for e in es]))
                     )[0] * SD_VAE_SCALE_FACTOR
        ids = pipe.tokenizer([e["caption"] for e in es])
        slots = mgr.build_slot_maps(ids)
        return ReconBatch(
            latents=lat, token_ids=jnp.asarray(ids),
            slot_maps={k: jnp.asarray(v) for k, v in slots.items()},
            fg_mask=None,
            timesteps=jnp.asarray(rng.integers(0, 1000, len(es)), jnp.int32),
            noise=jnp.asarray(rng.standard_normal(lat.shape), jnp.float32),
            skip_weights=sw)

    for i in range(opt.max_steps):
        pairs = [ds.draw_pair() for _ in range(max(nd, 1))]
        trs, rgs = [p[0] for p in pairs], [p[1] for p in pairs]
        # one Dirichlet draw per iteration, shared by both halves (the
        # reference encodes both in one get_learned_conditioning call)
        sw = None
        if opt.randomize_clip_skip_weights:
            alpha = [float(x) for x in
                     (opt.clip_last_layers_skip_weights or (1, 1))]
            sw = jnp.asarray(rng.dirichlet(alpha), jnp.float32)
        batch = DreamBoothBatch(train=mk_recon(trs, sw),
                                reg=mk_recon(rgs, sw))
        if mesh is not None:
            batch = shard_train_batch(mesh, batch)
        mgr.embedders, opt_state, m = step(mgr.embedders, opt_state, batch)
        if i % 10 == 0:
            print(f"[db {i}/{opt.max_steps}] loss={float(m['loss']):.4f} "
                  f"recon={float(m['recon']):.4f} reg={float(m['db_reg']):.4f}",
                  flush=True)
    mgr.save_native(os.path.join(opt.logdir, "embeddings_last.npz"))
    print(f"saved {opt.logdir}/embeddings_last.npz")
    return 0


if __name__ == "__main__":
    sys.exit(main(parse_args()))
