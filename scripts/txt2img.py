#!/usr/bin/env python
"""Subject-driven text-to-image generation CLI.

TPU-native equivalent of `scripts/stable_txt2img.py` (903 LoC): loads the
SD backbone + subject embedding checkpoints, extends the tokenizer with
placeholder tokens, samples with DDIM/PLMS under annealed CFG, writes
individual images + a grid, and optionally scores the outputs against a
reference folder (`--compare_with`, writing scores.csv like
`stable_txt2img.py:871-897`).

Without `--ckpt`, runs with random weights (shape/flow smoke path — the
driver and tests use this; images are noise).
"""

import argparse
import csv
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def parse_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--prompt", type=str, default=None,
                   help="prompt; subject placeholders like 'z' are patched")
    p.add_argument("--from_file", type=str, default=None,
                   help="TSV prompt file: n_repeat, subdir, prompt[, ...] "
                        "(gen_subjects_and_eval format)")
    p.add_argument("--ckpt", type=str, default=None, help="SD v1.x .ckpt or .safetensors")
    p.add_argument("--embedding_paths", nargs="*", default=[],
                   help=".npz (native) or .pt (reference) subject embeddings")
    p.add_argument("--subject_string", type=str, default="z")
    p.add_argument("--background_string", type=str, default="y")
    p.add_argument("--num_vectors_per_subj_token", type=int, default=9)
    p.add_argument("--steps", type=int, default=50)
    p.add_argument("--size", type=int, default=512)
    p.add_argument("--n_samples", type=int, default=4)
    p.add_argument("--n_repeat", type=int, default=1)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--scale", type=float, nargs="+", default=[10.0, 4.0],
                   help="CFG guidance; two values = annealed max->min "
                        "(`stable_txt2img.py:87-159`)")
    p.add_argument("--neg_prompt", type=str, default=None)
    p.add_argument("--sampler", choices=("ddim", "plms"), default="ddim")
    p.add_argument("--compel_cfg_weight_level", type=float, default=0.0,
                   help="amplify cond context offset from the empty prompt "
                        "by 1.1^level (stable_txt2img.py:680-694)")
    p.add_argument("--out", "--outdir", dest="outdir", type=str,
                   default="outputs/txt2img")
    p.add_argument("--compare_with", type=str, default=None,
                   help="reference image folder for CLIP-I/T + face scores")
    p.add_argument("--class_prompt", type=str, default=None,
                   help="prompt with the class word for CLIP-T scoring")
    p.add_argument("--calc_face_sim", action="store_true",
                   help="also score ArcFace similarity + no-face exception "
                        "rate (the reference's are_faces subjects)")
    p.add_argument("--skip_save", action="store_true",
                   help="do not save individual samples (speed measurement; "
                        "stable_txt2img.py:82)")
    p.add_argument("--n_rows", type=int, default=0,
                   help="rows in the grid (0 = one row per batch; "
                        "stable_txt2img.py:148)")
    p.add_argument("--use_first_gt_img_as_init", action="store_true",
                   help="start from the stochastic encode of the first "
                        "--compare_with image (stable_txt2img.py:205,580-600)")
    p.add_argument("--init_img_weight", type=float, default=0.1,
                   help="img2img strength for --use_first_gt_img_as_init")
    p.add_argument("--bf16", action="store_true")
    p.add_argument("--num_devices", type=int, default=1,
                   help="serving mesh size: n_samples shards data-parallel "
                        "across the chips (BASELINE north star); -1 = all")
    p.add_argument("--tp", type=int, default=1,
                   help="tensor-parallel factor within --num_devices "
                        "(Megatron-sharded UNet matmuls; the per-image "
                        "LATENCY lever for small batches)")
    p.add_argument("--tiny", action="store_true",
                   help="tiny random models (CPU smoke/verify mode)")
    return p.parse_args(argv)


def build_pipeline(opt):
    import jax
    import jax.numpy as jnp

    from adaface_tpu.data.tokenizer import CLIPBPETokenizer, HashTokenizer
    from adaface_tpu.pipeline import StableDiffusionPipeline

    vocab = os.environ.get("CLIP_VOCAB_JSON")
    merges = os.environ.get("CLIP_MERGES_TXT")
    if vocab and merges and os.path.exists(vocab):
        tok = CLIPBPETokenizer(vocab, merges)
    else:
        tok = HashTokenizer()
    dtype = jnp.bfloat16 if opt.bf16 else jnp.float32
    if opt.ckpt:
        pipe = StableDiffusionPipeline.from_sd_checkpoint(opt.ckpt, tok,
                                                          dtype=dtype)
    else:
        print("NOTE: no --ckpt given; using random weights (smoke mode)")
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
        pipe = StableDiffusionPipeline.from_random(jax.random.PRNGKey(0), tok,
                                                   dtype=dtype, **kw)

    # subject embeddings
    for path in opt.embedding_paths:
        if path.endswith(".npz"):
            loaded = type(pipe.embedding_manager).load_native(path)
            for s, info in loaded.placeholders.items():
                info.token_id = tok.add_placeholder(s)
                pipe.embedding_manager.placeholders[s] = info
                pipe.embedding_manager.embedders[s] = loaded.embedders[s]
        else:
            pipe.embedding_manager.load_reference_checkpoint(
                path, token_id_resolver=tok.add_placeholder)
    if pipe.embedding_manager.use_conv_attn_kernel_size > 1:
        pipe.set_conv_attn_kernel_size(
            pipe.embedding_manager.use_conv_attn_kernel_size)
    if not opt.embedding_paths:
        # fresh placeholder so personalized prompts still tokenize
        import jax

        tid = tok.add_placeholder(opt.subject_string)
        pipe.embedding_manager.add_placeholder(
            opt.subject_string, token_id=tid,
            num_vectors=opt.num_vectors_per_subj_token,
            init_key=jax.random.PRNGKey(7),
            emb_dim=pipe.clip.cfg.hidden_size)
    nd = getattr(opt, "num_devices", 1)
    tp = getattr(opt, "tp", 1)
    if nd != 1 or tp > 1:
        import jax

        if nd == -1:
            nd = len(jax.devices())
        if nd == 1 and tp > 1:
            # `--tp N` alone means an N-chip tp-only mesh (dp=1); an
            # EXPLICIT smaller --num_devices must not be silently bumped
            nd = tp
        if nd % tp or nd < tp:
            raise SystemExit(f"--num_devices {nd} not divisible by --tp {tp}")
        mesh = pipe.use_mesh(nd, dp=nd // tp, tp=tp)
        print(f"serving mesh: dp{mesh.shape['dp']} x tp{mesh.shape['tp']}")
    return pipe, tok


def pad_placeholders(prompt, subject_string, k):
    """'a z person' -> 'a z , , ... person' multi-vector padding
    (`personalized.py:888-893`)."""
    if k <= 1 or subject_string not in prompt.split():
        return prompt
    return prompt.replace(subject_string,
                          subject_string + " ," * (k - 1), 1)


def _gt_init_code(opt, pipe):
    """x_T base from the ground-truth folder's VAE latents
    (`stable_txt2img.py:585-626`): per image, fg-masked latent with noise
    outside the mask; averaged /sqrt(N). The `--init_img_weight` noise
    blend happens per repeat in main()."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from PIL import Image

    from adaface_tpu.models.vae import SD_VAE_SCALE_FACTOR, AutoencoderKL

    paths = sorted(
        os.path.join(opt.compare_with, f) for f in os.listdir(opt.compare_with)
        if f.lower().endswith((".jpg", ".jpeg", ".png"))
        and "_mask" not in f)
    if not paths:
        raise SystemExit(f"no images in {opt.compare_with}")
    f = 2 ** (len(pipe.vae.cfg.ch_mult) - 1)
    lh = lw = opt.size // f
    enc = jax.jit(lambda p, x: pipe.vae.apply(
        {"params": p}, x, method=AutoencoderKL.encode))
    rng = np.random.default_rng(opt.seed)
    avg = np.zeros((opt.n_samples, lh, lw, 4), np.float32)
    for path in paths:
        im = Image.open(path).convert("RGB").resize((opt.size, opt.size))
        x = (np.asarray(im, np.float32) / 127.5 - 1.0)[None]
        mean, _ = enc(pipe.vae_params, jnp.asarray(x))
        z = np.asarray(mean, np.float32) * SD_VAE_SCALE_FACTOR
        z = np.broadcast_to(z, avg.shape)
        stem, ext = os.path.splitext(path)
        mask_path = stem + "_mask.png"
        if os.path.exists(mask_path):
            m = np.asarray(Image.open(mask_path).convert("L").resize(
                (lw, lh), Image.NEAREST), np.float32)[None, :, :, None] / 255.0
            z = np.where(m > 0.5, z, rng.standard_normal(avg.shape))
        avg += z
    return (avg / np.sqrt(len(paths))).astype(np.float32)


def main(opt):
    import numpy as np
    from PIL import Image

    from adaface_tpu.pipeline import DEFAULT_NEGATIVE_PROMPT

    # serving cold start: cache compiled sampling programs on disk
    # (adaface_tpu/aot.py) — the remote-side compile is paid once per
    # shape ever (638 -> 40 s warm, PERF.md round 4). Per-user dir: cache
    # hits unpickle, so the path must be trusted/user-owned.
    from adaface_tpu.aot import default_cache_dir

    os.environ.setdefault("ADAFACE_AOT_CACHE", default_cache_dir())
    pipe, tok = build_pipeline(opt)
    neg = opt.neg_prompt if opt.neg_prompt is not None else DEFAULT_NEGATIVE_PROMPT
    guidance = tuple(opt.scale) if len(opt.scale) > 1 else opt.scale[0]

    gt_avg = None
    if opt.use_first_gt_img_as_init:
        # base for x_T = blended VAE latents of the ground-truth images
        # (`stable_txt2img.py:585-626`: masked latents averaged /sqrt(N));
        # the noise blend happens per repeat below so --n_repeat still
        # diversifies (the reference reuses ONE start code across repeats,
        # which makes deterministic-DDIM repeats identical)
        if not opt.compare_with:
            raise SystemExit("--use_first_gt_img_as_init needs --compare_with")
        if opt.skip_save:
            raise SystemExit("--skip_save would leave nothing for "
                             "--compare_with evaluation to score")
        gt_avg = _gt_init_code(opt, pipe)
    if opt.skip_save and opt.compare_with:
        raise SystemExit("--skip_save writes no samples; --compare_with "
                         "evaluation scores the samples directory")

    jobs = []  # (subdir, prompt, n_repeat)
    if opt.from_file:
        with open(opt.from_file) as f:
            for row in csv.reader(f, delimiter="\t"):
                if not row:
                    continue
                n_rep, subdir, prompt = int(row[0]), row[1], row[2]
                jobs.append((subdir, prompt, n_rep))
    else:
        if not opt.prompt:
            raise SystemExit("need --prompt or --from_file")
        jobs.append(("", opt.prompt, opt.n_repeat))

    os.makedirs(opt.outdir, exist_ok=True)
    all_imgs = []
    for subdir, prompt, n_rep in jobs:
        k = max((i.num_vectors for i in
                 pipe.embedding_manager.placeholders.values()), default=1)
        prompt = pad_placeholders(prompt, opt.subject_string, k)
        outd = os.path.join(opt.outdir, subdir) if subdir else opt.outdir
        os.makedirs(outd, exist_ok=True)
        idx = 0
        # dispatch all repeats without blocking (block=False pipelines the
        # DDIM programs: batch i+1 computes while batch i's readback and
        # the host-side JPEG encode run — see PERF.md fifth pass), then
        # convert+save in dispatch order
        def rep_x_T(rep):
            if gt_avg is None:
                return None
            w = opt.init_img_weight
            noise = np.random.default_rng(opt.seed + rep).standard_normal(
                gt_avg.shape).astype(np.float32)
            return gt_avg * w + noise * (1.0 - w)

        pending = [pipe.generate([prompt] * opt.n_samples, negative_prompt=neg,
                                 num_steps=opt.steps, guidance_scale=guidance,
                                 height=opt.size, width=opt.size,
                                 seed=opt.seed + rep, sampler=opt.sampler,
                                 compel_cfg_weight_level=opt.compel_cfg_weight_level,
                                 x_T=rep_x_T(rep), block=False)
                   for rep in range(n_rep)]
        for batch in pending:
            imgs = np.asarray(batch)
            if not opt.skip_save:
                for im in imgs:
                    Image.fromarray(im).save(os.path.join(outd, f"{idx:05}.jpg"))
                    idx += 1
            all_imgs.append(imgs)
        print(f"wrote {idx} images to {outd} for prompt: {prompt!r}")

    # grid: n_rows overrides the one-row-per-batch default. Reference
    # passes it as torchvision make_grid's `nrow` — images PER row
    # (`stable_txt2img.py:148,744`)
    if opt.n_rows > 0:
        flat = [im for batch in all_imgs for im in batch]
        per_row = opt.n_rows
        rows = [np.concatenate(flat[i:i + per_row], axis=1)
                for i in range(0, len(flat), per_row)]
        w = max(r.shape[1] for r in rows)
        rows = [np.pad(r, ((0, 0), (0, w - r.shape[1]), (0, 0))) for r in rows]
        grid = np.concatenate(rows, axis=0)
    else:
        grid = np.concatenate([np.concatenate(list(batch), axis=1)
                               for batch in all_imgs[:4]], axis=0)
    Image.fromarray(grid).save(os.path.join(opt.outdir, "grid.jpg"))

    if opt.compare_with:
        scores = evaluate(opt, jobs)
        print("scores:", scores)
        opt.scores = scores  # for in-process callers (parity_check.py)
    return 0


def evaluate(opt, jobs):
    """Inline eval against `--compare_with` (`stable_txt2img.py:776-897`).
    Scorer weights load from env-pointed checkpoints when available;
    otherwise scores are computed with random towers (smoke only)."""
    import jax
    import jax.numpy as jnp

    from adaface_tpu.evaluation.eval_utils import compare_folders
    from adaface_tpu.evaluation.scorers import init_evaluators

    # tokenizer + tower weights resolve from env assets (CLIP_SCORER_PT,
    # DINO_VITS16_PT, CLIP_VOCAB_JSON/MERGES); random tiny towers otherwise
    scorer, dino = init_evaluators()
    # score each per-prompt sample dir like the reference's indiv_subdir
    # loop (`stable_txt2img.py:776-860`), then aggregate; scoring the root
    # dir would miss --from_file subdirs entirely
    import numpy as _np

    per_dir = []
    for subdir, job_prompt, _ in jobs:
        d = os.path.join(opt.outdir, subdir) if subdir else opt.outdir
        prompt = opt.class_prompt or job_prompt
        per_dir.append((d, prompt) + compare_folders(
            scorer, dino, d, opt.compare_with, prompt))
    ci, ct, dn = (float(_np.mean([r[k] for r in per_dir]))
                  for k in (2, 3, 4))
    prompt = opt.class_prompt or jobs[0][1]
    res = {"clip_i": ci, "clip_t": ct, "dino": dn}
    row = [prompt, f"{ci:.4f}", f"{ct:.4f}", f"{dn:.4f}"]
    if opt.calc_face_sim:
        # ArcFace-cosine face similarity + no-face exception accounting
        # (`stable_txt2img.py:871-897`, `compare_face_folders_fast`)
        from adaface_tpu.evaluation.eval_utils import compare_face_folders
        from adaface_tpu.face_app import FaceApp
        from adaface_tpu.models.arcface import IResNet, IResNetConfig

        rec = IResNet(IResNetConfig.tiny())
        rp = rec.init(jax.random.PRNGKey(3),
                      jnp.zeros((1, 16, 16, 3)))["params"]
        app = FaceApp(recognizer=rec, params=rp)
        embed = lambda im: (lambda fs: fs[0].normed_embedding if fs else None)(
            app.get(im))
        sims, nf_gen, nf_gt, n_gen = [], 0, 0, 0
        for subdir, _, _ in jobs:
            d = os.path.join(opt.outdir, subdir) if subdir else opt.outdir
            s, nf_g, nf_t = compare_face_folders(embed, d, opt.compare_with)
            sims.append(s)
            nf_gen += nf_g
            nf_gt = nf_t
            from adaface_tpu.evaluation.eval_utils import list_image_files
            n_gen += len(list_image_files(d))
        sim = float(_np.mean(sims)) if sims else 0.0
        exc_rate = nf_gen / max(n_gen, 1)
        res.update({"face_sim": float(sim), "face_exceptions": nf_gen,
                    "face_exception_rate": exc_rate})
        row += [f"{sim:.4f}", str(nf_gen), f"{exc_rate:.4f}"]
    path = os.path.join(opt.outdir, "scores.csv")
    with open(path, "a") as f:
        csv.writer(f).writerow(row)
    return res


if __name__ == "__main__":
    sys.exit(main(parse_args()))
