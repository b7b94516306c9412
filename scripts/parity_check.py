#!/usr/bin/env python
"""One-command real-weights quality-parity runbook (VERDICT r4 #2).

Runs the BASELINE.json configs 1-5 against REAL assets (SD checkpoint,
learned subject embeddings, Arc2Face weights, reference subject corpora),
scores every run with the in-repo evaluators (CLIP-I / CLIP-T / DINO /
ArcFace face-sim — `adaface_tpu/evaluation/`), and diffs the results
against a checked-in expectations file at the BASELINE quality bar
(CLIP-I/DINO within ±0.01 of the PyTorch reference).

Mirrors the reference commands (see docs/PARITY.md for the asset list and
exact correspondences):
- configs 1-3: `python scripts/stable_txt2img.py --ckpt ... --embedding_paths
  ... --compare_with ...` (`/root/reference/scripts/stable_txt2img.py:336-903`)
- config 4: zero-shot Arc2Face generation from `--ref_images`
  (`stable_txt2img.py:437` encode_zero_shot_image_features)
- config 5: `gen_subjects_and_eval.py` over the DreamBench corpus
  (`/root/reference/scripts/gen_subjects_and_eval.py:240-559`)

Every config SKIPS gracefully when its assets are missing, so the command
is always safe to run; `--mock` runs the whole harness on tiny random
models (CI mode — exercises generation, scoring, aggregation and the
expectations diff without any asset).

Usage (assets present):
    python scripts/parity_check.py \
        --sd_ckpt models/v1-5-dste8-vae.ckpt \
        --embeddings logs/subj1/embeddings_gs-2000.pt \
        --embeddings2 logs/subj2/embeddings_gs-2000.pt \
        --subject_gt_dir subjects-dreambench/dog6 \
        --ref_images subjects-celebrity/taylorswift/*.jpg \
        --arc2face_unet arc2face/unet --arc2face_text_encoder arc2face/enc \
        --subject_file evaluation/info-dbeval-subjects.sh \
        --data_root subjects-dreambench
First run with real assets: add --update_expectations to record measured
scores; later runs fail if any metric drifts past the tolerance.
"""

import argparse
import csv
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

DEFAULT_EXPECTATIONS = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "..", "docs",
    "parity_expectations.json")
# BASELINE.json: "CLIP-I / DINO scores matching the PyTorch reference
# ±0.01"; face similarity gets a slightly wider band (detector crops vary)
TOLERANCES = {"clip_i": 0.01, "clip_t": 0.01, "dino": 0.01,
              "face_sim": 0.02, "face_exception_rate": 0.02}


def parse_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    p.add_argument("--sd_ckpt", default=None, help="SD v1.5 .ckpt/.safetensors")
    p.add_argument("--embeddings", default=None,
                   help="subject embeddings (.pt/.npz) for configs 1-3")
    p.add_argument("--embeddings2", default=None,
                   help="second subject embeddings for config 3")
    p.add_argument("--subject_gt_dir", default=None,
                   help="ground-truth photos of the --embeddings subject")
    p.add_argument("--subject_string", default="z")
    p.add_argument("--subject2_string", default="y")
    p.add_argument("--ref_images", nargs="*", default=None,
                   help="reference face photos for config 4 (zero-shot)")
    p.add_argument("--arc2face_unet", default=None)
    p.add_argument("--arc2face_text_encoder", default=None)
    p.add_argument("--subject_file", default=None,
                   help="fish-syntax info file for config 5 batch eval")
    p.add_argument("--data_root", default=None)
    p.add_argument("--logdir", default="logs",
                   help="per-subject checkpoint tree for config 5")
    p.add_argument("--configs", default="1,2,3,4,5")
    p.add_argument("--outdir", default="outputs/parity")
    p.add_argument("--expectations", default=DEFAULT_EXPECTATIONS)
    p.add_argument("--update_expectations", action="store_true",
                   help="record the measured scores as the new expectations")
    p.add_argument("--mock", action="store_true",
                   help="tiny random models, synthetic subject, tolerance "
                        "diff against the mock expectations (CI mode)")
    p.add_argument("--max_prompts", type=int, default=-1,
                   help="cap config-5 prompts per subject (smoke runs)")
    return p.parse_args(argv)


def _t2i(argv):
    import txt2img as t2i

    opt = t2i.parse_args(argv)
    t2i.main(opt)
    return getattr(opt, "scores", None)


def _score_dir(gen_dir, ref_dir, prompt, face_sim=False):
    """Score an existing generated-images dir against a reference dir with
    the in-repo evaluators (the `compare_folders` path txt2img's inline
    eval uses, without re-generating anything)."""
    from adaface_tpu.evaluation.eval_utils import compare_folders
    from adaface_tpu.evaluation.scorers import init_evaluators

    scorer, dino = init_evaluators()
    ci, ct, dn = compare_folders(scorer, dino, gen_dir, ref_dir, prompt)
    out = {"clip_i": float(ci), "clip_t": float(ct), "dino": float(dn)}
    if face_sim:
        try:
            import jax
            import jax.numpy as jnp

            from adaface_tpu.evaluation.eval_utils import (
                compare_face_folders, list_image_files)
            from adaface_tpu.face_app import FaceApp
            from adaface_tpu.models.arcface import IResNet, IResNetConfig

            rec = IResNet(IResNetConfig.tiny())
            rp = rec.init(jax.random.PRNGKey(3),
                          jnp.zeros((1, 16, 16, 3)))["params"]
            app = FaceApp(recognizer=rec, params=rp)

            def embed(im):
                fs = app.get(im)
                return fs[0].normed_embedding if fs else None

            s, nf_gen, _nf_gt = compare_face_folders(embed, gen_dir, ref_dir)
            n_gen = len(list_image_files(gen_dir))
            out.update({"face_sim": float(s),
                        "face_exception_rate": nf_gen / max(n_gen, 1)})
        except Exception as e:
            print(f"# face-sim scoring skipped: {e!r}")
    return out


def _common(opt, extra):
    args = ["--outdir", os.path.join(opt.outdir, extra)]
    if opt.mock:
        args += ["--tiny"]
    elif opt.sd_ckpt:
        args += ["--ckpt", opt.sd_ckpt]
    return args


def _need(opt, *conds):
    """None if all asset conditions hold, else the skip reason."""
    missing = [name for name, ok in conds if not ok]
    return None if not missing else f"missing assets: {', '.join(missing)}"


def config1(opt):
    """SD txt2img, 1 subject embedding, 256px, DDIM-10, batch 1, fp32
    (BASELINE config 1 — run under JAX_PLATFORMS=cpu for the CPU-parity
    arm; the scores themselves are backend-invariant within tolerance)."""
    skip = _need(opt, ("--sd_ckpt", opt.mock or opt.sd_ckpt),
                 ("--embeddings", opt.mock or opt.embeddings),
                 ("--subject_gt_dir", opt.mock or opt.subject_gt_dir))
    if skip:
        return skip
    # mock shrinks the resolution: the tiny VAE's stride (f=2) would put
    # the tiny UNet at 128x128 latents at 256px — a 16k-token einsum
    # attention that swamps the CPU CI runner for no extra coverage
    size, steps, reps = ("64", "2", "2") if opt.mock else ("256", "10", "4")
    args = _common(opt, "cfg1") + [
        "--prompt", f"a photo of a {opt.subject_string}",
        "--steps", steps, "--size", size, "--n_samples", "1",
        "--n_repeat", reps, "--seed", "42",
        "--compare_with", opt.subject_gt_dir, "--calc_face_sim"]
    if not opt.mock:
        args += ["--embedding_paths", opt.embeddings,
                 "--subject_string", opt.subject_string]
    return _t2i(args)


def config2(opt):
    """Single-subject 512px DDIM-50 annealed CFG bf16 n_samples 8
    (BASELINE config 2, the bench.py operating point)."""
    skip = _need(opt, ("--sd_ckpt", opt.mock or opt.sd_ckpt),
                 ("--embeddings", opt.mock or opt.embeddings),
                 ("--subject_gt_dir", opt.mock or opt.subject_gt_dir))
    if skip:
        return skip
    size, steps, n = (("64", "2", "2") if opt.mock else ("512", "50", "8"))
    args = _common(opt, "cfg2") + [
        "--prompt", f"a photo of a {opt.subject_string}",
        "--steps", steps, "--size", size, "--n_samples", n,
        "--seed", "42", "--scale", "10", "4",
        "--compare_with", opt.subject_gt_dir, "--calc_face_sim"]
    if not opt.mock:
        args += ["--embedding_paths", opt.embeddings,
                 "--subject_string", opt.subject_string, "--bf16"]
    return _t2i(args)


def config3(opt):
    """Multi-subject composition: two embedding sets, 'a z hugging a y'
    (BASELINE config 3)."""
    skip = _need(opt, ("--sd_ckpt", opt.mock or opt.sd_ckpt),
                 ("--embeddings", opt.mock or opt.embeddings),
                 ("--embeddings2", opt.mock or opt.embeddings2),
                 ("--subject_gt_dir", opt.mock or opt.subject_gt_dir))
    if skip:
        return skip
    size, steps = ("64", "2") if opt.mock else ("512", "50")
    args = _common(opt, "cfg3") + [
        "--prompt",
        f"a {opt.subject_string} hugging a {opt.subject2_string}",
        "--steps", steps, "--size", size, "--n_samples", "4",
        "--seed", "42", "--compare_with", opt.subject_gt_dir]
    if not opt.mock:
        args += ["--embedding_paths", opt.embeddings, opt.embeddings2,
                 "--subject_string", opt.subject_string, "--bf16"]
    return _t2i(args)


def config4(opt):
    """Zero-shot Arc2Face identity-conditioned generation from reference
    face photos (BASELINE config 4). Uses the zero_shot_test harness
    (the `stable_txt2img.py --ref_images` path)."""
    skip = _need(opt,
                 ("--ref_images", opt.mock or opt.ref_images),
                 ("--arc2face weights", opt.mock or (
                     opt.arc2face_unet and opt.arc2face_text_encoder)))
    if skip:
        return skip
    if opt.mock:
        # the zero-shot chain needs face detection on the synthetic images
        # — random pixels have no faces, so mock mode certifies the
        # harness path by SKIPPING exactly like a missing-asset run
        return "mock mode: zero-shot needs real face photos"
    import zero_shot_test as zst

    outd = os.path.join(opt.outdir, "cfg4")
    zopt = zst.parse_args([
        "--ref_images", *opt.ref_images,
        "--prompt", f"a photo of a {opt.subject_string}",
        "--out", outd, "--ckpt", opt.sd_ckpt or ""])
    zst.main(zopt)
    # score the just-generated dir against the reference photos directly
    # (running txt2img again would RE-generate; and --skip_save +
    # --compare_with is rejected by its CLI)
    ref_dir = os.path.dirname(opt.ref_images[0])
    return _score_dir(outd, ref_dir, f"a photo of a {opt.subject_string}",
                      face_sim=True)


def config5(opt):
    """Batch eval over the DreamBench corpus with score aggregation
    (BASELINE config 5; `gen_subjects_and_eval.py:240-559`)."""
    skip = _need(opt, ("--subject_file", opt.mock or opt.subject_file),
                 ("--sd_ckpt", opt.mock or opt.sd_ckpt))
    if skip:
        return skip
    import gen_subjects_and_eval as gse

    outd = os.path.join(opt.outdir, "cfg5")
    args = ["--subject_file", opt.subject_file, "--outdir", outd,
            "--logdir", opt.logdir, "--prompt_set", "dreambench",
            "--max_prompts", str(opt.max_prompts)]
    if opt.data_root:
        args += ["--data_root", opt.data_root]
    if opt.mock:
        args += ["--tiny", "--n_samples", "1", "--steps", "2",
                 "--size", "64"]
    else:
        args += ["--ckpt", opt.sd_ckpt, "--n_samples", "4",
                 "--steps", "50", "--size", "512"]
    gopt = gse.parse_args(args)
    gse.main(gopt)
    # parse the MEAN row of the aggregated CSV
    path = os.path.join(outd, "all_scores.csv")
    if not os.path.exists(path):
        return "config 5 produced no all_scores.csv"
    with open(path) as f:
        rows = list(csv.reader(f))
    mean = next((r for r in rows if r and r[0] == "MEAN"), None)
    if mean is None:
        return "config 5 CSV has no MEAN row"
    out = {"clip_i": float(mean[2]), "clip_t": float(mean[3]),
           "dino": float(mean[4])}
    if len(mean) > 5 and mean[5]:
        out["face_sim"] = float(mean[5])
    if len(mean) > 7 and mean[7]:
        out["face_exception_rate"] = float(mean[7])
    return out


def diff_expectations(results, expectations, key):
    """Compare measured scores to the expectations section; returns a list
    of failure strings (empty = parity holds)."""
    fails = []
    exp = expectations.get(key, {})
    for cfg, want in exp.items():
        got = results.get(cfg)
        if not isinstance(want, dict):
            continue
        if not isinstance(got, dict):
            fails.append(f"{cfg}: expected scores, got {got!r}")
            continue
        for metric, expected in want.items():
            if expected is None or metric not in TOLERANCES:
                continue
            if metric not in got:
                fails.append(f"{cfg}.{metric}: missing from measured scores")
                continue
            tol = TOLERANCES[metric]
            if abs(got[metric] - expected) > tol:
                fails.append(
                    f"{cfg}.{metric}: measured {got[metric]:.4f} vs expected "
                    f"{expected:.4f} (tolerance ±{tol})")
    return fails


def _mock_assets(opt):
    """Synthesize a tiny subject corpus + info file so --mock exercises
    every harness path (generation, per-dir scoring, CSV aggregation,
    expectations diff) with zero real assets."""
    import numpy as np
    from PIL import Image

    root = os.path.join(opt.outdir, "mock_assets")
    subj = os.path.join(root, "mocksubj")
    os.makedirs(subj, exist_ok=True)
    rng = np.random.default_rng(0)
    for i in range(2):
        Image.fromarray(rng.integers(0, 255, (64, 64, 3)).astype("uint8")
                        ).save(os.path.join(subj, f"{i}.jpg"))
    info = os.path.join(root, "info-mock.sh")
    with open(info, "w") as f:
        f.write("set -g subjects mocksubj\n"
                'set -g class_names "person"\n'
                'set -g cls_delta_strings "person"\n'
                f"set -g data_folder {root}\n"
                "set -g broad_classes 1\n"
                "set -g are_faces 0\n"
                "set -g sel_set 1\n")
    opt.subject_gt_dir = opt.subject_gt_dir or subj
    opt.subject_file = opt.subject_file or info
    opt.data_root = opt.data_root or root
    opt.max_prompts = 1 if opt.max_prompts < 0 else opt.max_prompts


def main(argv=None):
    opt = parse_args(argv)
    os.makedirs(opt.outdir, exist_ok=True)
    if opt.mock:
        _mock_assets(opt)
    runners = {"1": config1, "2": config2, "3": config3, "4": config4,
               "5": config5}
    results = {}
    for c in opt.configs.split(","):
        c = c.strip()
        if c not in runners:
            continue
        print(f"=== parity config {c} ===", flush=True)
        try:
            results[f"config{c}"] = runners[c](opt)
        # a config crash is a result, not an abort — incl. SystemExit from
        # argparse/CLI guards inside the in-process runners
        except (Exception, SystemExit) as e:
            results[f"config{c}"] = f"ERROR: {e!r}"
        print(f"config {c}: {results[f'config{c}']}", flush=True)

    expectations = {}
    if os.path.exists(opt.expectations):
        with open(opt.expectations) as f:
            expectations = json.load(f)
    key = "mock" if opt.mock else "real"

    if opt.update_expectations:
        section = {cfg: (r if isinstance(r, dict) else None)
                   for cfg, r in results.items()}
        expectations[key] = section
        with open(opt.expectations, "w") as f:
            json.dump(expectations, f, indent=2, sort_keys=True)
        print(f"recorded expectations[{key}] -> {opt.expectations}")
        fails = []
    else:
        fails = diff_expectations(results, expectations, key)

    report = {"mode": key, "results": results, "failures": fails,
              "expectations_file": opt.expectations}
    rp = os.path.join(opt.outdir, "parity_report.json")
    with open(rp, "w") as f:
        json.dump(report, f, indent=2, sort_keys=True)
    print(json.dumps({"parity": "FAIL" if fails else "OK",
                      "failures": fails, "report": rp}))
    return 1 if fails else 0


if __name__ == "__main__":
    sys.exit(main())
