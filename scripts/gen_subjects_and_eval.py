#!/usr/bin/env python
"""Batch subject generation + evaluation driver.

TPU-native equivalent of `scripts/gen_subjects_and_eval.py` (560 LoC):
iterate subjects from a fish-syntax info file, build DreamBench/community
prompt TSVs, locate the newest checkpoint per subject, generate via
`scripts/txt2img.py` (in-process, not `os.system`), score against the
subject's ground-truth folder, and aggregate a scores CSV
(`gen_subjects_and_eval.py:240-559`).
"""

import argparse
import csv
import glob
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def parse_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--subject_file", required=True,
                   help="evaluation/info-*.sh style fish-syntax file")
    p.add_argument("--data_root", default=None,
                   help="overrides the info file's data_folder")
    p.add_argument("--logdir", default="logs",
                   help="root of per-subject training runs")
    p.add_argument("--outdir", default="outputs/eval")
    p.add_argument("--range", dest="range_str", default=None,
                   help="subject range like '1-5,8' (1-offset)")
    p.add_argument("--prompt_set", choices=("dreambench", "community", "all"),
                   default="dreambench")
    p.add_argument("--n_samples", type=int, default=4)
    p.add_argument("--steps", type=int, default=50)
    p.add_argument("--size", type=int, default=512)
    p.add_argument("--num_devices", type=int, default=1,
                   help="serving mesh size forwarded to txt2img "
                        "(n_samples shard data-parallel; -1 = all chips)")
    p.add_argument("--tp", type=int, default=1,
                   help="tensor-parallel factor forwarded to txt2img")
    p.add_argument("--z_prefix", default="")
    p.add_argument("--z_suffix_type", default=None,
                   help="'' | class_name | cls_delta_string | literal text "
                        "(gen_subjects_and_eval.py:77-287; default: "
                        "class_name for non-human broad classes)")
    p.add_argument("--extra_z_suffix", default="",
                   help="extra suffix after the subject token (usually "
                        "reduces similarity; :82)")
    p.add_argument("--prompt_prefix", default="")
    p.add_argument("--prompt_suffix", default="",
                   help="appended as ', <suffix>' (:345-348)")
    p.add_argument("--include_bg_string", action="store_true",
                   help="append 'with background y, ...' to prompts (:291)")
    p.add_argument("--background_string", default="y")
    p.add_argument("--num_vectors_per_bg_token", type=int, default=4)
    p.add_argument("--method", choices=("ada", "ti", "static", "db"),
                   default="ada",
                   help="evaluated method tag; db defaults z_suffix_type "
                        "to cls_delta_string (:225-227)")
    p.add_argument("--ckpt_iter", type=int, default=None,
                   help="pick embeddings at this step instead of newest")
    p.add_argument("--selset", action="store_true",
                   help="evaluate only the info file's sel_set")
    p.add_argument("--skipselset", action="store_true",
                   help="skip the info file's sel_set subjects (:241)")
    p.add_argument("--gen_prompt_set_only", action="store_true",
                   help="write the prompt TSVs and exit")
    p.add_argument("--dryrun", action="store_true",
                   help="print the per-subject txt2img argv without running")
    p.add_argument("--ckpt", default=None, help="SD backbone .ckpt")
    p.add_argument("--tiny", action="store_true")
    p.add_argument("--max_prompts", type=int, default=-1)
    return p.parse_args(argv)


def find_newest_embeddings(logdir: str, subject: str, ckpt_iter=None):
    """Newest per-subject embeddings checkpoint
    (`gen_subjects_and_eval.py` newest-logdir scan); `ckpt_iter` pins a
    specific training step (`--ckpt_iter`, `:115`)."""
    cands = sorted(
        glob.glob(os.path.join(logdir, f"*{subject}*", "embeddings_*.npz"))
        + glob.glob(os.path.join(logdir, f"*{subject}*", "embeddings_*.pt")),
        key=os.path.getmtime)
    if ckpt_iter is not None:
        pinned = [c for c in cands
                  if f"_{ckpt_iter}." in os.path.basename(c)
                  or f"gs-{ckpt_iter}." in os.path.basename(c)]
        return pinned[-1] if pinned else None
    return cands[-1] if cands else None


def resolve_z_suffix(opt, broad: int, class_name: str, cls_delta: str) -> str:
    """The reference's z-suffix dispatch (`gen_subjects_and_eval.py:
    259-289`): db -> cls_delta_string; default '' for humans/animals,
    class_name otherwise; literal strings pass through."""
    zst = opt.z_suffix_type
    if zst is None:
        zst = "cls_delta_string" if opt.method == "db" else \
            ("" if broad == 1 else "class_name")
    if zst == "cls_delta_string":
        z_suffix = " " + cls_delta
    elif zst == "class_name":
        z_suffix = " " + class_name
    elif zst == "":
        z_suffix = ""
    else:
        z_suffix = (" " + zst) if zst[0].isalnum() or zst[0] == "_" else zst
    if opt.extra_z_suffix:
        z_suffix += " " + opt.extra_z_suffix + ","
    return z_suffix


def main(opt):
    from adaface_tpu.evaluation.eval_utils import parse_range_str, parse_subject_file
    from adaface_tpu.evaluation.prompt_sets import get_prompt_list
    import txt2img

    subj_info, subj2attr = parse_subject_file(opt.subject_file)
    subjects = subj_info["subjects"]
    sel_set = list(subj_info["sel_set"])
    if opt.selset:
        sel = sel_set
    else:
        sel = parse_range_str(opt.range_str) or sel_set
    if opt.skipselset:
        base = parse_range_str(opt.range_str) or list(range(len(subjects)))
        sel = [i for i in base if i not in set(sel_set)]
    data_root = opt.data_root or subj_info["data_folder"][0]

    os.makedirs(opt.outdir, exist_ok=True)
    scores_path = os.path.join(opt.outdir, "all_scores.csv")
    rows = []
    for idx in sel:
        subject = subjects[idx]
        cls_delta = subj2attr.get("cls_delta_strings", {}).get(subject, "person")
        class_name = subj2attr.get("class_names", {}).get(subject, cls_delta)
        broad = subj2attr.get("broad_classes", {}).get(subject, 1)
        z_suffix = resolve_z_suffix(opt, broad, class_name, cls_delta)
        bg = ""
        if opt.include_bg_string and opt.background_string:
            bg = (" with background " + opt.background_string
                  + ", " * (opt.num_vectors_per_bg_token - 1))
        prompts, cls_prompts, _ = get_prompt_list(
            "z", opt.z_prefix, z_suffix, bg, class_name, cls_delta, broad,
            set_name=opt.prompt_set)
        if opt.prompt_prefix:
            prompts = [opt.prompt_prefix + " " + p for p in prompts]
            cls_prompts = [opt.prompt_prefix + " " + p for p in cls_prompts]
        if opt.prompt_suffix:
            prompts = [p + ", " + opt.prompt_suffix for p in prompts]
            cls_prompts = [p + ", " + opt.prompt_suffix for p in cls_prompts]
        if opt.max_prompts > 0:
            prompts, cls_prompts = (prompts[:opt.max_prompts],
                                    cls_prompts[:opt.max_prompts])
        tsv = os.path.join(opt.outdir, f"{subject}-prompts.tsv")
        with open(tsv, "w") as f:
            w = csv.writer(f, delimiter="\t")
            for pi, prompt in enumerate(prompts):
                w.writerow([1, f"p{pi:02}", prompt, cls_prompts[pi]])

        if opt.gen_prompt_set_only:
            print(f"== {subject}: wrote {tsv}")
            continue
        emb = find_newest_embeddings(opt.logdir, subject, opt.ckpt_iter)
        out = os.path.join(opt.outdir, subject)
        gt = os.path.join(data_root, subject)
        is_face = subj2attr.get("are_faces", {}).get(subject, 1)
        argv = ["--from_file", tsv, "--out", out,
                "--steps", str(opt.steps), "--size", str(opt.size),
                "--n_samples", str(opt.n_samples)]
        if opt.num_devices != 1 or opt.tp > 1:
            argv += ["--num_devices", str(opt.num_devices),
                     "--tp", str(opt.tp)]
        if os.path.isdir(gt):
            argv += ["--compare_with", gt, "--class_prompt", cls_prompts[0]]
            if int(is_face):
                # face-sim + exception accounting only for are_faces
                # subjects (`info-subjects.sh` $are_faces row)
                argv += ["--calc_face_sim"]
        if emb:
            argv += ["--embedding_paths", emb]
        if opt.ckpt:
            argv += ["--ckpt", opt.ckpt]
        if opt.tiny:
            argv += ["--tiny"]
        print(f"== {subject}: emb={emb}")
        if opt.dryrun:
            print("   txt2img " + " ".join(argv))
            continue
        txt2img.main(txt2img.parse_args(argv))
        sc = os.path.join(out, "scores.csv")
        if os.path.exists(sc):
            with open(sc) as f:
                for r in csv.reader(f):
                    rows.append([subject] + r)

    if rows:
        import numpy as np

        with open(scores_path, "w") as f:
            w = csv.writer(f)
            w.writerow(["subject", "prompt", "clip_i", "clip_t", "dino",
                        "face_sim", "face_exceptions", "face_exception_rate"])
            w.writerows(rows)
            arr = np.asarray([[float(x) for x in r[2:5]] for r in rows])
            mean = arr.mean(axis=0)
            face = np.asarray([float(r[5]) for r in rows if len(r) > 5])
            exc = np.asarray([float(r[7]) for r in rows if len(r) > 7])
            w.writerow(["MEAN", "", *[f"{m:.4f}" for m in mean],
                        f"{face.mean():.4f}" if len(face) else "",
                        "", f"{exc.mean():.4f}" if len(exc) else ""])
        msg = (f"aggregated {len(rows)} rows -> {scores_path}; mean "
               f"CLIP-I={mean[0]:.4f} CLIP-T={mean[1]:.4f} DINO={mean[2]:.4f}")
        if len(face):
            msg += f" face={face.mean():.4f} exc_rate={exc.mean():.4f}"
        print(msg)
    return 0


if __name__ == "__main__":
    sys.exit(main(parse_args()))
