#!/usr/bin/env python
"""Gradio web UI — the `app.py`/`webuiParamClass.py` equivalent.

Wraps `scripts/txt2img.main` in a Blocks UI (`app.py:4,61` in the
reference). Gradio isn't in this environment; the module degrades to a
CLI passthrough so the interface contract stays importable/testable.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "scripts"))

import txt2img  # noqa: E402


def generate(prompt: str, steps: int = 50, size: int = 512,
             n_samples: int = 4, seed: int = 0, scale_max: float = 10.0,
             scale_min: float = 4.0, embedding_path: str = "",
             ckpt: str = "", outdir: str = "outputs/webui"):
    """The UI callback (`app.py:18`): returns the written image paths."""
    argv = ["--prompt", prompt, "--steps", str(steps), "--size", str(size),
            "--n_samples", str(n_samples), "--seed", str(seed),
            "--scale", str(scale_max), str(scale_min), "--out", outdir]
    if embedding_path:
        argv += ["--embedding_paths", embedding_path]
    if ckpt:
        argv += ["--ckpt", ckpt]
    txt2img.main(txt2img.parse_args(argv))
    return sorted(os.path.join(outdir, f) for f in os.listdir(outdir)
                  if f.endswith(".jpg"))


def build_ui():
    try:
        import gradio as gr
    except ImportError:
        return None
    with gr.Blocks(title="AdaFace-TPU") as demo:
        prompt = gr.Textbox(label="Prompt", value="a photo of a z person")
        steps = gr.Slider(1, 100, value=50, step=1, label="DDIM steps")
        size = gr.Slider(256, 768, value=512, step=64, label="Size")
        n = gr.Slider(1, 8, value=4, step=1, label="Samples")
        seed = gr.Number(value=0, label="Seed")
        emb = gr.Textbox(label="Embeddings checkpoint", value="")
        ckpt = gr.Textbox(label="SD checkpoint", value="")
        gallery = gr.Gallery(label="Results")
        gr.Button("Generate").click(
            lambda p, st, sz, ns, sd, e, c: generate(
                p, int(st), int(sz), int(ns), int(sd),
                embedding_path=e, ckpt=c),
            [prompt, steps, size, n, seed, emb, ckpt], gallery)
    return demo


if __name__ == "__main__":
    demo = build_ui()
    if demo is None:
        raise SystemExit("gradio not installed; use scripts/txt2img.py")
    demo.launch()
