"""img2img + masked-latent inpainting CLI smoke (the reference's
scripts/img2img.py + inpaint.py surface)."""

import os
import sys

import numpy as np


def _write_img(path, size=64, seed=0):
    from PIL import Image

    rng = np.random.default_rng(seed)
    Image.fromarray(rng.integers(0, 255, (size, size, 3)
                                 ).astype(np.uint8)).save(path)


def test_img2img_and_inpaint_smoke(tmp_path):
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                    "scripts"))
    import img2img

    init = str(tmp_path / "init.png")
    _write_img(init)
    out1 = str(tmp_path / "o1")
    rc = img2img.main(img2img.parse_args([
        "--init_img", init, "--prompt", "a photo of a z",
        "--strength", "0.5", "--steps", "4", "--n_samples", "1",
        "--size", "64", "--tiny", "--out", out1]))
    assert rc in (0, None)
    assert any(f.endswith((".jpg", ".png")) for f in os.listdir(out1))

    # masked-latent inpainting path
    from PIL import Image

    mask = str(tmp_path / "mask.png")
    m = np.zeros((64, 64), np.uint8)
    m[16:48, 16:48] = 255
    Image.fromarray(m).save(mask)
    out2 = str(tmp_path / "o2")
    rc = img2img.main(img2img.parse_args([
        "--init_img", init, "--prompt", "a photo of a z", "--mask", mask,
        "--strength", "0.6", "--steps", "4", "--n_samples", "1",
        "--size", "64", "--tiny", "--out", out2]))
    assert rc in (0, None)
    assert any(f.endswith((".jpg", ".png")) for f in os.listdir(out2))


def _build_conv_attn_pipe(ks):
    """Tiny random pipeline with a 2-vector subject placeholder and
    conv-attn kernel size `ks` (1 = conv attention off)."""
    import jax
    from adaface_tpu.data.tokenizer import HashTokenizer
    from adaface_tpu.models.unet import UNetConfig
    from adaface_tpu.models.vae import VAEConfig
    from adaface_tpu.models.clip_text import CLIPTextConfig
    from adaface_tpu.pipeline import StableDiffusionPipeline
    from adaface_tpu.personalization.static_embedding import init_static_embedder

    tok = HashTokenizer()
    unet_cfg = UNetConfig(model_channels=32, channel_mult=(1, 2),
                          num_res_blocks=1, attention_levels=(0, 1),
                          num_heads=4, context_dim=64,
                          conv_attn_kernel_size=ks)
    pipe = StableDiffusionPipeline.from_random(
        jax.random.PRNGKey(0), tok, unet_cfg, VAEConfig.tiny(),
        CLIPTextConfig.tiny(vocab_size=49408, hidden_size=64,
                            max_position_embeddings=77,
                            num_extra_tokens=4))
    tid = pipe.tokenizer.add_placeholder("z")
    pipe.embedding_manager.add_placeholder(
        "z", token_id=tid, num_vectors=2, init_key=jax.random.PRNGKey(5))
    pipe.embedding_manager.embedders["z"] = init_static_embedder(
        jax.random.PRNGKey(5), num_vectors=2, emb_dim=64, rank=4)
    return pipe


def test_img2img_conv_attn_slot_map_active():
    """img2img must thread the subject slot map into the UNet so conv
    attention conditions identically to generate() — regression: it used
    to pass None, silently disabling conv attn on this path."""
    rng = np.random.default_rng(11)
    init = rng.integers(0, 255, (64, 64, 3)).astype(np.uint8)
    out1 = _build_conv_attn_pipe(1).img2img(
        init, ["a photo of a z ,"], strength=0.5, num_steps=2, seed=3)
    out3 = _build_conv_attn_pipe(3).img2img(
        init, ["a photo of a z ,"], strength=0.5, num_steps=2, seed=3)
    assert out1.shape == out3.shape == (1, 64, 64, 3)
    # conv attention (ks=3) must actually change the conditioning
    assert np.abs(out1.astype(int) - out3.astype(int)).max() > 0


def test_inpaint_conv_attn_slot_map_active():
    """The inpaint path must thread the subject slot map like
    generate()/img2img() — regression: it passed no subj_slot_map,
    silently disabling conv attention during inpainting."""
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                    "scripts"))
    import img2img as cli

    rng = np.random.default_rng(12)
    init = rng.integers(0, 255, (64, 64, 3)).astype(np.uint8)
    mask = np.zeros((64, 64), np.float32)
    mask[16:48, 16:48] = 1.0
    out1 = cli.inpaint(_build_conv_attn_pipe(1), init, mask,
                       ["a photo of a z ,"], num_steps=2, seed=3)
    out3 = cli.inpaint(_build_conv_attn_pipe(3), init, mask,
                       ["a photo of a z ,"], num_steps=2, seed=3)
    assert out1.shape == out3.shape == (1, 64, 64, 3)
    assert np.abs(out1.astype(int) - out3.astype(int)).max() > 0
