"""End-to-end pipeline smoke tests (tiny random models) + tokenizer tests."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from adaface_tpu.data.tokenizer import HashTokenizer, CLIPBPETokenizer
from adaface_tpu.models.clip_text import CLIPTextConfig
from adaface_tpu.models.unet import UNetConfig
from adaface_tpu.models.vae import VAEConfig
from adaface_tpu.pipeline import StableDiffusionPipeline

# oracle-parity / integration battery: minutes of compile; run with -m slow
pytestmark = pytest.mark.slow


def _tiny_pipeline():
    tok = HashTokenizer()
    unet_cfg = UNetConfig(model_channels=32, channel_mult=(1, 2), num_res_blocks=1,
                          attention_levels=(0, 1), num_heads=4, context_dim=64)
    vae_cfg = VAEConfig.tiny()
    clip_cfg = CLIPTextConfig.tiny(vocab_size=49408, hidden_size=64,
                                   max_position_embeddings=77, num_extra_tokens=4)
    return StableDiffusionPipeline.from_random(
        jax.random.PRNGKey(0), tok, unet_cfg, vae_cfg, clip_cfg)


# NOTE: tiny UNet has a different CA layer count than 16; the pipeline
# broadcasts context so this still exercises the full path.


def test_generate_plain_prompt():
    pipe = _tiny_pipeline()
    imgs = pipe.generate(["a photo of a cat"], num_steps=2, height=64, width=64,
                         guidance_scale=(7.5, 2.0), seed=1)
    assert imgs.shape == (1, 64, 64, 3)
    assert imgs.dtype == np.uint8


def test_ab_knob_flip_retraces_and_matches(monkeypatch):
    """Flipping ADAFACE_CFG_DEDUP / ADAFACE_CROSS_KV between generate()
    calls must RETRACE (the knobs are baked into the jitted program — the
    cache key includes them, regression). The cross-KV hoist is
    bit-identical; the stem dedup is mathematically identical but runs the
    stem convs at batch B instead of 2B, so XLA may reassociate reductions
    — allow 1 uint8 quantization step."""
    pipe = _tiny_pipeline()
    kw = dict(num_steps=2, height=64, width=64, guidance_scale=7.5, seed=3)
    base = pipe.generate(["a photo of a cat"], **kw)
    n_cached = len(pipe._sample_cache)
    monkeypatch.setenv("ADAFACE_CROSS_KV", "0")
    no_hoist = pipe.generate(["a photo of a cat"], **kw)
    assert len(pipe._sample_cache) > n_cached  # retraced, not stale reuse
    np.testing.assert_array_equal(base, no_hoist)  # hoist is bit-identical
    monkeypatch.setenv("ADAFACE_CFG_DEDUP", "0")
    plain = pipe.generate(["a photo of a cat"], **kw)
    assert np.abs(base.astype(int) - plain.astype(int)).max() <= 1


def test_aot_executable_cache_roundtrip(tmp_path):
    """ADAFACE_AOT_CACHE (the serving cold-start fix, pipeline._aot_wrap):
    process 1 serializes the compiled sampling executable; process 2 loads
    it via deserialize_and_load — skipping compilation — and produces
    identical images. Subprocesses on a SINGLE-device CPU platform: the
    8-virtual-device test platform trips an XLA:CPU AOT reload bug, which
    is why the cache is gated off on cpu without ADAFACE_AOT_CACHE_FORCE."""
    import os as _os
    import subprocess
    import sys as _sys

    cache = str(tmp_path / "aot")
    script = (
        "import os, sys, numpy as np\n"
        f"sys.path.insert(0, {repr(_os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))})\n"
        "import jax\n"
        "from tests.test_pipeline import _tiny_pipeline\n"
        "out = _tiny_pipeline().generate(['a photo of a cat'] * 2,\n"
        "    num_steps=2, height=64, width=64, guidance_scale=7.5, seed=5)\n"
        "print('SUM', int(out.astype(np.int64).sum()))\n")
    env = dict(_os.environ, JAX_PLATFORMS="cpu",
               ADAFACE_AOT_CACHE=cache, ADAFACE_AOT_CACHE_FORCE="1")
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env.pop("XLA_FLAGS", None)  # single device — no virtual 8-device mesh

    def run():
        r = subprocess.run([_sys.executable, "-c", script], env=env,
                           capture_output=True, text=True, timeout=500)
        assert r.returncode == 0, r.stdout + r.stderr
        return [l for l in r.stdout.splitlines() if l.startswith("SUM")][0]

    s1 = run()
    files = _os.listdir(cache)
    assert any(f.endswith(".aot") for f in files), files
    # entries are zlib-compressed (~3.3x on SD-sized executables — makes
    # shipping a prewarmed cache dir practical); legacy raw entries load too
    first = next(f for f in files if f.endswith(".aot"))
    with open(_os.path.join(cache, first), "rb") as fh:
        assert fh.read(4) == b"AOTZ"
    mtimes = {f: _os.path.getmtime(_os.path.join(cache, f)) for f in files}
    s2 = run()
    assert s1 == s2
    # the second process LOADED (no rewrite -> cache files untouched)
    assert all(_os.path.getmtime(_os.path.join(cache, f)) == m
               for f, m in mtimes.items())


def test_cfg_dedup_falls_back_without_level0_attention():
    """UNet configs with no attention block at level 0 cannot stem-dedup;
    generate() must fall back to the doubled-batch stem instead of
    raising at trace time (regression)."""
    tok = HashTokenizer()
    unet_cfg = UNetConfig(model_channels=32, channel_mult=(1, 2),
                          num_res_blocks=1, attention_levels=(1,),
                          num_heads=4, context_dim=64)
    pipe = StableDiffusionPipeline.from_random(
        jax.random.PRNGKey(0), tok, unet_cfg, VAEConfig.tiny(),
        CLIPTextConfig.tiny(vocab_size=49408, hidden_size=64,
                            max_position_embeddings=77, num_extra_tokens=4))
    imgs = pipe.generate(["a photo of a cat"], num_steps=2, height=64,
                         width=64, guidance_scale=7.5, seed=1)
    assert imgs.shape == (1, 64, 64, 3)


def test_generate_with_subject_embedding():
    pipe = _tiny_pipeline()
    tid = pipe.tokenizer.add_placeholder("z")
    pipe.embedding_manager.add_placeholder("z", token_id=tid, num_vectors=2,
                                           init_key=jax.random.PRNGKey(5))
    # shrink embedder to the tiny clip dim
    from adaface_tpu.personalization.static_embedding import init_static_embedder
    pipe.embedding_manager.embedders["z"] = init_static_embedder(
        jax.random.PRNGKey(5), num_vectors=2, emb_dim=64, rank=4)

    imgs_a = pipe.generate(["a photo of a z ,"], num_steps=2, height=64, width=64, seed=3)
    imgs_b = pipe.generate(["a photo of a q ,"], num_steps=2, height=64, width=64, seed=3)
    assert imgs_a.shape == (1, 64, 64, 3)
    # subject embedding must change the output vs an ordinary word
    assert np.abs(imgs_a.astype(int) - imgs_b.astype(int)).max() > 0


def test_plms_path():
    pipe = _tiny_pipeline()
    imgs = pipe.generate(["hello world"], num_steps=4, height=64, width=64,
                         sampler="plms", guidance_scale=5.0, seed=0)
    assert imgs.shape == (1, 64, 64, 3)


def test_hash_tokenizer_contract():
    tok = HashTokenizer()
    ids = tok(["a photo of a cat", "dog"])
    assert ids.shape == (2, 77)
    assert ids[0, 0] == tok.bos_id
    assert ids[1, 2] == tok.eos_id  # "dog" -> BOS, word, EOS...
    # determinism + distinct words distinct ids (overwhelmingly likely)
    ids2 = tok(["a photo of a cat", "dog"])
    np.testing.assert_array_equal(ids, ids2)
    tid = tok.add_placeholder("z")
    assert tid == tok.vocab_size
    ids3 = tok(["a z portrait"])
    assert tid in ids3[0]


def test_clip_bpe_tokenizer_with_synthetic_vocab(tmp_path):
    """Real BPE mechanics on a constructed vocab: bytes + merges."""
    import json

    # vocab: all single byte-units and with </w>, plus merged tokens
    from adaface_tpu.data.tokenizer import bytes_to_unicode

    b2u = bytes_to_unicode()
    units = sorted(set(b2u.values()))
    vocab = {}
    for u in units:
        vocab[u] = len(vocab)
    for u in units:
        vocab[u + "</w>"] = len(vocab)
    merges = ["h e", "he l", "hel l", "hell o</w>"]
    for m in merges:
        tok = m.replace(" ", "")
        if tok not in vocab:
            vocab[tok] = len(vocab)
    vocab["<|startoftext|>"] = len(vocab)
    vocab["<|endoftext|>"] = len(vocab)
    (tmp_path / "vocab.json").write_text(json.dumps(vocab))
    (tmp_path / "merges.txt").write_text("#version: 0.2\n" + "\n".join(merges))

    tok = CLIPBPETokenizer(str(tmp_path / "vocab.json"), str(tmp_path / "merges.txt"))
    ids = tok.encode("hello")
    assert ids == [vocab["hello</w>"]]
    ids2 = tok.encode("help")  # h+e->he, he+l->hel; p</w> unmerged
    assert ids2 == [vocab["hel"], vocab["p</w>"]]
    batch = tok(["hello hello"])
    assert batch[0, 0] == tok.bos_id and batch[0, 3] == tok.eos_id
