"""Full-SD-width interop certification (VERDICT round-2 item 5).

The reduced-width oracle tests certify the interop MAPPING logic; this
battery certifies it at the real SD v1.5 widths — the strongest in-env
proxy for the ±0.01 CLIP-I/DINO quality-parity target while no real
weight assets exist: build the reference's full-size torch modules with
random weights, map the state dicts through `interop/` with STRICT key
consumption (every torch parameter must be read exactly once), and assert
single-forward fp32 parity.

Very slow on this 1-core box (full-width UNet fp32 forward both sides);
runs in the `-m slow` battery only.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from adaface_tpu.interop.hf_clip import map_clip_text_params
from adaface_tpu.interop.sd_unet import map_unet_params
from adaface_tpu.interop.sd_vae import map_vae_params
from adaface_tpu.models.clip_text import CLIPTextConfig, CLIPTextEncoder
from adaface_tpu.models.unet import UNetConfig, UNetModel
from adaface_tpu.models.vae import AutoencoderKL, VAEConfig
from tests.reference_oracle import import_reference_module, reference_available

pytestmark = [
    pytest.mark.slow,
    pytest.mark.skipif(not reference_available(), reason="reference absent"),
]


class RecordingDict(dict):
    """State dict that records which keys the interop mapper consumed."""

    def __init__(self, d):
        super().__init__(d)
        self.read = set()

    def __getitem__(self, k):
        self.read.add(k)
        return super().__getitem__(k)


def _assert_all_consumed(sd: RecordingDict, ignore=("position_ids",)):
    left = {k for k in sd if k not in sd.read
            and not any(tok in k for tok in ignore)}
    assert not left, f"unconsumed reference keys: {sorted(left)[:10]}"


def test_full_width_unet_parity():
    """SD v1.5 UNet (320ch, 16 CA layers, context 768) at latent 16x16."""
    cfg = UNetConfig()  # the real SD config is the default
    m = import_reference_module("ldm.modules.diffusionmodules.openaimodel")
    torch.manual_seed(0)
    t_unet = m.UNetModel(
        image_size=16, in_channels=4, out_channels=4, model_channels=320,
        attention_resolutions=[4, 2, 1], num_res_blocks=2,
        channel_mult=[1, 2, 4, 4], num_heads=8, use_spatial_transformer=True,
        transformer_depth=1, context_dim=768, use_checkpoint=False,
        legacy=False).eval()
    sd = RecordingDict({k: v.numpy() for k, v in t_unet.state_dict().items()})
    params = map_unet_params(sd, cfg, prefix="")
    _assert_all_consumed(sd)

    rng = np.random.default_rng(0)
    x = rng.standard_normal((1, 16, 16, 4)).astype(np.float32)
    t = np.asarray([500], np.int64)
    ctx = rng.standard_normal((16, 1, 77, 768)).astype(np.float32)
    eps = UNetModel(cfg).apply({"params": params}, jnp.asarray(x),
                               jnp.asarray(t), jnp.asarray(ctx))
    extra = dict(use_layerwise_context=True, iter_type="normal_recon",
                 is_training=False, capture_distill_attn=False,
                 use_conv_attn_kernel_size=-1, placeholder2indices=None,
                 img_mask=None, compel_cfg_weight_level_range=None,
                 apply_compel_cfg_prob=0, empty_context=None,
                 debug_attn=False)
    with torch.no_grad():
        ctx_t = torch.tensor(ctx.transpose(1, 0, 2, 3).reshape(16, 77, 768))
        eps_t = t_unet(torch.tensor(x.transpose(0, 3, 1, 2)),
                       torch.tensor(t), context=ctx_t, extra_info=extra)
    np.testing.assert_allclose(np.asarray(eps),
                               eps_t.numpy().transpose(0, 2, 3, 1),
                               rtol=2e-3, atol=2e-4)


def test_full_width_vae_parity():
    """SD VAE (ch 128, mult 1/2/4/4, mid attention) at 64px."""
    cfg = VAEConfig()  # real SD VAE
    m = import_reference_module("ldm.models.autoencoder")
    torch.manual_seed(0)
    ddconfig = dict(double_z=True, z_channels=4, resolution=64, in_channels=3,
                    out_ch=3, ch=128, ch_mult=[1, 2, 4, 4], num_res_blocks=2,
                    attn_resolutions=[], dropout=0.0)
    t_vae = m.AutoencoderKL(ddconfig=ddconfig,
                            lossconfig={"target": "torch.nn.Identity"},
                            embed_dim=4).eval()
    sd = RecordingDict({k: v.numpy() for k, v in t_vae.state_dict().items()})
    params = map_vae_params(sd, cfg, prefix="")
    _assert_all_consumed(sd)

    rng = np.random.default_rng(1)
    x = rng.standard_normal((1, 64, 64, 3)).astype(np.float32)
    mean, logvar = AutoencoderKL(cfg).apply(
        {"params": params}, jnp.asarray(x), method=AutoencoderKL.encode)
    with torch.no_grad():
        post = t_vae.encode(torch.tensor(x.transpose(0, 3, 1, 2)))
        mean_t, logvar_t = post.mean.numpy(), post.logvar.numpy()
    np.testing.assert_allclose(np.asarray(mean),
                               mean_t.transpose(0, 2, 3, 1),
                               rtol=2e-3, atol=2e-4)
    np.testing.assert_allclose(np.asarray(logvar),
                               logvar_t.transpose(0, 2, 3, 1),
                               rtol=2e-3, atol=2e-3)
    # decoder side
    z = np.asarray(mean, np.float32)
    img = AutoencoderKL(cfg).apply({"params": params}, jnp.asarray(z),
                                   method=AutoencoderKL.decode)
    with torch.no_grad():
        img_t = t_vae.decode(torch.tensor(z.transpose(0, 3, 1, 2))).numpy()
    np.testing.assert_allclose(np.asarray(img),
                               img_t.transpose(0, 2, 3, 1),
                               rtol=2e-3, atol=5e-4)


def test_full_width_clip_text_parity():
    """ViT-L/14 text encoder (12 layers, 768 hidden, 49408 vocab)."""
    transformers = pytest.importorskip("transformers")
    hf_cfg = transformers.CLIPTextConfig(
        vocab_size=49408, hidden_size=768, num_hidden_layers=12,
        num_attention_heads=12, intermediate_size=3072,
        max_position_embeddings=77)
    torch.manual_seed(0)
    t_clip = transformers.CLIPTextModel(hf_cfg).eval()
    sd = RecordingDict({k: v.numpy() for k, v in t_clip.state_dict().items()})
    params = map_clip_text_params(sd, num_layers=12)
    _assert_all_consumed(sd)

    cfg = CLIPTextConfig()  # the real ViT-L/14 text config is the default
    ids = np.asarray([[49406, 320, 1125, 539, 320, 2368, 49407] + [0] * 70],
                     np.int64)
    # last-hidden-state comparison: skip_weights (0, 1) selects the final
    # layer exactly like HF's last_hidden_state
    out = CLIPTextEncoder(cfg).apply(
        {"params": params}, jnp.asarray(ids),
        skip_weights=jnp.asarray([0.0, 1.0]))
    with torch.no_grad():
        out_t = t_clip(input_ids=torch.tensor(ids)).last_hidden_state.numpy()
    np.testing.assert_allclose(np.asarray(out), out_t, rtol=2e-3, atol=2e-4)


def test_full_width_subj_basis_roundtrip(monkeypatch):
    """Full-size SubjBasisGenerator params (12 proj layers, 768 hidden,
    3072 intermediate, CLIP vocab) through the .pt mapper + export."""
    import tests.test_subj_basis_interop as tsi
    from adaface_tpu.interop.subj_basis import (
        build_generator_from_meta,
        export_subj_basis_generator,
        map_subj_basis_generator,
    )

    monkeypatch.setattr(tsi, "INTER", 3072)
    monkeypatch.setattr(tsi, "VOCAB", 49408)
    flat = tsi.synth_fg_flat(num_layers=12, hidden=768)
    params, meta = map_subj_basis_generator(flat)
    assert meta.num_proj_layers == 12
    assert not meta.placeholder_is_bg
    exported = export_subj_basis_generator(params, placeholder_is_bg=False)
    assert set(exported) == set(flat)
    params2, meta2 = map_subj_basis_generator(exported)
    l1 = jax.tree_util.tree_leaves(params)
    l2 = jax.tree_util.tree_leaves(params2)
    assert len(l1) == len(l2)
    for a, b in zip(l1, l2):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
