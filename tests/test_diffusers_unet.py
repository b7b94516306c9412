"""Diffusers-layout UNet weight mapper (`interop/diffusers_unet.py`).

Builds a synthetic diffusers `UNet2DConditionModel` state dict — keys and
shapes enumerated independently, following the published diffusers SD
architecture (the layout the reference's Arc2Face teacher loads,
`/root/reference/ldm/models/diffusion/ddpm.py:5398-5427`) — maps it, and
checks the result against `UNetModel.init` shapes.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from adaface_tpu.interop.diffusers_unet import map_diffusers_unet_params
from adaface_tpu.models.unet import UNetConfig, UNetModel


def synth_diffusers_sd(cfg: UNetConfig, seed=0, linear_proj=False):
    """Independent enumeration of the diffusers UNet key layout + shapes."""
    rng = np.random.RandomState(seed)
    sd = {}

    def add(name, *shape):
        sd[name] = rng.randn(*shape).astype(np.float32) * 0.02

    def conv(n, cin, cout, k=3):
        add(n + ".weight", cout, cin, k, k)
        add(n + ".bias", cout)

    def lin(n, cin, cout, bias=True):
        add(n + ".weight", cout, cin)
        if bias:
            add(n + ".bias", cout)

    def norm(n, c):
        add(n + ".weight", c)
        add(n + ".bias", c)

    def resnet(n, cin, cout, temb):
        norm(n + ".norm1", cin)
        conv(n + ".conv1", cin, cout)
        lin(n + ".time_emb_proj", temb, cout)
        norm(n + ".norm2", cout)
        conv(n + ".conv2", cout, cout)
        if cin != cout:
            conv(n + ".conv_shortcut", cin, cout, k=1)

    def attention(n, c, ctx):
        norm(n + ".norm", c)
        if linear_proj:
            lin(n + ".proj_in", c, c)
            lin(n + ".proj_out", c, c)
        else:
            conv(n + ".proj_in", c, c, k=1)
            conv(n + ".proj_out", c, c, k=1)
        tb = n + ".transformer_blocks.0"
        for m in ("norm1", "norm2", "norm3"):
            norm(f"{tb}.{m}", c)
        for att, kdim in (("attn1", c), ("attn2", ctx)):
            lin(f"{tb}.{att}.to_q", c, c, bias=False)
            lin(f"{tb}.{att}.to_k", kdim, c, bias=False)
            lin(f"{tb}.{att}.to_v", kdim, c, bias=False)
            lin(f"{tb}.{att}.to_out.0", c, c)
        lin(f"{tb}.ff.net.0.proj", c, c * 8)
        lin(f"{tb}.ff.net.2", c * 4, c)

    ch0 = cfg.model_channels
    temb = ch0 * 4
    n_levels = len(cfg.channel_mult)
    conv("conv_in", cfg.in_channels, ch0)
    lin("time_embedding.linear_1", ch0, temb)
    lin("time_embedding.linear_2", temb, temb)
    norm("conv_norm_out", ch0 * cfg.channel_mult[0])
    conv("conv_out", ch0 * cfg.channel_mult[0], cfg.out_channels)

    skips = [ch0]
    ch = ch0
    for lvl, mult in enumerate(cfg.channel_mult):
        out_ch = ch0 * mult
        for j in range(cfg.num_res_blocks):
            resnet(f"down_blocks.{lvl}.resnets.{j}", ch, out_ch, temb)
            if lvl in cfg.attention_levels:
                attention(f"down_blocks.{lvl}.attentions.{j}", out_ch,
                          cfg.context_dim)
            ch = out_ch
            skips.append(ch)
        if lvl != n_levels - 1:
            conv(f"down_blocks.{lvl}.downsamplers.0.conv", ch, ch)
            skips.append(ch)

    resnet("mid_block.resnets.0", ch, ch, temb)
    attention("mid_block.attentions.0", ch, cfg.context_dim)
    resnet("mid_block.resnets.1", ch, ch, temb)

    for up_idx, lvl in enumerate(reversed(range(n_levels))):
        out_ch = ch0 * cfg.channel_mult[lvl]
        for j in range(cfg.num_res_blocks + 1):
            resnet(f"up_blocks.{up_idx}.resnets.{j}", ch + skips.pop(),
                   out_ch, temb)
            if lvl in cfg.attention_levels:
                attention(f"up_blocks.{up_idx}.attentions.{j}", out_ch,
                          cfg.context_dim)
            ch = out_ch
        if lvl != 0:
            conv(f"up_blocks.{up_idx}.upsamplers.0.conv", ch, ch)
    return sd


def tree_shapes(t):
    return jax.tree_util.tree_map(lambda x: jnp.shape(x), t)


def test_narrow_sd_mapper_roundtrip_and_forward():
    # full SD topology (the CA_LAYER_INDEX map assumes it) at 1/10 width;
    # UNetConfig.tiny() would leave two attn2 layers context-less
    cfg = UNetConfig.sd_v1(model_channels=32, context_dim=16)
    sd = synth_diffusers_sd(cfg)
    params = map_diffusers_unet_params(sd, cfg, strict=True)

    model = UNetModel(cfg)
    x = jnp.zeros((1, 16, 16, cfg.in_channels))
    t = jnp.zeros((1,), jnp.int32)
    ctx = jnp.zeros((1, 1, 8, cfg.context_dim))
    ref = model.init(jax.random.PRNGKey(0), x, t, ctx)["params"]
    assert tree_shapes(ref) == tree_shapes(params)

    eps = model.apply({"params": jax.tree_util.tree_map(jnp.asarray, params)},
                      x, t, ctx)
    assert eps.shape == x.shape
    assert np.isfinite(np.asarray(eps)).all()


def test_sd_v1_full_coverage_shapecheck():
    """Every key of a full synthetic SD-v1.5 diffusers UNet state dict is
    consumed and shape-matches `UNetConfig.sd_v1()` (VERDICT item 5)."""
    cfg = UNetConfig.sd_v1()
    sd = synth_diffusers_sd(cfg)
    params = map_diffusers_unet_params(sd, cfg, strict=True)

    model = UNetModel(cfg)
    shapes = jax.eval_shape(
        lambda k: model.init(k, jnp.zeros((1, 8, 8, 4)),
                             jnp.zeros((1,), jnp.int32),
                             jnp.zeros((1, 1, 77, cfg.context_dim))),
        jax.random.PRNGKey(0))["params"]
    assert tree_shapes(shapes) == tree_shapes(params)


def test_linear_projection_variant():
    cfg = UNetConfig.tiny()
    sd = synth_diffusers_sd(cfg, linear_proj=True)
    params = map_diffusers_unet_params(sd, cfg, strict=True)
    # Linear proj_in becomes a 1x1 conv kernel
    assert params["down_0_attn_0"]["proj_in"]["kernel"].shape[:2] == (1, 1)


def test_strict_flags_unconsumed_keys():
    cfg = UNetConfig.tiny()
    sd = synth_diffusers_sd(cfg)
    sd["down_blocks.9.resnets.0.norm1.weight"] = np.zeros(4, np.float32)
    with pytest.raises(ValueError, match="not consumed"):
        map_diffusers_unet_params(sd, cfg, strict=True)
