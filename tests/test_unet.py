"""UNet parity vs the reference torch UNetModel oracle.

Uses the FULL SD v1.5 topology (25 layers, 16 CA layers — the reference
hardcodes this geometry in its layerwise-context map) at reduced width
(model_channels 64, context_dim 96) so the test runs fast on CPU while
exercising every block type and the exact layer numbering.
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from adaface_tpu.models.unet import UNetModel, UNetConfig, CA_LAYER_INDEX, DISTILL_LAYER_INDICES
from adaface_tpu.interop.sd_unet import map_unet_params
from tests.reference_oracle import reference_available, import_reference_module

pytestmark = [pytest.mark.skipif(not reference_available(), reason="reference tree absent"), pytest.mark.slow]

CFG = UNetConfig(model_channels=64, channel_mult=(1, 2, 4, 4), num_res_blocks=2,
                 attention_levels=(0, 1, 2), num_heads=8, context_dim=96)
B, HW, T = 1, 32, 77


@pytest.fixture(scope="module")
def torch_unet():
    m = import_reference_module("ldm.modules.diffusionmodules.openaimodel")
    torch.manual_seed(0)
    unet = m.UNetModel(
        image_size=HW, in_channels=4, out_channels=4, model_channels=CFG.model_channels,
        attention_resolutions=[4, 2, 1], num_res_blocks=2, channel_mult=[1, 2, 4, 4],
        num_heads=8, use_spatial_transformer=True, transformer_depth=1,
        context_dim=CFG.context_dim, use_checkpoint=False, legacy=False,
    )
    return unet.eval()


@pytest.fixture(scope="module")
def jax_unet(torch_unet):
    sd = {k: v.numpy() for k, v in torch_unet.state_dict().items()}
    params = map_unet_params(sd, CFG, prefix="")
    return UNetModel(CFG), {"params": params}


def _extra_info(**kw):
    d = dict(use_layerwise_context=True, iter_type="normal_recon", is_training=False,
             capture_distill_attn=False, use_conv_attn_kernel_size=-1,
             placeholder2indices=None, img_mask=None,
             compel_cfg_weight_level_range=None, apply_compel_cfg_prob=0,
             empty_context=None, debug_attn=False)
    d.update(kw)
    return d


def _inputs(rng):
    x = rng.standard_normal((B, HW, HW, 4)).astype(np.float32)
    t = np.array([500], dtype=np.int64)
    ctx = rng.standard_normal((16, B, T, CFG.context_dim)).astype(np.float32)
    return x, t, ctx


def _torch_ctx(ctx):
    # ours [L, B, T, D] -> reference [B*16, T, D] with per-instance adjacency
    return torch.tensor(ctx.transpose(1, 0, 2, 3).reshape(16 * B, ctx.shape[2], ctx.shape[-1]))


def test_eps_parity_layerwise_context(torch_unet, jax_unet, rng):
    model, variables = jax_unet
    x, t, ctx = _inputs(rng)
    with torch.no_grad():
        ref = torch_unet(torch.tensor(x).permute(0, 3, 1, 2), torch.tensor(t),
                         context=_torch_ctx(ctx), extra_info=_extra_info())
    ref = ref.permute(0, 2, 3, 1).numpy()
    out = model.apply(variables, jnp.asarray(x), jnp.asarray(t), jnp.asarray(ctx))
    np.testing.assert_allclose(np.asarray(out), ref, atol=3e-4)


def test_vk_split_context(torch_unet, jax_unet, rng):
    """mix_hijk iteration: context seq dim doubled [V;K] in the reference;
    native second tensor here."""
    model, variables = jax_unet
    x, t, ctx_v = _inputs(rng)
    ctx_k = rng.standard_normal(ctx_v.shape).astype(np.float32)
    both = np.concatenate([ctx_v, ctx_k], axis=2)  # seq-dim concat per layer
    with torch.no_grad():
        ref = torch_unet(torch.tensor(x).permute(0, 3, 1, 2), torch.tensor(t),
                         context=_torch_ctx(both),
                         extra_info=_extra_info(iter_type="mix_hijk"))
    ref = ref.permute(0, 2, 3, 1).numpy()
    out = model.apply(variables, jnp.asarray(x), jnp.asarray(t),
                      jnp.asarray(ctx_v), context_k=jnp.asarray(ctx_k))
    np.testing.assert_allclose(np.asarray(out), ref, atol=3e-4)


def test_img_mask_parity(torch_unet, jax_unet, rng):
    model, variables = jax_unet
    x, t, ctx = _inputs(rng)
    mask = (rng.random((B, HW, HW, 1)) > 0.3).astype(np.float32)
    with torch.no_grad():
        ref = torch_unet(torch.tensor(x).permute(0, 3, 1, 2), torch.tensor(t),
                         context=_torch_ctx(ctx),
                         extra_info=_extra_info(img_mask=torch.tensor(mask).permute(0, 3, 1, 2)))
    ref = ref.permute(0, 2, 3, 1).numpy()
    out = model.apply(variables, jnp.asarray(x), jnp.asarray(t), jnp.asarray(ctx),
                      img_mask=jnp.asarray(mask))
    np.testing.assert_allclose(np.asarray(out), ref, atol=3e-4)


def test_capture_parity(torch_unet, jax_unet, rng):
    model, variables = jax_unet
    x, t, ctx = _inputs(rng)
    extra = _extra_info(capture_distill_attn=True)
    with torch.no_grad():
        torch_unet(torch.tensor(x).permute(0, 3, 1, 2), torch.tensor(t),
                   context=_torch_ctx(ctx), extra_info=extra)
    ref_acts = extra["ca_layers_activations"]
    out, captures = model.apply(variables, jnp.asarray(x), jnp.asarray(t),
                                jnp.asarray(ctx), capture=True)
    assert set(captures) == set(DISTILL_LAYER_INDICES)
    for li in (7, 12, 24):
        np.testing.assert_allclose(
            np.asarray(captures[li]["attn"]), ref_acts["attn"][li].numpy(), atol=1e-4)
        np.testing.assert_allclose(
            np.asarray(captures[li]["q"]), ref_acts["q"][li].numpy(), atol=1e-4)
        np.testing.assert_allclose(
            np.asarray(captures[li]["outfeat"]),
            ref_acts["outfeat"][li].permute(0, 2, 3, 1).numpy(), atol=3e-4)


def test_ca_layer_map_matches_reference():
    """The 16-entry layer map is load-bearing; pin it."""
    assert CA_LAYER_INDEX == {1: 0, 2: 1, 4: 2, 5: 3, 7: 4, 8: 5, 12: 6, 16: 7,
                              17: 8, 18: 9, 19: 10, 20: 11, 21: 12, 22: 13,
                              23: 14, 24: 15}


def test_conv_attention():
    """Subject rows of the attention scores are replaced by grouped-conv
    scores (`ldm/util.py:701-882`)."""
    import jax
    import jax.numpy as jnp

    from adaface_tpu.ops.attention import apply_conv_attn, conv_attn_scores

    rng = np.random.default_rng(0)
    B, h, Hh, W, d, T, ks = 2, 4, 8, 8, 16, 16, 2
    N = Hh * W
    q = jnp.asarray(rng.standard_normal((B, h, N, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, h, T, d)), jnp.float32)
    slot = np.full((B, T), -1, np.int32)
    slot[0, 3:3 + 9] = np.arange(9)  # 9 vectors, only first ks^2=4 used
    slot[1, 5:5 + 9] = np.arange(9)
    sim = jnp.asarray(rng.standard_normal((B, h, N, T)), jnp.float32)
    scale = d ** -0.5

    out = apply_conv_attn(sim, q, k, jnp.asarray(slot), (Hh, W), ks, scale)
    # non-subject rows untouched
    np.testing.assert_array_equal(np.asarray(out[0, :, :, 0]),
                                  np.asarray(sim[0, :, :, 0]))
    np.testing.assert_array_equal(np.asarray(out[0, :, :, 8]),
                                  np.asarray(sim[0, :, :, 8]))  # slot 5 >= ks^2
    # subject rows replaced
    assert np.abs(np.asarray(out[0, :, :, 3])
                  - np.asarray(sim[0, :, :, 3])).max() > 1e-6

    # center map equals the direct grouped correlation at interior pixels
    maps = conv_attn_scores(q, k, jnp.asarray(slot), (Hh, W), ks, scale)
    assert maps.shape == (4, B, h, N)
    # hand-compute score at pixel (2,2) head 0 batch 0 for the (0,0) tap:
    # conv with ks=2 pads (0,1),(0,1): out[y,x] = sum_{dy,dx} k[dy*2+dx]·q[y+dy,x+dx]
    qg = np.asarray(q[0, 0]).reshape(Hh, W, d)
    kvecs = [np.asarray(k[0, 0, 3 + m]) for m in range(4)]
    expect = sum(kvecs[dy * 2 + dx] @ qg[2 + dy, 2 + dx]
                 for dy in (0, 1) for dx in (0, 1)) * scale / ks ** 1.5
    got = np.asarray(maps[0, 0, 0]).reshape(Hh, W)[2, 2]
    np.testing.assert_allclose(got, expect, rtol=1e-4)

    # ks=1 is a no-op
    same = apply_conv_attn(sim, q, k, jnp.asarray(slot), (Hh, W), 1, scale)
    np.testing.assert_array_equal(np.asarray(same), np.asarray(sim))


def test_unet_conv_attn_forward():
    import jax
    import jax.numpy as jnp

    from adaface_tpu.models.unet import UNetConfig, UNetModel

    cfg = UNetConfig(model_channels=32, channel_mult=(1, 2), num_res_blocks=1,
                     attention_levels=(0, 1), num_heads=4, context_dim=16,
                     use_flash_attention=False, conv_attn_kernel_size=2)
    model = UNetModel(cfg)
    rng = np.random.default_rng(1)
    B, HW, T = 1, 8, 12
    x = jnp.asarray(rng.standard_normal((B, HW, HW, 4)), jnp.float32)
    t = jnp.zeros((B,), jnp.int32)
    ctx = jnp.asarray(rng.standard_normal((1, B, T, 16)), jnp.float32)
    slot = np.full((B, T), -1, np.int32)
    slot[:, 3:7] = np.arange(4)
    params = model.init(jax.random.PRNGKey(0), x, t, ctx)["params"]
    out_conv, aux_c = model.apply({"params": params}, x, t, ctx,
                                  subj_slot_map=jnp.asarray(slot),
                                  capture=True)
    out_plain, aux_p = model.apply({"params": params}, x, t, ctx, capture=True)
    assert np.isfinite(np.asarray(out_conv)).all()
    # (at init the spatial transformers are zero-initialized no-ops, so
    # compare the captured attention scores, not eps)
    layer = sorted(aux_c)[0]
    sc = np.asarray(aux_c[layer]["attnscore"])
    sp = np.asarray(aux_p[layer]["attnscore"])
    # subject rows replaced, non-subject rows identical
    assert np.abs(sc[..., 3] - sp[..., 3]).max() > 1e-7
    np.testing.assert_array_equal(sc[..., 0], sp[..., 0])


def test_cross_kv_cache_parity(rng):
    """precompute_cross_kv + cross_kv= must be numerically IDENTICAL to the
    in-loop to_k/to_v Dense projections (same GEMMs, hoisted)."""
    from adaface_tpu.models.unet import ca_layer_module_names, precompute_cross_kv

    model = UNetModel(CFG)
    x = jnp.asarray(rng.standard_normal((B, HW, HW, 4)), jnp.float32)
    t = jnp.array([321] * B, jnp.int32)
    ctx = jnp.asarray(rng.standard_normal((16, B, T, CFG.context_dim)),
                      jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x, t, ctx)["params"]

    names = ca_layer_module_names(CFG)
    assert sorted(names) == sorted(
        [1, 2, 4, 5, 7, 8, 12, 16, 17, 18, 19, 20, 21, 22, 23, 24])
    assert all(n in params for n in names.values())

    kvs = precompute_cross_kv(params, CFG, ctx, dtype=jnp.float32)
    assert len(kvs) == 16 and all(kv is not None for kv in kvs)
    base = model.apply({"params": params}, x, t, ctx)
    cached = model.apply({"params": params}, x, t, ctx, cross_kv=kvs)
    np.testing.assert_array_equal(np.asarray(base), np.asarray(cached))

    # separate K-context (mix_hijk compositional path)
    ctx_k = jnp.asarray(rng.standard_normal(ctx.shape), jnp.float32)
    kvs2 = precompute_cross_kv(params, CFG, ctx, ctx_k, dtype=jnp.float32)
    base2 = model.apply({"params": params}, x, t, ctx, context_k=ctx_k)
    cached2 = model.apply({"params": params}, x, t, ctx, context_k=ctx_k,
                          cross_kv=kvs2)
    np.testing.assert_array_equal(np.asarray(base2), np.asarray(cached2))
