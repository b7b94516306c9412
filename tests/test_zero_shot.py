"""End-to-end zero-shot path: images -> masked CLIP features + face embs ->
Arc2Face forward -> SubjBasisGenerator -> patched prompt embeddings.

Mirrors the dataflow of SURVEY.md §3.4 on tiny configs.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from adaface_tpu.data.tokenizer import HashTokenizer
from adaface_tpu.models.clip_text import CLIPTextConfig, CLIPTextEncoder
from adaface_tpu.models.clip_vision import CLIPVisionConfig, CLIPVisionEncoder
from adaface_tpu.personalization.arc2face import (
    FORWARD_TEMPLATE,
    INVERSE_TEMPLATE,
)
from adaface_tpu.personalization.embedding_manager import (
    NUM_CA_LAYERS,
    EmbeddingManager,
)
from adaface_tpu.personalization.subj_basis_generator import SubjBasisGenerator
from adaface_tpu.personalization.zero_shot import (
    ZeroShotFeatureExtractor,
    ZeroShotFeatures,
)

# oracle-parity / integration battery: minutes of compile; run with -m slow
pytestmark = pytest.mark.slow

T, D = 32, 64


@pytest.fixture(scope="module")
def stack():
    tok = HashTokenizer()
    tok.max_length = T
    vis_cfg = CLIPVisionConfig.tiny(hidden_size=48)
    vision = CLIPVisionEncoder(vis_cfg)
    vparams = vision.init(jax.random.PRNGKey(0),
                          jnp.zeros((1, 28, 28, 3)))["params"]

    txt_cfg = CLIPTextConfig.tiny(vocab_size=512, hidden_size=D, num_layers=2,
                                  max_position_embeddings=T)
    arc_enc = CLIPTextEncoder(txt_cfg)
    arc_params = arc_enc.init(jax.random.PRNGKey(1),
                              input_ids=jnp.zeros((1, T), jnp.int32))["params"]

    gen = SubjBasisGenerator(placeholder_is_bg=False, num_out_layers=NUM_CA_LAYERS,
                             num_out_embs_per_layer=16, output_dim=D,
                             proj_cfg=txt_cfg, pad_token_id=tok.eos_id)
    inv_ids = jnp.asarray(tok([INVERSE_TEMPLATE], max_length=T))
    gparams = gen.init(jax.random.PRNGKey(2), None, None,
                       jnp.zeros((1, 16, D)),
                       inverse_template_ids=inv_ids)["params"]

    bg_gen = SubjBasisGenerator(placeholder_is_bg=True, num_out_layers=NUM_CA_LAYERS,
                                num_out_embs_per_layer=4, output_dim=D,
                                image_embedding_dim=48, num_heads=4,
                                bg_num_id_vecs=vis_cfg.num_tokens)
    bg_params = bg_gen.init(jax.random.PRNGKey(3),
                            jnp.zeros((1, vis_cfg.num_tokens, 48)),
                            None, None)["params"]
    return tok, vision, vparams, arc_enc, arc_params, gen, gparams, bg_gen, bg_params, inv_ids


def test_feature_extractor(stack):
    tok, vision, vparams, *_ = stack
    rng = np.random.default_rng(0)
    imgs = [rng.integers(0, 255, (40, 32, 3), dtype=np.uint8) for _ in range(3)]
    masks = [np.ones((40, 32), np.float32) * (i % 2) for i in range(3)]
    face_calls = []

    def face_fn(img):
        face_calls.append(img.shape)
        if len(face_calls) == 2:
            return None  # second image: no face -> random fallback
        return np.ones(512, np.float32)

    ex = ZeroShotFeatureExtractor(vision, vparams, face_embed_fn=face_fn)
    feats = ex.encode(imgs, masks, is_face=True, calc_avg=True)
    assert feats.clip_fg.shape == (1, vision.cfg.num_tokens, 48)
    assert feats.clip_bg.shape == (1, vision.cfg.num_tokens, 48)
    assert feats.clip_features.shape == (1, 2 * vision.cfg.num_tokens, 48)
    assert feats.id_embs.shape == (1, 512)
    assert feats.faceless_img_count == 1
    np.testing.assert_allclose(
        float(jnp.linalg.norm(feats.id_embs)), 1.0, rtol=1e-5)


def test_zero_shot_embedding_manager_path(stack):
    (tok, vision, vparams, arc_enc, arc_params, gen, gparams,
     bg_gen, bg_params, inv_ids) = stack
    mgr = EmbeddingManager()
    z_id = tok.add_placeholder("z")
    y_id = tok.add_placeholder("y")
    mgr.add_zero_shot_placeholder("z", z_id, gen, gparams, num_vectors=16)
    mgr.add_zero_shot_placeholder("y", y_id, bg_gen, bg_params, num_vectors=4,
                                  is_background=True)
    mgr.arc2face_encoder = (arc_enc, arc_params)

    B = 2
    rng = np.random.default_rng(1)
    n_tok = vision.cfg.num_tokens
    features = ZeroShotFeatures(
        clip_fg=jnp.asarray(rng.standard_normal((B, n_tok, 48)), jnp.float32),
        clip_bg=jnp.asarray(rng.standard_normal((B, n_tok, 48)), jnp.float32),
        id_embs=jnp.asarray(rng.standard_normal((B, 50)), jnp.float32),
    )
    fwd_ids = jnp.asarray(tok([FORWARD_TEMPLATE], max_length=T))
    arc_tid = int(tok.encode("id")[0])
    embs, inv = mgr.compute_zero_shot_embeddings(
        features, inv_ids, forward_template_ids=fwd_ids,
        arcface_token_id=arc_tid, is_face=True)
    assert embs["z"].shape == (NUM_CA_LAYERS, B, 16, D)
    assert embs["y"].shape == (NUM_CA_LAYERS, B, 4, D)
    assert inv.shape == (B, T, D)

    # patch into a prompt batch
    prompt = "a photo of a z , , , , person with background y , , ,"
    ids = tok([prompt] * B, max_length=T)
    slot_maps = mgr.build_slot_maps(ids)
    embedded = jnp.asarray(rng.standard_normal((B, T, D)), jnp.float32)
    out = EmbeddingManager.patch_prompt_embeddings(embedded, slot_maps, embs)
    assert out.shape == (NUM_CA_LAYERS, B, T, D)
    zpos = int(np.nonzero(ids[0] == z_id)[0][0])
    np.testing.assert_allclose(np.asarray(out[3, 1, zpos]),
                               np.asarray(embs["z"][3, 1, 0]), atol=1e-6)
    np.testing.assert_allclose(np.asarray(out[3, 1, zpos + 5]),
                               np.asarray(embs["z"][3, 1, 5]), atol=1e-6)
    # non-slot positions untouched
    np.testing.assert_array_equal(np.asarray(out[0, 0, 0]),
                                  np.asarray(embedded[0, 0]))


def test_pipeline_zero_shot_generation(stack):
    """End-to-end txt2img with zero-shot conditioning (tiny configs)."""
    import jax

    from adaface_tpu.models.unet import UNetConfig
    from adaface_tpu.models.vae import VAEConfig
    from adaface_tpu.pipeline import StableDiffusionPipeline
    from adaface_tpu.models.clip_text import CLIPTextConfig

    (tok, vision, vparams, _arc_enc32, _arc_params32, _gen32, _gparams32,
     bg_gen, bg_params, _inv32) = stack
    # the fixture's generator is built for 32-token templates; this test
    # runs the 77-token pipeline, so build 77-position components
    txt77 = CLIPTextConfig.tiny(vocab_size=512, hidden_size=D, num_layers=2,
                                max_position_embeddings=77)
    arc_enc = CLIPTextEncoder(txt77)
    arc_params = arc_enc.init(jax.random.PRNGKey(11),
                              input_ids=jnp.zeros((1, 77), jnp.int32))["params"]
    gen = SubjBasisGenerator(placeholder_is_bg=False,
                             num_out_layers=NUM_CA_LAYERS,
                             num_out_embs_per_layer=16, output_dim=D,
                             proj_cfg=txt77, pad_token_id=tok.eos_id)
    inv77_init = jnp.asarray(tok([INVERSE_TEMPLATE], max_length=77))
    gparams = gen.init(jax.random.PRNGKey(12), None, None,
                       jnp.zeros((1, 16, D)),
                       inverse_template_ids=inv77_init)["params"]
    clip_cfg = CLIPTextConfig.tiny(vocab_size=tok.vocab_size, hidden_size=D,
                                   num_layers=2, max_position_embeddings=77,
                                   num_extra_tokens=4)
    unet_cfg = UNetConfig(model_channels=32, channel_mult=(1, 2),
                          num_res_blocks=1, attention_levels=(0, 1),
                          num_heads=4, context_dim=D,
                          use_flash_attention=False)
    tok.max_length = 77
    pipe = StableDiffusionPipeline.from_random(
        jax.random.PRNGKey(0), tok, unet_cfg=unet_cfg,
        vae_cfg=VAEConfig.tiny(), clip_cfg=clip_cfg)

    mgr = pipe.embedding_manager
    z_id = tok.add_placeholder("z")
    mgr.add_zero_shot_placeholder("z", z_id, gen, gparams, num_vectors=16)
    mgr.arc2face_encoder = (arc_enc, arc_params)

    rng = np.random.default_rng(3)
    n_tok = vision.cfg.num_tokens
    feats = ZeroShotFeatures(
        clip_fg=jnp.asarray(rng.standard_normal((1, n_tok, 48)), jnp.float32),
        clip_bg=jnp.asarray(rng.standard_normal((1, n_tok, 48)), jnp.float32),
        id_embs=jnp.asarray(rng.standard_normal((1, 50)), jnp.float32),
    )
    from adaface_tpu.personalization.arc2face import FORWARD_TEMPLATE
    # templates must be 77 long for this pipeline's CLIP
    fwd77 = jnp.asarray(tok([FORWARD_TEMPLATE], max_length=77))
    inv77 = jnp.asarray(tok([INVERSE_TEMPLATE], max_length=77))
    pipe.set_zero_shot_features(feats, fwd77, inv77,
                                int(tok.encode("id")[0]))
    prompt = "a photo of a z " + ", " * 15 + "person"
    imgs = pipe.generate([prompt] * 2, num_steps=2, height=32, width=32,
                         guidance_scale=5.0)
    assert imgs.shape[0] == 2 and imgs.dtype == np.uint8
    ctx1 = pipe.encode_prompts([prompt] * 2)
    # different identity -> different conditioning (pixel comparison is
    # meaningless with a saturating random VAE)
    feats2 = ZeroShotFeatures(feats.clip_fg, feats.clip_bg,
                              jnp.asarray(rng.standard_normal((1, 50)),
                                          jnp.float32))
    pipe.set_zero_shot_features(feats2, fwd77, inv77,
                                int(tok.encode("id")[0]))
    ctx2 = pipe.encode_prompts([prompt] * 2)
    assert float(jnp.abs(ctx1 - ctx2).max()) > 1e-3

    # arc2face evaluation modes (`ddpm.py:1004-1030`): precomputed forward /
    # inverse contexts drive the UNet via generate(context=...)
    from adaface_tpu.personalization.arc2face import forward_face_embs

    full_embs, _ = forward_face_embs(arc_enc, arc_params, feats.id_embs,
                                     fwd77, int(tok.encode("id")[0]))
    imgs_f = pipe.generate([prompt] * 2, num_steps=2, height=32, width=32,
                           guidance_scale=5.0, context=full_embs[None, :1])
    assert imgs_f.shape[0] == 2 and imgs_f.dtype == np.uint8
    _, inv_embs = mgr.compute_zero_shot_embeddings(
        feats2, inv77, forward_template_ids=fwd77,
        arcface_token_id=int(tok.encode("id")[0]), inf_emb_type="full_pad")
    imgs_i = pipe.generate([prompt] * 2, num_steps=2, height=32, width=32,
                           guidance_scale=5.0, context=inv_embs[None, :1])
    assert imgs_i.shape[0] == 2 and imgs_i.dtype == np.uint8


def test_zero_shot_recon_train_step(stack):
    """The SubjBasisGenerator learns from the recon gradient."""
    import optax

    from adaface_tpu.models.unet import UNetConfig, UNetModel
    from adaface_tpu.ops.schedule import make_diffusion_schedule
    from adaface_tpu.training.train_step import (
        ZeroShotReconBatch,
        make_zero_shot_recon_step,
    )
    from adaface_tpu.models.clip_text import CLIPTextConfig, CLIPTextEncoder
    from adaface_tpu.personalization.subj_basis_generator import SubjBasisGenerator
    from adaface_tpu.personalization.embedding_manager import NUM_CA_LAYERS

    tok = HashTokenizer()
    tok.max_length = T
    txt_cfg = CLIPTextConfig.tiny(vocab_size=512, hidden_size=D, num_layers=2,
                                  max_position_embeddings=T, num_extra_tokens=2)
    sd_clip = CLIPTextEncoder(txt_cfg)
    sd_clip_params = sd_clip.init(jax.random.PRNGKey(0),
                                  input_ids=jnp.zeros((1, T), jnp.int32))["params"]
    arc_enc = CLIPTextEncoder(CLIPTextConfig.tiny(
        vocab_size=512, hidden_size=D, num_layers=2, max_position_embeddings=T))
    arc_params = arc_enc.init(jax.random.PRNGKey(1),
                              input_ids=jnp.zeros((1, T), jnp.int32))["params"]
    gen = SubjBasisGenerator(placeholder_is_bg=False, num_out_layers=NUM_CA_LAYERS,
                             num_out_embs_per_layer=16, output_dim=D,
                             proj_cfg=CLIPTextConfig.tiny(
                                 vocab_size=512, hidden_size=D, num_layers=2,
                                 max_position_embeddings=T),
                             pad_token_id=tok.eos_id)
    inv_ids = jnp.asarray(tok([INVERSE_TEMPLATE], max_length=T))
    fwd_ids = jnp.asarray(tok([FORWARD_TEMPLATE], max_length=T))
    gparams = gen.init(jax.random.PRNGKey(2), None, None,
                       jnp.zeros((1, 16, D)),
                       inverse_template_ids=inv_ids)["params"]
    unet_cfg = UNetConfig(model_channels=32, channel_mult=(1, 2),
                          num_res_blocks=1, attention_levels=(0, 1),
                          num_heads=4, context_dim=D, use_flash_attention=False)
    unet = UNetModel(unet_cfg)
    HW = 8
    unet_params = unet.init(jax.random.PRNGKey(3), jnp.zeros((1, HW, HW, 4)),
                            jnp.zeros((1,), jnp.int32),
                            jnp.zeros((1, 1, T, D)))["params"]
    sched = make_diffusion_schedule()
    opt = optax.adamw(1e-3)
    trainable = {"z": gparams}
    step = make_zero_shot_recon_step(
        sd_clip, sd_clip_params, unet, unet_params, sched, opt,
        generators={"z": gen}, bg_placeholders=frozenset(),
        arc2face_encoder=arc_enc, arc2face_params=arc_params,
        forward_template_ids=fwd_ids, inverse_template_ids=inv_ids,
        arcface_token_id=int(tok.encode("id")[0]))

    rng = np.random.default_rng(9)
    B = 2
    ids = rng.integers(1, 500, (B, T)).astype(np.int32)
    ids[:, 3] = 512
    slot = np.full((B, T), -1, np.int32)
    for k in range(8):
        slot[:, 3 + k] = k
    batch = ZeroShotReconBatch(
        latents=jnp.asarray(rng.standard_normal((B, HW, HW, 4)), jnp.float32),
        token_ids=jnp.asarray(ids), slot_maps={"z": jnp.asarray(slot)},
        fg_mask=None,
        timesteps=jnp.asarray(rng.integers(0, 1000, B), jnp.int32),
        noise=jnp.asarray(rng.standard_normal((B, HW, HW, 4)), jnp.float32),
        clip_fg=jnp.asarray(rng.standard_normal((B, 5, 48)), jnp.float32),
        clip_bg=jnp.asarray(rng.standard_normal((B, 5, 48)), jnp.float32),
        id_embs=jnp.asarray(rng.standard_normal((B, 50)), jnp.float32))
    new_params, _, m = jax.jit(step)(trainable, opt.init(trainable), batch)
    assert np.isfinite(float(m["loss"]))
    leaves0 = jax.tree_util.tree_leaves(trainable)
    leaves1 = jax.tree_util.tree_leaves(new_params)
    moved = max(float(jnp.abs(a - b).max()) for a, b in zip(leaves0, leaves1))
    assert moved > 0
    # the frozen prompt2token_proj moves more slowly (grad scale 0.4) but moves
    d_hslw = float(jnp.abs(new_params["z"]["hidden_state_layer_weights"]
                           - trainable["z"]["hidden_state_layer_weights"]).max())
    assert d_hslw > 0


def test_zero_shot_compos_step():
    """Zero-shot compositional distillation: generator-trained 4-type batch
    with frozen-copy blend on the subj-single block."""
    import optax

    from adaface_tpu.models.unet import UNetConfig, UNetModel
    from adaface_tpu.ops.schedule import make_diffusion_schedule
    from adaface_tpu.training.train_step import (
        ZeroShotComposBatch,
        make_zero_shot_compos_step,
    )

    tok = HashTokenizer()
    tok.max_length = T
    txt_cfg = CLIPTextConfig.tiny(vocab_size=512, hidden_size=D, num_layers=2,
                                  max_position_embeddings=T, num_extra_tokens=2)
    sd_clip = CLIPTextEncoder(txt_cfg)
    sd_clip_params = sd_clip.init(jax.random.PRNGKey(0),
                                  input_ids=jnp.zeros((1, T), jnp.int32))["params"]
    arc_enc = CLIPTextEncoder(CLIPTextConfig.tiny(
        vocab_size=512, hidden_size=D, num_layers=2, max_position_embeddings=T))
    arc_params = arc_enc.init(jax.random.PRNGKey(1),
                              input_ids=jnp.zeros((1, T), jnp.int32))["params"]
    gen = SubjBasisGenerator(placeholder_is_bg=False,
                             num_out_layers=NUM_CA_LAYERS,
                             num_out_embs_per_layer=16, output_dim=D,
                             proj_cfg=CLIPTextConfig.tiny(
                                 vocab_size=512, hidden_size=D, num_layers=2,
                                 max_position_embeddings=T),
                             pad_token_id=tok.eos_id)
    inv_ids = jnp.asarray(tok([INVERSE_TEMPLATE], max_length=T))
    fwd_ids = jnp.asarray(tok([FORWARD_TEMPLATE], max_length=T))
    gparams = gen.init(jax.random.PRNGKey(2), None, None,
                       jnp.zeros((1, 16, D)),
                       inverse_template_ids=inv_ids)["params"]
    unet_cfg = UNetConfig(model_channels=32, channel_mult=(1, 2),
                          num_res_blocks=1, attention_levels=(0, 1),
                          num_heads=4, context_dim=D, use_flash_attention=False)
    unet = UNetModel(unet_cfg)
    HW = 8
    unet_params = unet.init(jax.random.PRNGKey(3), jnp.zeros((1, HW, HW, 4)),
                            jnp.zeros((1,), jnp.int32),
                            jnp.zeros((1, 1, T, D)))["params"]
    sched = make_diffusion_schedule()
    opt = optax.adamw(1e-3)
    trainable = {"z": gparams}
    gen0 = jax.tree_util.tree_map(jnp.asarray, trainable)
    step = make_zero_shot_compos_step(
        sd_clip, sd_clip_params, unet, unet_params, sched, opt,
        generators={"z": gen}, bg_placeholders=frozenset(),
        arc2face_encoder=arc_enc, arc2face_params=arc_params,
        forward_template_ids=fwd_ids, inverse_template_ids=inv_ids,
        arcface_token_id=int(tok.encode("id")[0]))

    rng = np.random.default_rng(11)
    # 4-type rows: subject rows carry the placeholder; class rows don't
    ids = rng.integers(1, 500, (4, T)).astype(np.int32)
    ids[:2, 3] = 512
    slot = np.full((4, T), -1, np.int32)
    for k in range(8):
        slot[:2, 3 + k] = k
    t = rng.integers(800, 1000, 1)
    batch = ZeroShotComposBatch(
        token_ids=jnp.asarray(ids), slot_maps={"z": jnp.asarray(slot)},
        subj_slot_map=jnp.asarray(slot),
        latents=jnp.asarray(rng.standard_normal((1, HW, HW, 4)), jnp.float32),
        fg_mask=jnp.asarray((rng.random((1, HW, HW, 1)) > 0.5), jnp.float32),
        timesteps=jnp.asarray(t, jnp.int32),
        noise=jnp.asarray(rng.standard_normal((1, HW, HW, 4)), jnp.float32),
        t_frac=jnp.asarray(t / 1000.0, jnp.float32),
        training_percent=jnp.asarray(0.3, jnp.float32),
        clip_fg=jnp.asarray(rng.standard_normal((1, 5, 48)), jnp.float32),
        clip_bg=jnp.asarray(rng.standard_normal((1, 5, 48)), jnp.float32),
        id_embs=jnp.asarray(rng.standard_normal((1, 50)), jnp.float32))
    fz = {"clip": sd_clip_params, "unet": unet_params, "arc": arc_params,
          "gen0": gen0}
    new_params, _, m = jax.jit(step)(trainable, opt.init(trainable), batch, fz)
    for k, v in m.items():
        assert np.isfinite(float(v)), (k, v)
    leaves0 = jax.tree_util.tree_leaves(trainable)
    leaves1 = jax.tree_util.tree_leaves(new_params)
    assert all(np.isfinite(np.asarray(x)).all() for x in leaves1)
    moved = max(float(jnp.abs(a - b).max()) for a, b in zip(leaves0, leaves1))
    assert moved > 0

    # regression (VERDICT r1): step() with the DEFAULT frozen dict must not
    # KeyError on 'gen0' — it snapshots the current generator as the anchor
    _, _, m_def = jax.jit(step)(trainable, opt.init(trainable), batch)
    assert np.isfinite(float(m_def["loss"]))
    # and an explicit frozen dict missing 'gen0' fails loudly
    import pytest

    with pytest.raises(KeyError, match="gen0"):
        step(trainable, opt.init(trainable), batch,
             {"clip": sd_clip_params, "unet": unet_params, "arc": arc_params})
