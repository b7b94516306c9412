"""Recon-iteration complementary-loss battery + compositional x_start
modes + compos embedding noise (`calc_recon_and_complem_losses`,
`ddpm.py:3457-3565`; `init_x_with_fg_from_training_image`,
`ldm/util.py:2403-2457`)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from adaface_tpu.data.personalized import PersonalizedDataset, SubjectSpec
from adaface_tpu.data.tokenizer import HashTokenizer
from adaface_tpu.models.clip_text import CLIPTextConfig, CLIPTextEncoder
from adaface_tpu.models.unet import UNetConfig
from adaface_tpu.models.vae import VAEConfig
from adaface_tpu.pipeline import StableDiffusionPipeline
from adaface_tpu.personalization.embedding_manager import EmbeddingManager
from adaface_tpu.personalization.static_embedding import (
    compute_static_embedding,
)
from adaface_tpu.training.iter_plan import (
    COMPOS_DISTILL,
    IterPlanConfig,
    plan_iteration,
)
from adaface_tpu.training.train_step import _recon_complem_terms
from adaface_tpu.training.trainer import Trainer, TrainerConfig
from adaface_tpu.training.x_init import init_x_with_fg_from_training_image

pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def subject_dir(tmp_path_factory):
    from PIL import Image

    d = tmp_path_factory.mktemp("subj")
    rng = np.random.default_rng(0)
    for i in range(3):
        Image.fromarray(rng.integers(0, 255, (48, 48, 3)).astype(np.uint8)
                        ).save(d / f"{i}.jpg")
        m = np.zeros((48, 48), np.uint8)
        m[12:36, 12:36] = 255
        Image.fromarray(m).save(d / f"{i}_mask.png")
    return str(d)


def _build(subject_dir, logdir, max_steps=4, **plan_kw):
    tok = HashTokenizer()
    pipe = StableDiffusionPipeline.from_random(
        jax.random.PRNGKey(0), tok,
        clip_cfg=CLIPTextConfig.tiny(vocab_size=tok.vocab_size,
                                     max_position_embeddings=77,
                                     num_extra_tokens=8),
        unet_cfg=UNetConfig(model_channels=32, channel_mult=(1, 2),
                            num_res_blocks=1, attention_levels=(0, 1),
                            num_heads=4, context_dim=64,
                            use_flash_attention=False),
        vae_cfg=VAEConfig.tiny())
    mgr = pipe.embedding_manager
    mgr.add_placeholder("z", token_id=tok.add_placeholder("z"),
                        num_vectors=9, init_key=jax.random.PRNGKey(1),
                        emb_dim=64)
    mgr.add_placeholder("y", token_id=tok.add_placeholder("y"),
                        num_vectors=4, is_background=True,
                        init_key=jax.random.PRNGKey(2), emb_dim=64)
    ds = PersonalizedDataset([SubjectSpec("s", subject_dir)], size=32, seed=0)
    cfg = TrainerConfig(max_steps=max_steps, batch_size=2,
                        use_prodigy=True, ckpt_every_steps=100,
                        log_every_steps=100, seed=0, logdir=logdir)
    plan_kw.setdefault("composition_regs_iter_gap", 3)
    return Trainer(pipe, ds, cfg,
                   IterPlanConfig(max_steps=max_steps, **plan_kw))


def test_bg_embedder_gets_complem_gradient(subject_dir, tmp_path):
    """The complementary battery's gradient must reach the BG embedder
    through the captured attention scores — the reference's bg-token
    training signal (`calc_fg_bg_complementary_loss`, `ddpm.py:4039-4253`)."""
    tr = _build(subject_dir, str(tmp_path / "run"))
    p = tr.pipe
    # multi-vector placeholders are comma-padded by the data pipeline
    # (`personalized.py:888-893`) so the z (K=9) and y (K=4) slot spans
    # never overlap
    prompt = "a z , , , , , , , , with background y , , ,"
    ids = p.tokenizer([prompt, prompt])
    slots = {k: jnp.asarray(v)
             for k, v in tr.mgr.build_slot_maps(ids).items()}
    fg = np.zeros((2, 8, 8, 1), np.float32)
    fg[:, 2:6, 2:6] = 1.0
    fg_mask = jnp.asarray(fg)
    x = jnp.asarray(np.random.default_rng(0).standard_normal((2, 8, 8, 4)),
                    jnp.float32)
    t = jnp.asarray([400, 500], jnp.int32)
    ids_j = jnp.asarray(ids)

    def complem_only(embedders):
        embedded = p.clip.apply({"params": p.clip_params}, ids_j,
                                method=CLIPTextEncoder.embed_tokens)
        subj = {s: compute_static_embedding(e) for s, e in embedders.items()}
        patched = EmbeddingManager.patch_prompt_embeddings(
            embedded, slots, subj)
        L, B, T, D = patched.shape
        ctx = p.clip.apply({"params": p.clip_params},
                           input_embeds=patched.reshape(L * B, T, D),
                           skip_weights=jnp.asarray(p.skip_weights))
        ctx = ctx.reshape(L, B, T, D)
        _, aux = p.unet.apply({"params": p.unet_params}, x, t, ctx,
                              capture=True)
        loss, metrics = _recon_complem_terms(
            aux, slots, fg_mask, frozenset({"y"}), True, True,
            complem_weight=2e-4, xlayer_weight=5e-5)
        return loss, metrics

    (loss, metrics), grads = jax.value_and_grad(
        complem_only, has_aux=True)(tr.mgr.embedders)
    assert np.isfinite(float(loss))
    for key in ("fg_bg_complem", "subj_mb_suppress", "bg_mf_suppress",
                "fg_bg_mask_contrast", "fg_xlayer_consist",
                "bg_xlayer_consist"):
        assert key in metrics and np.isfinite(float(metrics[key])), key
    g_bg = jax.tree_util.tree_leaves(grads["y"])
    assert max(float(jnp.abs(g).max()) for g in g_bg) > 0.0
    g_subj = jax.tree_util.tree_leaves(grads["z"])
    assert max(float(jnp.abs(g).max()) for g in g_subj) > 0.0


def test_run_recon_emits_complem_metrics(subject_dir, tmp_path):
    tr = _build(subject_dir, str(tmp_path / "run"))
    plan = plan_iteration(tr.rng, 1, tr.plan_cfg)  # step 1: recon iter
    plan.use_background_token = True
    metrics = tr._run_recon(plan)
    assert "fg_bg_complem" in metrics
    assert "fg_xlayer_consist" in metrics
    assert np.isfinite(float(metrics["loss"]))


def test_x_init_fg_from_training_image():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((1, 16, 16, 4)).astype(np.float32)
    fg = np.zeros((1, 16, 16, 1), np.float32)
    fg[:, 4:12, 4:12] = 1.0  # 25% coverage -> the >10% branch
    x_new, fg_new = init_x_with_fg_from_training_image(
        rng, x, fg, training_percent=0.0)
    assert x_new.shape == x.shape and fg_new.shape == fg.shape
    # fg shrank (scale < 1 almost surely under the >10% branch)
    assert 0 < fg_new.sum() <= fg.sum()
    # background is fresh noise, uncorrelated with the original latent
    bg = (fg_new[..., 0] == 0)
    corr = np.corrcoef(x_new[..., 0][bg], x[..., 0][bg])[0, 1]
    assert abs(corr) < 0.5
    # fg content correlates with a scaled copy of the original (noise
    # fraction <= ~0.5 at training_percent=0)
    assert np.isfinite(x_new).all()


def test_compos_x_start_modes_and_emb_noise(subject_dir, tmp_path):
    """Compositional iterations cover all three x_start modes (fg-init,
    pure noise, reuse-init) and thread the sampled embedding-noise std."""
    tr = _build(subject_dir, str(tmp_path / "run"),
                emb_noise_prob={COMPOS_DISTILL: 1.0})
    # fg-init mode
    plan = plan_iteration(tr.rng, 0, tr.plan_cfg)
    assert plan.iter_type == COMPOS_DISTILL
    plan.comp_init_fg_from_training_image = True
    assert plan.emb_noise_std > 0  # p=1.0 -> always sampled
    m1 = tr._run_compos(plan)
    assert np.isfinite(float(m1["loss"]))
    # pure-noise mode
    plan2 = plan_iteration(tr.rng, 0, tr.plan_cfg)
    plan2.comp_init_fg_from_training_image = False
    m2 = tr._run_compos(plan2)
    assert np.isfinite(float(m2["loss"]))
    # reuse-init mode: seed the cache with a fake reconstruction
    from adaface_tpu.training.teacher_filter import CachedInits

    tr.cached_inits = CachedInits()
    subj = tr.dataset.subjects[0].name
    tr.cached_inits.put(subj, np.zeros((1, 8, 8, 4), np.float32),
                        np.asarray([700]),
                        fg_mask=np.ones((1, 8, 8, 1), np.float32),
                        comp_init_fg_from_training_image=True)
    plan3 = plan_iteration(tr.rng, 0, tr.plan_cfg)
    m3 = tr._run_compos(plan3)
    assert plan3.reuse_init_conds
    assert plan3.comp_init_fg_from_training_image
    assert subj not in tr.cached_inits  # consumed
    assert np.isfinite(float(m3["loss"]))


def test_reuse_init_restores_cached_conditioning(subject_dir, tmp_path):
    """A reuse-init iteration must distill the cached reconstruction under
    the PROMPTS it was denoised with (`ddpm.py:1903-1915`), not under
    freshly-sampled ones — regression: the cache used to carry only
    x_start/t."""
    from adaface_tpu.training.teacher_filter import CachedInits

    tr = _build(subject_dir, str(tmp_path / "run"))
    tr.cached_inits = CachedInits()
    subj = tr.dataset.subjects[0].name
    cached_prompts = ["a z marker", "a z marker on a beach",
                      "a person marker", "a person marker on a beach"]
    tr.cached_inits.put(subj, np.zeros((1, 8, 8, 4), np.float32),
                        np.asarray([700]),
                        fg_mask=np.ones((1, 8, 8, 1), np.float32),
                        prompts=cached_prompts,
                        use_background_token=False,
                        comp_init_fg_from_training_image=False)
    plan = plan_iteration(tr.rng, 0, tr.plan_cfg)
    plan.use_background_token = True  # freshly sampled, must be overridden
    seen = {}
    orig = tr.pipe.tokenizer

    class SpyTok:
        def __call__(self, prompts):
            seen["prompts"] = list(prompts)
            return orig(prompts)

        def __getattr__(self, name):
            return getattr(orig, name)

    tr.pipe.tokenizer = SpyTok()
    try:
        m = tr._run_compos(plan)
    finally:
        tr.pipe.tokenizer = orig
    assert seen["prompts"] == cached_prompts
    assert plan.use_background_token is False  # restored from the cache
    assert np.isfinite(float(m["loss"]))
