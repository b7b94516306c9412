"""Teacher filter: thresholds, candidate selection, cache semantics."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from adaface_tpu.models.unet import UNetConfig, UNetModel
from adaface_tpu.models.vae import AutoencoderKL, VAEConfig
from adaface_tpu.ops.schedule import make_diffusion_schedule
from adaface_tpu.training.teacher_filter import (
    CachedInits,
    FilterVerdict,
    TeacherFilter,
)

# oracle-parity / integration battery: minutes of compile; run with -m slow
pytestmark = pytest.mark.slow


class FakeScorer:
    """Deterministic CLIP-T: returns preset sims per call order."""

    def __init__(self, sims):
        self.sims = np.asarray(sims, np.float32)

    def txt_to_img_similarity(self, prompts, images, reduction="diag"):
        assert reduction == "diag"
        assert len(prompts) == len(self.sims)
        return jnp.asarray(self.sims)


@pytest.fixture(scope="module")
def filter_parts():
    ucfg = UNetConfig(model_channels=32, channel_mult=(1, 2), num_res_blocks=1,
                      attention_levels=(0,), num_heads=4, context_dim=16,
                      use_flash_attention=False)
    unet = UNetModel(ucfg)
    uparams = unet.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 4)),
                        jnp.zeros((1,), jnp.int32),
                        jnp.zeros((1, 1, 8, 16)))["params"]
    vcfg = VAEConfig.tiny()
    vae = AutoencoderKL(vcfg)
    f = 2 ** (len(vcfg.ch_mult) - 1)
    vparams = vae.init(jax.random.PRNGKey(1), jnp.zeros((1, 8 * f, 8 * f, 3)),
                       jax.random.PRNGKey(2))["params"]
    sched = make_diffusion_schedule()
    return unet, uparams, vae, vparams, sched


def _run(filter_parts, sims):
    unet, uparams, vae, vparams, sched = filter_parts
    tf = TeacherFilter(FakeScorer(sims), unet, uparams, vae, vparams, sched)
    rng = np.random.default_rng(0)
    N, Lc, T, D = 2, 1, 8, 16
    x = jnp.asarray(rng.standard_normal((N, 8, 8, 4)), jnp.float32)
    n = jnp.asarray(rng.standard_normal((N, 8, 8, 4)), jnp.float32)
    t = jnp.asarray([900, 950], jnp.int32)
    ctx = lambda: (jnp.asarray(rng.standard_normal((Lc, N, T, D)), jnp.float32),
                   jnp.asarray(rng.standard_normal((Lc, N, T, D)), jnp.float32))
    un = jnp.asarray(rng.standard_normal((Lc, N, T, D)), jnp.float32)
    return tf.filter(x, n, t, ctx(), ctx(), un, "a person in the snow")


def test_teachable_selection(filter_parts):
    # losses = 0.5 - sim; subj: [0.30, 0.28], mix: [0.26, 0.20]
    # teachable: mix <= 0.28 both; diff = [0.04, 0.08] > 0.002 both
    v = _run(filter_parts, sims=[0.20, 0.22, 0.24, 0.30])
    assert v.is_teachable
    assert v.best_cand_idx == 1  # larger teacher-student gap
    assert v.images.shape[0] == 4


def test_not_teachable_when_teacher_bad(filter_parts):
    # mix losses: [0.35, 0.40] all above 0.28 threshold
    v = _run(filter_parts, sims=[0.20, 0.22, 0.15, 0.10])
    assert not v.is_teachable


def test_not_teachable_when_student_better(filter_parts):
    # diffs negative: student already beats the teacher
    v = _run(filter_parts, sims=[0.40, 0.40, 0.30, 0.30])
    assert not v.is_teachable


def test_filter_returns_cfg_reconstruction(filter_parts):
    """Reuse-init must cache the filter's CFG reconstruction — NOT the
    pre-noise input (`x_recon.chunk(2)[0]`, `ddpm.py:3144-3177`)."""
    unet, uparams, vae, vparams, sched = filter_parts
    tf = TeacherFilter(FakeScorer([0.20, 0.22, 0.24, 0.30]),
                       unet, uparams, vae, vparams, sched)
    rng = np.random.default_rng(0)
    N, Lc, T, D = 2, 1, 8, 16
    x = jnp.asarray(rng.standard_normal((N, 8, 8, 4)), jnp.float32)
    n = jnp.asarray(rng.standard_normal((N, 8, 8, 4)), jnp.float32)
    t = jnp.asarray([900, 950], jnp.int32)
    mk = lambda: (jnp.asarray(rng.standard_normal((Lc, N, T, D)), jnp.float32),
                  jnp.asarray(rng.standard_normal((Lc, N, T, D)), jnp.float32))
    sc, mc = mk(), mk()
    un = jnp.asarray(rng.standard_normal((Lc, N, T, D)), jnp.float32)
    v = tf.filter(x, n, t, sc, mc, un, "a person in the snow")
    assert v.x_recons is not None and v.x_recons.shape == (2 * N, 8, 8, 4)
    # the reconstruction is the denoised estimate, not the input
    assert np.abs(v.x_recons[:N] - np.asarray(x)).max() > 1e-3
    # cross-check row 0 against a hand-computed CFG x0
    x_noisy = sched.q_sample(x, t, n)
    eps_c = unet.apply({"params": uparams}, x_noisy, t, sc[0],
                       context_k=sc[1])
    eps_u = unet.apply({"params": uparams}, x_noisy, t, un)
    eps = eps_u + 5.0 * (eps_c - eps_u)  # student rows take cfg 5
    x0 = sched.predict_x0_from_eps(x_noisy, t, eps)
    np.testing.assert_allclose(v.x_recons[:N], np.asarray(x0),
                               rtol=2e-4, atol=2e-4)


def test_cached_inits():
    c = CachedInits()
    assert "alice" not in c
    c.put("alice", jnp.zeros((4, 8, 8, 4)), np.asarray([900] * 4))
    assert "alice" in c
    entry = c.pop("alice")
    assert entry["x_start"].shape == (4, 8, 8, 4)
    assert "alice" not in c  # consumed (`ddpm.py:2616-2618`)


def test_teacher_filter_per_block_thresholds():
    """`TeacherFilter.per_block`: teachability thresholds + per-block best
    candidate with the best-scoring fallback for unteachable blocks."""
    tf = TeacherFilter.__new__(TeacherFilter)  # thresholds only, no models
    tf.clip_loss_thres = 0.28
    tf.cls_subj_clip_margin = 0.002

    # cand-major [n_cand=2, CB=2]: block 0 teachable via cand 1 (bigger
    # gap), block 1 unteachable (mix loss over threshold)
    l_mix = np.array([[0.20, 0.50],
                      [0.10, 0.60]])
    l_subj = np.array([[0.21, 0.58],
                       [0.15, 0.70]])
    v = FilterVerdict(False, 0, l_subj.reshape(-1), l_mix.reshape(-1),
                      images=None, x_recons=None)
    any_ok, best, block_ok = tf.per_block(v, n_cand=2, CB=2)
    assert any_ok
    assert list(block_ok) == [True, False]
    assert best[0] == 1  # gap 0.05 beats 0.01
    assert best[1] == 1  # fallback: best-scoring (gap 0.10 beats 0.08)

    # CB=1 summary reduces to the reference single-block behavior
    v1 = FilterVerdict(False, 0, l_subj[:, 0], l_mix[:, 0],
                       images=None, x_recons=None)
    any_ok1, best1, ok1 = tf.per_block(v1, n_cand=2, CB=1)
    assert any_ok1 and bool(ok1[0]) and best1[0] == 1
