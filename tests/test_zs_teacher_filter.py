"""Zero-shot teacher filtering + reuse-init (VERDICT round-2 item 3).

Drives `ZeroShotTrainer._run_zs_compos` through all three branches of
`ddpm.py:3039-3180` / `:2604-2635` on tiny configs:
- non-teachable: distillation skipped, generators untouched;
- teachable: best candidate picked, grad pass runs, reconstruction cached;
- reuse-init follow-up: cache consumed, mid-range t, grad pass runs.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from adaface_tpu.data.personalized import PersonalizedDataset, SubjectSpec
from adaface_tpu.data.tokenizer import HashTokenizer
from adaface_tpu.models.clip_text import CLIPTextConfig, CLIPTextEncoder
from adaface_tpu.models.clip_vision import CLIPVisionConfig, CLIPVisionEncoder
from adaface_tpu.models.unet import UNetConfig
from adaface_tpu.models.vae import VAEConfig
from adaface_tpu.personalization.arc2face import INVERSE_TEMPLATE
from adaface_tpu.personalization.embedding_manager import NUM_CA_LAYERS
from adaface_tpu.personalization.subj_basis_generator import SubjBasisGenerator
from adaface_tpu.personalization.zero_shot import ZeroShotFeatureExtractor
from adaface_tpu.pipeline import StableDiffusionPipeline
from adaface_tpu.training.iter_plan import (
    COMPOS_DISTILL,
    IterPlanConfig,
    plan_iteration,
)
from adaface_tpu.training.trainer import TrainerConfig
from adaface_tpu.training.zs_trainer import ZeroShotTrainer

# oracle-parity / integration battery: minutes of compile; run with -m slow
pytestmark = pytest.mark.slow

D = 64


class SwitchScorer:
    """CLIP-T fake whose sims are set per test phase."""

    def __init__(self):
        self.sims = [0.2, 0.2, 0.3, 0.3]

    def txt_to_img_similarity(self, prompts, images, reduction="diag"):
        assert reduction == "diag"
        assert len(prompts) == len(self.sims)
        return jnp.asarray(np.asarray(self.sims, np.float32))


@pytest.fixture(scope="module")
def zs_setup(tmp_path_factory):
    from PIL import Image

    tmp_path = tmp_path_factory.mktemp("zs_tf")
    d = tmp_path / "subj"
    d.mkdir()
    rng = np.random.default_rng(0)
    for i in range(2):
        Image.fromarray(rng.integers(0, 255, (48, 48, 3)).astype(np.uint8)
                        ).save(d / f"{i}.jpg")
        m = np.zeros((48, 48), np.uint8)
        m[10:38, 10:38] = 255
        Image.fromarray(m).save(d / f"{i}_mask.png")

    tok = HashTokenizer()
    pipe = StableDiffusionPipeline.from_random(
        jax.random.PRNGKey(0), tok,
        clip_cfg=CLIPTextConfig.tiny(vocab_size=tok.vocab_size,
                                     max_position_embeddings=77,
                                     num_extra_tokens=8),
        unet_cfg=UNetConfig(model_channels=32, channel_mult=(1, 2),
                            num_res_blocks=1, attention_levels=(0, 1),
                            num_heads=4, context_dim=D,
                            use_flash_attention=False),
        vae_cfg=VAEConfig.tiny())
    pipe.embedding_manager.add_placeholder(
        "z", token_id=tok.add_placeholder("z"), num_vectors=16,
        init_key=jax.random.PRNGKey(1), emb_dim=D)

    vis_cfg = CLIPVisionConfig.tiny(hidden_size=48)
    vision = CLIPVisionEncoder(vis_cfg)
    vparams = vision.init(jax.random.PRNGKey(5),
                          jnp.zeros((1, 28, 28, 3)))["params"]
    ext = ZeroShotFeatureExtractor(
        vision, vparams,
        face_embed_fn=lambda img: np.float32(
            np.random.default_rng(0).standard_normal(512)))

    arc_cfg = CLIPTextConfig.tiny(vocab_size=tok.vocab_size, hidden_size=D,
                                  num_layers=2, max_position_embeddings=77)
    arc_enc = CLIPTextEncoder(arc_cfg)
    arc_params = arc_enc.init(jax.random.PRNGKey(6),
                              input_ids=jnp.zeros((1, 77), jnp.int32))["params"]
    gen = SubjBasisGenerator(placeholder_is_bg=False,
                             num_out_layers=NUM_CA_LAYERS,
                             num_out_embs_per_layer=16, output_dim=D,
                             proj_cfg=arc_cfg, pad_token_id=tok.eos_id)
    inv_ids = jnp.asarray(tok([INVERSE_TEMPLATE]))
    gparams = gen.init(jax.random.PRNGKey(7), None, None,
                       jnp.zeros((1, 16, D)),
                       inverse_template_ids=inv_ids)["params"]

    ds = PersonalizedDataset([SubjectSpec("s", str(d))], size=32, seed=0)
    tr = ZeroShotTrainer(
        pipe, ds, ext, {"z": gen}, {"z": gparams}, arc_enc, arc_params,
        TrainerConfig(max_steps=8, batch_size=1, use_prodigy=True,
                      accumulate_grad_batches=1,  # param change visible per step
                      ckpt_every_steps=100, log_every_steps=100,
                      logdir=str(tmp_path / "log")),
        plan_cfg=IterPlanConfig(composition_regs_iter_gap=1, max_steps=8))
    scorer = SwitchScorer()
    tr.set_teacher_filter(scorer)
    return tr, scorer


def _compos_plan(tr):
    for step in range(20):
        plan = plan_iteration(tr.rng, step, tr.plan_cfg)
        if plan.iter_type == COMPOS_DISTILL:
            plan.do_teacher_filter = True
            plan.use_background_token = False
            plan.use_fp_trick = False
            return plan
    raise AssertionError("no compos plan generated in 20 steps")


def test_unteachable_skips_distillation(zs_setup):
    tr, scorer = zs_setup
    # mix losses 0.5-0.1=0.40 > 0.28 threshold -> not teachable
    scorer.sims = [0.2, 0.2, 0.1, 0.1]
    before = jax.device_get(tr.gen_params)
    metrics = tr._run_zs_compos(_compos_plan(tr))
    assert metrics.get("skipped_unteachable") == 1.0
    after = jax.device_get(tr.gen_params)
    for a, b in zip(jax.tree_util.tree_leaves(before),
                    jax.tree_util.tree_leaves(after)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert "s" not in tr.cached_inits


def test_teachable_runs_grad_pass_and_caches(zs_setup):
    tr, scorer = zs_setup
    # subj losses [0.30, 0.28]; mix [0.26, 0.20] -> both teachable,
    # candidate 1 has the larger gap
    scorer.sims = [0.20, 0.22, 0.24, 0.30]
    before = jax.device_get(tr.gen_params)
    metrics = tr._run_zs_compos(_compos_plan(tr))
    assert "skipped_unteachable" not in metrics
    assert np.isfinite(float(metrics["loss"]))
    after = jax.device_get(tr.gen_params)
    assert max(float(jnp.abs(a - b).max())
               for a, b in zip(jax.tree_util.tree_leaves(before),
                               jax.tree_util.tree_leaves(after))) > 0
    assert "s" in tr.cached_inits


def test_reuse_init_consumes_cache(zs_setup):
    tr, _ = zs_setup
    assert "s" in tr.cached_inits  # from the previous test
    cached_t = tr.cached_inits._store["s"]["t"]
    plan = _compos_plan(tr)
    metrics = tr._run_zs_compos(plan)
    assert plan.reuse_init_conds
    assert not plan.do_teacher_filter
    assert np.isfinite(float(metrics["loss"]))
    assert "s" not in tr.cached_inits  # consumed (`ddpm.py:2616-2618`)
