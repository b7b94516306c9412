"""ZeroShotTrainer end-to-end on tiny configs: recon + compositional
iterations over the generator params, checkpointing."""

import os
import tempfile

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
from adaface_tpu.training.iter_plan import IterPlanConfig
from adaface_tpu.training.trainer import TrainerConfig
from adaface_tpu.training.zs_trainer import ZeroShotTrainer

# oracle-parity / integration battery: minutes of compile; run with -m slow
pytestmark = pytest.mark.slow

D = 64


def make_subject_dir(path) -> str:
    """Tiny 2-image subject folder with square fg masks."""
    from PIL import Image

    path.mkdir(exist_ok=True)
    rng = np.random.default_rng(0)
    for i in range(2):
        Image.fromarray(rng.integers(0, 255, (48, 48, 3)).astype(np.uint8)
                        ).save(path / f"{i}.jpg")
        m = np.zeros((48, 48), np.uint8)
        m[10:38, 10:38] = 255
        Image.fromarray(m).save(path / f"{i}_mask.png")
    return str(path)


def build_zs_trainer(tmp_path, cfg_kw=None, plan_kw=None) -> ZeroShotTrainer:
    """Tiny-config ZeroShotTrainer over a synthetic subject (shared by the
    zs integration tests here and the wds battery in test_wds.py)."""
    subj = make_subject_dir(tmp_path / "subj")
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

    ds = PersonalizedDataset([SubjectSpec("s", subj)], size=32, seed=0)
    cfg = TrainerConfig(**{**dict(max_steps=4, batch_size=1, use_prodigy=True,
                                  ckpt_every_steps=100, log_every_steps=100,
                                  logdir=str(tmp_path / "log")),
                           **(cfg_kw or {})})
    plan_cfg = IterPlanConfig(**{"composition_regs_iter_gap": 1,
                                 "max_steps": cfg.max_steps,
                                 **(plan_kw or {})})
    return ZeroShotTrainer(pipe, ds, ext, {"z": gen}, {"z": gparams},
                           arc_enc, arc_params, cfg, plan_cfg=plan_cfg)


def test_zs_trainer_recon_and_compos(tmp_path):
    tr = build_zs_trainer(tmp_path)
    log = tr.cfg.logdir
    before = jax.device_get(tr.gen_params)
    tr.fit()
    assert tr.global_step == 4
    leaves0 = jax.tree_util.tree_leaves(before)
    leaves1 = jax.tree_util.tree_leaves(tr.gen_params)
    assert all(np.isfinite(np.asarray(x)).all() for x in leaves1)
    assert max(float(jnp.abs(a - b).max())
               for a, b in zip(leaves0, leaves1)) > 0
    # frozen copy untouched by training
    g0 = jax.tree_util.tree_leaves(tr._gen0)
    assert all(np.allclose(np.asarray(a), np.asarray(b))
               for a, b in zip(leaves0, g0))
    assert os.path.exists(os.path.join(log, "subj_basis_last.pkl"))
    # both iteration types actually ran (gap=1 -> compos every other step)
    import json
    iter_types = {json.loads(l).get("iter_type")
                  for l in open(os.path.join(log, "metrics.jsonl"))}
    assert "compos_distill" in iter_types


def test_zs_trainer_validation_and_summary(tmp_path):
    """Zero-shot validation pass (`val/` rows via the loss-only zs recon
    program) + run-summary rows, mirroring the static trainer's
    (`ddpm.py:645-651`, `main.py:702-722`)."""
    import json

    tr = build_zs_trainer(tmp_path, cfg_kw={"max_steps": 2,
                                            "val_every_steps": 1,
                                            "val_batches": 1})
    # a standalone val pass must not perturb the TRAINING rng stream
    # (dropout_key/skip_weights draw from the val stream, dropout off)
    train_stream_before = tr.rng.bit_generator.state
    tr.run_validation()
    assert tr.rng.bit_generator.state == train_stream_before
    tr.fit()
    recs = [json.loads(l)
            for l in open(os.path.join(tr.cfg.logdir, "metrics.jsonl"))]
    val = [r for r in recs if any(k.startswith("val/") for k in r)]
    assert len(val) == 3  # standalone + steps 1 and 2
    for r in val:
        assert np.isfinite(r["val/loss"]) and np.isfinite(r["val/recon"])
    summaries = [r for r in recs if r.get("run_summary")]
    assert summaries and summaries[-1]["steps_per_sec"] > 0
