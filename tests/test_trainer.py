"""Trainer orchestration end-to-end on tiny configs (a few steps covering
recon + compositional iterations, checkpointing and resume)."""

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


def _build(subject_dir, logdir, max_steps=4, **cfg_kw):
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
    cfg = TrainerConfig(**{**dict(max_steps=max_steps, batch_size=2,
                                  use_prodigy=True, ckpt_every_steps=100,
                                  log_every_steps=100, seed=0,
                                  logdir=logdir), **cfg_kw})
    return Trainer(pipe, ds, cfg, IterPlanConfig(composition_regs_iter_gap=3,
                                                 max_steps=max_steps))


def test_trainer_fit_and_resume(subject_dir, tmp_path):
    tr = _build(subject_dir, str(tmp_path / "run"))
    before = jax.device_get(tr.mgr.embedders)
    tr.fit()
    assert tr.global_step == 4
    # params moved and stayed finite
    leaves0 = jax.tree_util.tree_leaves(before)
    leaves1 = jax.tree_util.tree_leaves(tr.mgr.embedders)
    assert all(np.isfinite(np.asarray(x)).all() for x in leaves1)
    assert max(float(jnp.abs(a - b).max())
               for a, b in zip(leaves0, leaves1)) > 0
    # artifacts
    assert os.path.exists(tmp_path / "run" / "embeddings_last.npz")
    assert os.path.exists(tmp_path / "run" / "metrics.jsonl")
    # always-on static prompt-delta reg runs on RECON iters too
    # (`do_static_prompt_delta_reg`, `ddpm.py:1954-2005,3230-3240`), at the
    # Prodigy/zero-shot-damped weight (2e-4 * 0.5 / 5)
    import json
    recs = [json.loads(l) for l in open(tmp_path / "run" / "metrics.jsonl")]
    recon = [r for r in recs if r.get("iter_type") == "recon"]
    assert recon and all("prompt_delta" in r for r in recon)
    assert all(np.isfinite(r["prompt_delta"]) for r in recon)
    assert tr._delta_w == pytest.approx(2e-4 * 0.5 / 5)
    # run summary (the `CUDACallback` analog, `main.py:702-722`): wall time
    # + steps/s (+ peak HBM on TPU backends) logged at fit() end
    summaries = [r for r in recs if r.get("run_summary")]
    assert summaries and summaries[-1]["step"] == 4
    assert summaries[-1]["steps_per_sec"] > 0
    assert summaries[-1]["elapsed_s"] > 0


def test_trainer_validation_pass(subject_dir, tmp_path):
    """`val_every_steps` produces `val/`-prefixed JSONL rows (the reference
    validation loop, `main.py:447-545` DataModule val split +
    `ddpm.py:645-651` validation_step) and a val sample grid through the
    ImageLogger (`main.py:694-699`)."""
    import json

    tr = _build(subject_dir, str(tmp_path / "run"), max_steps=4,
                val_every_steps=2, val_batches=2, use_ema=True)
    tr.set_image_logger(every_steps=10**9, num_samples=2, sample_steps=2,
                        size=32)
    train_stream_before = tr.dataset.rng.bit_generator.state
    tr.run_validation()  # callable standalone too
    # the val stream must NOT perturb the training data stream
    assert tr.dataset.rng.bit_generator.state == train_stream_before
    tr.fit()
    recs = [json.loads(l) for l in open(tmp_path / "run" / "metrics.jsonl")]
    val = [r for r in recs if any(k.startswith("val/") for k in r)]
    assert len(val) == 3  # standalone + steps 2 and 4
    assert {r["step"] for r in val[1:]} == {2, 4}
    for r in val:
        assert np.isfinite(r["val/loss"]) and np.isfinite(r["val/recon"])
        # EMA arm logged alongside (`ddpm.py:647-649` ema_scope pass)
        assert np.isfinite(r["val/loss_ema"])
    # val grids rendered
    import glob

    assert glob.glob(str(tmp_path / "run" / "images" / "val_samples_gs-*"))

    state = tr.save_state()
    tr2 = _build(subject_dir, str(tmp_path / "run2"), max_steps=6)
    tr2.load_state(state)
    assert tr2.global_step == 4
    tr2.fit()
    assert tr2.global_step == 6


def test_trainer_fit_bf16(subject_dir, tmp_path):
    """The shipped finetune configs run dtype: bfloat16 — a few steps must
    train end-to-end with a bf16 backbone (regression: the subpixel
    upsample's conv VJP rejected bf16, breaking every bf16 backward)."""
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
        vae_cfg=VAEConfig.tiny(), dtype=jnp.bfloat16)
    pipe.cast_params(jnp.bfloat16)
    mgr = pipe.embedding_manager
    mgr.add_placeholder("z", token_id=tok.add_placeholder("z"),
                        num_vectors=9, init_key=jax.random.PRNGKey(1),
                        emb_dim=64)
    ds = PersonalizedDataset([SubjectSpec("s", subject_dir)], size=32, seed=0)
    cfg = TrainerConfig(max_steps=3, batch_size=2, use_prodigy=False,
                        ckpt_every_steps=100, log_every_steps=100, seed=0,
                        logdir=str(tmp_path / "bf16"))
    tr = Trainer(pipe, ds, cfg,
                 IterPlanConfig(composition_regs_iter_gap=2, max_steps=3))
    tr.fit()
    import json

    with open(os.path.join(str(tmp_path / "bf16"), "metrics.jsonl")) as f:
        recs = [json.loads(l) for l in f if l.strip()]
    losses = [r["loss"] for r in recs if "loss" in r]
    assert losses and all(np.isfinite(l) for l in losses)


def test_train_cli_model_options_override(subject_dir, tmp_path):
    """scripts/train.py consumes model_options.* from the config tree
    (UNetConfig overrides, e.g. use_remat) — regression for the key being
    silently dropped."""
    import sys as _sys

    _sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                     "scripts"))
    import train as train_cli

    logdir = str(tmp_path / "cli")
    rc = train_cli.main(train_cli.parse_args([
        "--data_root", subject_dir, "--tiny", "--max_steps", "2",
        "--batch_size", "1", "--size", "32", "--logdir", logdir,
        "--ckpt_every_steps", "1000",
        "model_options.use_remat=true"]))
    assert rc in (0, None)
    assert os.path.exists(os.path.join(logdir, "embeddings_last.npz"))


def test_skip_weights_flow_into_encode(subject_dir, tmp_path):
    """Two recon batches identical except for the per-iteration skip-weight
    draw produce different losses through ONE compiled step (the weights are
    a traced batch field, not a retrace trigger)."""
    from adaface_tpu.training.train_step import ReconBatch

    tr = _build(subject_dir, str(tmp_path / "sw"), max_steps=2)
    ex = [tr.dataset[i] for i in range(2)]
    from adaface_tpu.data.personalized import collate_examples

    batch_np = collate_examples(ex)
    latents = tr._latents(batch_np["image"])
    ids, slots = tr._prompt_batch(ex, "caption")
    base = dict(
        latents=latents, token_ids=ids, slot_maps=slots, fg_mask=None,
        timesteps=jnp.full((2,), 10, jnp.int32),
        noise=jnp.asarray(np.random.default_rng(0).standard_normal(
            latents.shape), jnp.float32))
    step = tr._get_recon_step(False, False)
    losses = {}
    for name, sw in (("a", (0.05, 0.95)), ("b", (0.95, 0.05))):
        b = ReconBatch(**base, skip_weights=jnp.asarray(sw, jnp.float32))
        _, _, metrics = step(tr.mgr.embedders, tr.opt_state, b, tr._frozen)
        losses[name] = float(metrics["loss"])
    assert np.isfinite(losses["a"]) and np.isfinite(losses["b"])
    assert abs(losses["a"] - losses["b"]) > 1e-6


def test_train_cli_init_words_rank_and_randomize(subject_dir, tmp_path):
    """CLI parity flags: --subj_init_word_weights / --bg_init_string
    initialize the embedders from token embeddings (pre_vecs present,
    embedding_manager.py:414-495), --layerwise_lora_rank sets the basis
    rank, --randomize_clip_skip_weights trains fine end to end."""
    import sys as _sys

    _sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                     "scripts"))
    import train as train_cli

    logdir = str(tmp_path / "cli_init")
    rc = train_cli.main(train_cli.parse_args([
        "--data_root", subject_dir, "--tiny", "--max_steps", "2",
        "--batch_size", "1", "--size", "32", "--logdir", logdir,
        "--ckpt_every_steps", "1000",
        "--subj_init_word_weights", "1",
        "--layerwise_lora_rank", "8",
        "--clip_last_layers_skip_weights", "1", "2",
        "--randomize_clip_skip_weights"]))
    assert rc in (0, None)
    path = os.path.join(logdir, "embeddings_last.npz")
    assert os.path.exists(path)
    from adaface_tpu.personalization.embedding_manager import EmbeddingManager

    mgr = EmbeddingManager.load_native(path)
    z = mgr.embedders["z"]
    # init-word vectors present: pre_vecs [K, 1, D] (one init token 'person')
    assert z.pre_vecs is not None and z.pre_vecs.shape[1] == 1
    # rank 8 = pre(1) + basis(7)
    assert z.basis_vecs.shape[1] == 7
    # bg init from 'unknown'
    y = mgr.embedders["y"]
    assert y.pre_vecs is not None


def test_train_cli_zeroshot_mode(subject_dir, tmp_path):
    """`--zeroshot` trains SubjBasisGenerators over the corpus (the
    reference's flagship `main.py --zeroshot` / `ddpm.py:127` do_zero_shot
    mode): generator-backed placeholders (no static embedders), recon +
    compos iterations, subj_basis checkpoint save + resume."""
    import json
    import sys as _sys

    _sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                     "scripts"))
    import train as train_cli

    logdir = str(tmp_path / "cli_zs")
    args = ["--data_root", subject_dir, "--tiny", "--zeroshot",
            "--max_steps", "2", "--batch_size", "1", "--size", "32",
            "--logdir", logdir, "--ckpt_every_steps", "1000",
            "--background_string", "y"]
    rc = train_cli.main(train_cli.parse_args(args))
    assert rc in (0, None)
    ckpt = os.path.join(logdir, "subj_basis_last.pkl")
    assert os.path.exists(ckpt)
    with open(os.path.join(logdir, "metrics.jsonl")) as f:
        recs = [json.loads(l) for l in f
                if l.strip() and "run_summary" not in l]
    assert len(recs) == 2
    assert all(np.isfinite(r["loss"]) for r in recs if "loss" in r)
    # resume continues from the saved global step
    logdir2 = str(tmp_path / "cli_zs_resume")
    rc = train_cli.main(train_cli.parse_args(
        args[:-2] + ["--logdir", logdir2, "--max_steps", "3",
                     "--resume", ckpt]))
    assert rc in (0, None)
    with open(os.path.join(logdir2, "metrics.jsonl")) as f:
        recs = [json.loads(l) for l in f
                if l.strip() and "run_summary" not in l]
    assert [r["step"] for r in recs] == [2]
