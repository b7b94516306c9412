"""Tar-shard background stream + compositing filters."""

import io
import json
import os
import tarfile

import numpy as np
import pytest

from adaface_tpu.data.wds import (
    HUMAN_ANIMAL_PAT,
    BackgroundCompositor,
    stream_tar_shards,
)


def _add(tf, name, data: bytes):
    info = tarfile.TarInfo(name)
    info.size = len(data)
    tf.addfile(info, io.BytesIO(data))


def _img_bytes(rng, h, w):
    from PIL import Image

    buf = io.BytesIO()
    Image.fromarray(rng.integers(0, 255, (h, w, 3)).astype(np.uint8)
                    ).save(buf, format="PNG")
    return buf.getvalue()


@pytest.fixture()
def shard(tmp_path):
    rng = np.random.default_rng(0)
    path = tmp_path / "shard-000.tar"
    with tarfile.open(path, "w") as tf:
        # good sample
        _add(tf, "000.png", _img_bytes(rng, 64, 64))
        _add(tf, "000.json", json.dumps({
            "caption": "a sunny mountain landscape with trees",
            "width": 64, "height": 64,
            "original_width": 640, "original_height": 640}).encode())
        # human prompt -> filtered
        _add(tf, "001.png", _img_bytes(rng, 64, 64))
        _add(tf, "001.json", json.dumps({
            "caption": "a man walking on the beach",
            "width": 64, "height": 64,
            "original_width": 640, "original_height": 640}).encode())
        # too small source -> filtered
        _add(tf, "002.png", _img_bytes(rng, 64, 64))
        _add(tf, "002.json", json.dumps({
            "caption": "a quiet forest clearing at dawn",
            "width": 64, "height": 64,
            "original_width": 64, "original_height": 64}).encode())
        # txt caption variant, good
        _add(tf, "003.png", _img_bytes(rng, 64, 64))
        _add(tf, "003.txt", b"an empty cobblestone alley in the rain")
    return str(path)


def test_stream_pairs(shard):
    gen = stream_tar_shards([shard])
    seen = [next(gen) for _ in range(5)]  # loops past the shard end
    assert all(img.shape == (64, 64, 3) for img, _ in seen)
    captions = {m["caption"] for _, m in seen}
    assert "a sunny mountain landscape with trees" in captions
    assert "an empty cobblestone alley in the rain" in captions


def test_filters(shard):
    comp = BackgroundCompositor([shard], size=96)
    for _ in range(4):
        out = comp.next_background()
        assert out is not None
        bg, prompt = out
        assert bg.shape == (96, 96, 3)
        assert not HUMAN_ANIMAL_PAT.search(prompt)
        assert prompt != "a quiet forest clearing at dawn"  # too small


def test_composite_keys(shard):
    rng = np.random.default_rng(1)
    comp = BackgroundCompositor([shard], size=48)
    img = rng.integers(0, 255, (48, 48, 3)).astype(np.uint8)
    fg = np.zeros((48, 48), np.uint8)
    fg[10:30, 10:30] = 1
    ex = {
        "caption": "a photo of a z",
        "caption_bg": "a photo of a z with background y",
        "image_unnorm": img,
        "image": (img / 127.5 - 1.0).astype(np.float32),
        "fg_mask": fg,
        "aug_mask": np.ones((48, 48), np.uint8),
    }
    out = comp.composite(ex, "person")
    assert out["has_wds_comp"]
    assert out["wds_caption"].startswith("a photo of a z, in front of ")
    assert "person" in out["wds_cls_comp_extra"]
    # fg pixels come from the subject image, bg pixels from the background
    wds = np.round((out["wds_image"] + 1) * 127.5).astype(np.uint8)
    np.testing.assert_array_equal(wds[15, 15], img[15, 15])
    bgonly = np.round((out["wds_image_bgonly"] + 1) * 127.5).astype(np.uint8)
    np.testing.assert_array_equal(wds[0, 0], bgonly[0, 0])


def test_placeholder_token_filter(tmp_path):
    rng = np.random.default_rng(2)
    path = tmp_path / "s.tar"
    with tarfile.open(path, "w") as tf:
        _add(tf, "0.png", _img_bytes(rng, 64, 64))
        _add(tf, "0.json", json.dumps({
            "caption": "the letter z carved into stone",
            "width": 64, "height": 64,
            "original_width": 640, "original_height": 640}).encode())
    comp = BackgroundCompositor([str(path)], size=32, max_tries=5)
    assert comp.next_background() is None  # contains placeholder 'z'


# ---------------------------------------------------------------------------
# Trainer wds semantics (`ddpm.py:1485-1567`, `:2651-2664`): per-iteration
# composite rolls, caption swaps, bg-only compos x_start, comp-extra masks.
# Unit-level via a stub Trainer — no jit, no model build.
# ---------------------------------------------------------------------------

from adaface_tpu.training.iter_plan import IterPlan, IterPlanConfig
from adaface_tpu.training.trainer import Trainer, TrainerConfig


class _StubSpec:
    name = "s"
    cls_delta_string = "person"
    background_string = "y"


class _StubTok:
    bos_id = 0
    eos_id = 1


class _StubPlaceholder:
    def __init__(self, is_background):
        self.is_background = is_background


def _stub_trainer(shard, **cfg_kw):
    from adaface_tpu.data.wds import BackgroundCompositor

    tr = Trainer.__new__(Trainer)  # skip __init__: no models needed
    tr.cfg = TrainerConfig(**cfg_kw)
    tr.plan_cfg = IterPlanConfig()
    tr.rng = np.random.default_rng(0)
    tr.compositor = BackgroundCompositor([shard], size=48)
    tr.cached_inits = None

    class _DS:
        subjects = [_StubSpec()]

    tr.dataset = _DS()

    class _Pipe:
        tokenizer = _StubTok()

    tr.pipe = _Pipe()

    class _Mgr:
        placeholders = {"z": _StubPlaceholder(False),
                        "y": _StubPlaceholder(True)}

    tr.mgr = _Mgr()
    return tr


def _example(rng):
    img = rng.integers(0, 255, (48, 48, 3)).astype(np.uint8)
    fg = np.zeros((48, 48), np.uint8)
    fg[10:30, 10:30] = 1
    return {
        "subject_name": "s",
        "caption": "a photo of a z",
        "caption_bg": "a photo of a z with background y",
        "image_unnorm": img,
        "image": (img / 127.5 - 1.0).astype(np.float32),
        "fg_mask": fg,
        "aug_mask": np.ones((48, 48), np.uint8),
    }


def test_wds_recon_swap(shard):
    tr = _stub_trainer(shard, p_wds_comp_recon=1.0)
    rng = np.random.default_rng(3)
    ex = [_example(rng), _example(rng)]
    orig_img = ex[0]["image"].copy()
    plan = IterPlan(iter_type="recon", training_percent=0.0)
    plan, use_wds, use_wds_cls = tr._wds_recon_swap(plan, ex)
    assert use_wds and plan.use_wds_comp
    # image swapped to the overlay, captions gained the bg extra
    assert not np.allclose(ex[0]["image"], orig_img)
    for e in ex:
        assert ", in front of " in e["caption"]
        if use_wds_cls:
            assert "person" in e["caption"]  # CLS flavor appends the class


def test_wds_recon_swap_zero_prob(shard):
    tr = _stub_trainer(shard, p_wds_comp_recon=0.0)
    ex = [_example(np.random.default_rng(3))]
    plan = IterPlan(iter_type="recon")
    plan, use_wds, _ = tr._wds_recon_swap(plan, ex)
    assert not use_wds and not plan.use_wds_comp
    assert ", in front of " not in ex[0]["caption"]


def test_wds_recon_bg_token_upgrade(shard):
    """Non-bg-token plans upgrade to the bg token at p=0.5 on wds iters
    (0.9 + 0.1*0.5 = the reference's 0.95, `ddpm.py:1565-1567`)."""
    tr = _stub_trainer(shard, p_wds_comp_recon=1.0)
    rng = np.random.default_rng(4)
    n_up = 0
    N = 200
    for _ in range(N):
        ex = [_example(rng)]
        plan = IterPlan(iter_type="recon", use_background_token=False)
        plan, use_wds, _ = tr._wds_recon_swap(plan, ex)
        assert use_wds
        n_up += plan.use_background_token
    assert 0.35 < n_up / N < 0.65


def test_wds_extra_mask_cls_extension(shard):
    """Comp-extra mask: real word tokens minus slots; the CLS-caption
    variant extends SUBJECT (not bg) slots by one to absorb the appended
    class token (`ddpm.py:3506-3512`)."""
    tr = _stub_trainer(shard)
    T = 8
    ids = np.asarray([[0, 7, 8, 9, 10, 11, 1, 1]])  # bos, 5 words, eos, pad
    z = -np.ones((1, T), np.int64)
    z[0, 2], z[0, 3] = 0, 1  # subject at 2,3
    y = -np.ones((1, T), np.int64)
    y[0, 5] = 0  # bg at 5
    mask = tr._wds_extra_mask(ids, {"z": z, "y": y})
    np.testing.assert_array_equal(mask[0], [0, 1, 0, 0, 1, 0, 0, 0])
    ext = tr._wds_extra_mask(ids, {"z": z, "y": y}, extend_subj_by_one=True)
    # position 4 (class token after the subject) absorbed into the subject;
    # the bg slot is NOT extended (position 6 is eos anyway)
    np.testing.assert_array_equal(ext[0], [0, 1, 0, 0, 0, 0, 0, 0])


def test_wds_compos_swap_and_prompts(shard):
    tr = _stub_trainer(shard, p_wds_comp_compos=1.0)
    e = _example(np.random.default_rng(5))
    plan = IterPlan(iter_type="compos_distill")
    tr._wds_compos_swap(plan, [e])
    assert plan.use_wds_comp and plan.comp_init_fg_from_training_image
    np.testing.assert_allclose(e["image"], e["wds_image_bgonly"])
    prompts = ["a z", "a z riding a bike", "a person", "a person riding a bike"]
    out = tr._wds_comp_prompts(plan, e, prompts)
    extra = e["wds_comp_extra"]
    assert out == ["a z", "a z" + extra, "a person", "a person" + extra]
    # x_start kept INTACT for wds compos iters (`ddpm.py:2651-2664`)
    lat = np.random.default_rng(6).standard_normal((1, 4, 4, 4)).astype("f")
    fg = np.ones((1, 4, 4, 1), np.float32)
    lat2, fg2, p2, prev_t, entry = tr._compos_x_start(
        plan, [e], lat, fg, prompts)
    np.testing.assert_allclose(np.asarray(lat2), lat)
    assert entry is None and prev_t is None


def test_wds_compos_swap_off(shard):
    tr = _stub_trainer(shard, p_wds_comp_compos=0.0)
    e = _example(np.random.default_rng(7))
    plan = IterPlan(iter_type="compos_distill")
    tr._wds_compos_swap(plan, [e])
    assert not plan.use_wds_comp
    prompts = ["a z", "a z riding a bike", "a person", "a person riding a bike"]
    assert tr._wds_comp_prompts(plan, e, prompts) == prompts


def test_wds_recon_t_decrease():
    """wds recon iters DECREASE t (ratio 0.8-1.0) instead of the zero-shot
    upward anneal (`ddpm.py:2841-2847`)."""
    from adaface_tpu.training.iter_plan import sample_timesteps

    cfg = IterPlanConfig(do_zero_shot=True)
    plan = IterPlan(iter_type="recon", use_wds_comp=True,
                    training_percent=1.0)
    rng = np.random.default_rng(8)
    ts = np.concatenate([sample_timesteps(rng, plan, 64, cfg)
                         for _ in range(20)])
    assert ts.max() < cfg.num_timesteps
    # the non-wds zero-shot path shifts t UP on average; wds must not
    plan2 = IterPlan(iter_type="recon", training_percent=1.0)
    ts2 = np.concatenate([sample_timesteps(rng, plan2, 64, cfg)
                          for _ in range(20)])
    assert ts.mean() < ts2.mean()


@pytest.mark.slow
def test_zs_trainer_wds_integration(tmp_path, shard):
    """ZeroShotTrainer end-to-end with wds compositing forced on: recon
    iters train on the overlay with the fg↔wds complementary battery
    (wds_comp metric + finite losses), compos iters start from the bg-only
    image."""
    import json

    from test_zs_trainer import build_zs_trainer

    tr = build_zs_trainer(
        tmp_path,
        cfg_kw=dict(wds_shards=(shard,), p_wds_comp_recon=1.0,
                    p_wds_comp_compos=1.0,
                    fg_wds_complementary_loss_weight=1e-4),
        plan_kw=dict(composition_regs_iter_gap=2))
    tr.fit()
    assert tr.global_step == 4
    recs = [json.loads(l) for l in open(
        os.path.join(tr.cfg.logdir, "metrics.jsonl"))]
    recon = [r for r in recs if r.get("iter_type") == "recon"]
    assert recon and all(r.get("wds_comp") == 1.0 for r in recon)
    assert all("fg_wds_complem" in r for r in recon)
    # the wds complementary battery actually computes (VERDICT r3 #7:
    # weighted metrics must be NONZERO through the wired path, not just
    # present — weight 0 in the shipped config hides wiring regressions)
    assert all(abs(r["fg_wds_complem"]) > 0 for r in recon)
    assert all(np.isfinite(r["loss"]) for r in recs if "loss" in r)


def test_repl_bg_as_wbg():
    from adaface_tpu.data.wds import repl_bg_as_wbg

    # singleton word-boundary replacement (`personalized.py:982-990`)
    assert repl_bg_as_wbg("a z with background y, , ,", "y", "w") == \
        "a z with background w, , ,"
    # no-op when either side is unset, or on substring hits
    assert repl_bg_as_wbg("a z with background y", None, "w").endswith("y")
    assert repl_bg_as_wbg("a z with background y", "y", None).endswith("y")
    assert repl_bg_as_wbg("yellow barn", "y", "w") == "yellow barn"


def test_composite_wds_bg_substitution(shard):
    rng = np.random.default_rng(9)
    comp = BackgroundCompositor([shard], size=48)
    img = rng.integers(0, 255, (48, 48, 3)).astype(np.uint8)
    fg = np.zeros((48, 48), np.uint8)
    fg[10:30, 10:30] = 1
    ex = {
        "caption": "a photo of a z",
        "caption_bg": "a photo of a z with background y",
        "image_unnorm": img,
        "image": (img / 127.5 - 1.0).astype(np.float32),
        "fg_mask": fg,
        "aug_mask": np.ones((48, 48), np.uint8),
    }
    out = comp.composite(ex, "person", background_string="y",
                         wds_background_string="w")
    assert out["has_wds_comp"]
    assert "background w," in out["wds_caption_bg"]
    assert "background w " in out["wds_cls_caption_bg"] or \
        "background w," in out["wds_cls_caption_bg"]
    # the non-bg caption variants keep the original tokens
    assert "background" not in out["wds_caption"]


def test_trainer_composite_gates_unregistered_wbg(shard):
    """The trainer applies the 'w' substitution only when the placeholder
    is registered — otherwise 'w' would be an untrained ordinary token."""
    tr = _stub_trainer(shard, p_wds_comp_recon=1.0)
    tr.dataset.subjects[0].background_string = "y"

    class _MgrNoW:
        placeholders = {"z": _StubPlaceholder(False),
                        "y": _StubPlaceholder(True)}

    tr.mgr = _MgrNoW()
    e = _example(np.random.default_rng(10))
    tr._composite(e)
    assert "background w" not in e["wds_caption_bg"]

    class _MgrW:
        placeholders = {"z": _StubPlaceholder(False),
                        "y": _StubPlaceholder(True),
                        "w": _StubPlaceholder(True)}

    tr.mgr = _MgrW()
    e2 = _example(np.random.default_rng(11))
    tr._composite(e2)
    assert "background w" in e2["wds_caption_bg"]
