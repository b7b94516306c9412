"""Zero-shot arc2face distillation: generators train against the frozen
teacher trajectory (`ddpm.py:2950-3035` zero-shot branch)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

# integration battery: minutes of compile; run with -m slow
pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def zs_tr(tmp_path_factory):
    import tests.test_zs_teacher_filter as M

    tr, scorer = M.zs_setup.__wrapped__(tmp_path_factory)
    return tr


def _plan(S, rand_face, add_noise=False):
    # a REAL IterPlan (a stub class silently drifts when new fields like
    # use_wds_comp are added to the plan machine)
    from adaface_tpu.training.iter_plan import ARC2FACE_DISTILL, IterPlan

    return IterPlan(iter_type=ARC2FACE_DISTILL, training_percent=0.1,
                    num_denoising_steps=S, gen_arc2face_rand_face=rand_face,
                    add_noise_to_real_id_embs=add_noise)


def test_rand_face_iteration_updates_generators(zs_tr):
    tr = zs_tr
    p = tr.pipe
    teacher = (p.unet, p.unet_params, None)  # self-teacher: shapes suffice
    before = jax.device_get(tr.gen_params)
    m = tr._run_zs_arc2face(_plan(1, rand_face=True), teacher)
    assert np.isfinite(float(m["loss"]))
    m = tr._run_zs_arc2face(_plan(1, rand_face=True), teacher)
    after = jax.device_get(tr.gen_params)
    assert max(float(jnp.abs(a - b).max())
               for a, b in zip(jax.tree_util.tree_leaves(before),
                               jax.tree_util.tree_leaves(after))) > 0


def test_multistep_real_face_iteration(zs_tr):
    tr = zs_tr
    p = tr.pipe
    teacher = (p.unet, p.unet_params, None)
    m = tr._run_zs_arc2face(_plan(3, rand_face=False), teacher)
    assert np.isfinite(float(m["loss"]))
    assert m["n_loss_steps"] >= 1


def test_noise_id_embs_keep_norm(zs_tr):
    """`_noise_id_embs` matches `add_noise_to_tensor(keep_norm=True)`
    semantics (`ldm/util.py:2364-2379`): rows change direction but keep
    their L2 norm, and the perturbation is O(relative std)."""
    tr = zs_tr
    rng = np.random.default_rng(3)
    e = jnp.asarray(rng.standard_normal((4, 512)).astype(np.float32) * 0.7)
    out = np.asarray(tr._noise_id_embs(e))
    e_np = np.asarray(e)
    np.testing.assert_allclose(np.linalg.norm(out, axis=-1),
                               np.linalg.norm(e_np, axis=-1), rtol=1e-4)
    rel = np.linalg.norm(out - e_np, axis=-1) / np.linalg.norm(e_np, axis=-1)
    assert (rel > 1e-4).all()  # actually perturbed
    assert (rel < 0.15).all()  # but only by ~U(0.02,0.06) relative std


def test_add_noise_to_real_id_embs_collapses_batch(zs_tr, monkeypatch):
    """With add_noise_to_real_id_embs, the batch collapses to the first
    subject (x_start/masks/CLIP features identical across instances) and
    the ID embeddings differ only by the keep-norm noise
    (`ddpm.py:1749-1779`)."""
    import adaface_tpu.training.zs_trainer as Z

    tr = zs_tr
    p = tr.pipe
    captured = {}
    real_cls = Z.ZeroShotArc2FaceBatch

    def spy(**kw):
        captured.update(kw)
        return real_cls(**kw)

    monkeypatch.setattr(Z, "ZeroShotArc2FaceBatch", spy)
    m = tr._run_zs_arc2face(_plan(1, rand_face=False, add_noise=True),
                            (p.unet, p.unet_params, None))
    assert np.isfinite(float(m["loss"]))
    lat = np.asarray(captured["latents"])
    assert lat.shape[0] >= 1
    np.testing.assert_array_equal(lat, np.broadcast_to(lat[:1], lat.shape))
    fg = np.asarray(captured["fg_mask"])
    np.testing.assert_array_equal(fg, np.broadcast_to(fg[:1], fg.shape))
    ids = np.asarray(captured["id_embs"])
    # unit-normalized rows of a shared base + per-row noise: same norm,
    # not identical rows (unless B == 1)
    np.testing.assert_allclose(np.linalg.norm(ids, axis=-1), 1.0, rtol=1e-3)
    if ids.shape[0] > 1:
        assert np.abs(ids[0] - ids[1]).max() > 1e-5


def test_fit_runs_arc2face_iters(zs_tr):
    """fit() routes ARC2FACE_DISTILL plans to the zs distill step when a
    teacher is provided."""
    import json
    import os

    tr = zs_tr
    p = tr.pipe
    # force arc2face iterations
    tr.plan_cfg.arc2face_distill_iter_prob = 1.0
    tr.plan_cfg.composition_regs_iter_gap = 10**6
    start = tr.global_step
    tr.fit(num_steps=start + 2,
           arc2face_teacher=(p.unet, p.unet_params, None))
    lines = [json.loads(l) for l in
             open(os.path.join(tr.cfg.logdir, "metrics.jsonl"))]
    assert any(l.get("iter_type") == "arc2face_distill" for l in lines[-3:])
