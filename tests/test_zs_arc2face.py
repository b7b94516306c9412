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


def _plan(S, rand_face):
    class Plan:
        num_denoising_steps = S
        gen_arc2face_rand_face = rand_face
        training_percent = 0.1
        iter_type = "arc2face_distill"
        use_background_token = False

    return Plan()


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
    assert any(l["iter_type"] == "arc2face_distill" for l in lines[-2:])
