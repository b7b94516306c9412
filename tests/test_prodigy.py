"""Prodigy optimizer parity vs the reference torch implementation on a toy
quadratic, plus schedule shape tests."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp
import optax

from adaface_tpu.training.prodigy import prodigy
from adaface_tpu.training.schedules import (
    lambda_warmup_cosine, prodigy_cycle_schedule, onecycle_schedule,
)
from tests.reference_oracle import reference_available, import_reference_module


@pytest.mark.skipif(not reference_available(), reason="reference tree absent")
def test_prodigy_matches_reference_on_quadratic():
    m = import_reference_module("ldm.prodigy")
    rng = np.random.default_rng(0)
    w0 = rng.standard_normal(16).astype(np.float32)
    target = rng.standard_normal(16).astype(np.float32)

    # torch side
    wt = torch.nn.Parameter(torch.tensor(w0.copy()))
    opt = m.Prodigy([wt], lr=1.0, d_coef=10.0, betas=(0.9, 0.999),
                    weight_decay=0.0, use_bias_correction=False)
    torch_traj = []
    for i in range(12):
        opt.zero_grad()
        loss = 0.5 * ((wt - torch.tensor(target)) ** 2).sum()
        loss.backward()
        opt.step()
        torch_traj.append(wt.detach().numpy().copy())

    # jax side
    tx = prodigy(learning_rate=1.0, d_coef=10.0, betas=(0.9, 0.999))
    params = {"w": jnp.asarray(w0)}
    state = tx.init(params)
    jax_traj = []
    loss_fn = lambda p: 0.5 * jnp.sum((p["w"] - jnp.asarray(target)) ** 2)
    for i in range(12):
        grads = jax.grad(loss_fn)(params)
        updates, state = tx.update(grads, state, params)
        params = optax.apply_updates(params, updates)
        jax_traj.append(np.asarray(params["w"]))

    for i in (0, 3, 11):
        np.testing.assert_allclose(jax_traj[i], torch_traj[i], rtol=2e-4, atol=1e-6)


def test_prodigy_d_grows():
    tx = prodigy(learning_rate=1.0, d_coef=1.0)
    params = {"w": jnp.ones(8)}
    state = tx.init(params)
    d0 = float(state.d)
    loss_fn = lambda p: jnp.sum(jnp.square(p["w"] - 5.0))
    for _ in range(5):
        grads = jax.grad(loss_fn)(params)
        updates, state = tx.update(grads, state, params)
        params = optax.apply_updates(params, updates)
    assert float(state.d) > d0  # D-adaptation kicked in
    assert np.isfinite(float(loss_fn(params)))


def test_prodigy_schedule_multiplier():
    sched = prodigy_cycle_schedule(warm_up_steps=500, max_steps=2000,
                                   scheduler_type="Linear", num_cycles=2)
    np.testing.assert_allclose(float(sched(0)), 1.0)
    np.testing.assert_allclose(float(sched(499)), 1.0)
    np.testing.assert_allclose(float(sched(500)), 1.0, atol=1e-5)
    # end of first cycle (750 steps): 1 - 750/825 ~ 0.0909 floor
    v = float(sched(500 + 749))
    assert 0.09 <= v <= 0.12
    # cycle restart
    np.testing.assert_allclose(float(sched(500 + 751)), 1.0 - 1 / 825, atol=1e-2)


def test_cyclic_starts_at_top():
    sched = prodigy_cycle_schedule(warm_up_steps=0, max_steps=1500,
                                   scheduler_type="CyclicLR", num_cycles=2)
    np.testing.assert_allclose(float(sched(0)), 1.0, atol=1e-3)  # top of triangle
    mid = float(sched(250))
    assert mid < 1.0


def test_warmup_cosine_shape():
    sched = lambda_warmup_cosine(warm_up_steps=100, lr_min=0.0, lr_max=1.0,
                                 lr_start=0.01, max_decay_steps=1000)
    assert float(sched(0)) == pytest.approx(0.01)
    assert float(sched(100)) == pytest.approx(1.0, abs=1e-2)
    assert float(sched(1000)) == pytest.approx(0.0, abs=1e-6)


def test_onecycle_shape():
    sched = onecycle_schedule(max_lr=1.0, total_steps=1000)
    assert float(sched(0)) == pytest.approx(0.1)
    assert float(sched(300)) == pytest.approx(1.0, abs=1e-3)
    assert float(sched(1000)) == pytest.approx(0.1, abs=1e-3)
