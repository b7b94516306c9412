"""LitEma-equivalent EMA: warmup decay, shadow tracking, eval scope."""

import numpy as np

import jax.numpy as jnp

from adaface_tpu.training.ema import (
    ema_init,
    ema_params,
    ema_scope,
    ema_update,
)


def test_warmup_decay_matches_litema():
    """Effective decay = min(decay, (1+n)/(10+n)) (`ldm/modules/ema.py`)."""
    p0 = {"w": jnp.zeros((3,))}
    st = ema_init(p0)
    p1 = {"w": jnp.ones((3,))}
    st = ema_update(st, p1, decay=0.9999)
    # n=1 -> d = 2/11; shadow = 0 - (1 - d)(0 - 1) = 9/11
    np.testing.assert_allclose(np.asarray(st.shadow["w"]), 9 / 11, rtol=1e-6)
    st = ema_update(st, p1, decay=0.9999)
    d2 = 3 / 12
    want = 9 / 11 - (1 - d2) * (9 / 11 - 1)
    np.testing.assert_allclose(np.asarray(st.shadow["w"]), want, rtol=1e-6)


def test_ema_scope_swaps_and_restores():
    class Holder:
        params = {"w": jnp.full((2,), 5.0)}

    h = Holder()
    st = ema_init({"w": jnp.zeros((2,))})
    with ema_scope(h, "params", st):
        np.testing.assert_array_equal(np.asarray(h.params["w"]), 0.0)
    np.testing.assert_array_equal(np.asarray(h.params["w"]), 5.0)

    # restore even on exception
    try:
        with ema_scope(h, "params", st):
            raise RuntimeError("boom")
    except RuntimeError:
        pass
    np.testing.assert_array_equal(np.asarray(h.params["w"]), 5.0)

    # None state is a no-op scope (use_ema=False path)
    with ema_scope(h, "params", None):
        np.testing.assert_array_equal(np.asarray(h.params["w"]), 5.0)


def test_ema_params_returns_shadow():
    st = ema_init({"w": jnp.ones((2,))})
    assert ema_params(st) is st.shadow
