"""Mesh/sharding units on the 8-virtual-device CPU mesh (conftest sets
--xla_force_host_platform_device_count=8).

ZeRO-1 optimizer-state sharding is beyond the reference (Lightning DDP
replicates optimizer state per rank, SURVEY §2.8); it is what lets the
zero-shot flagship mode (123M-param generator, ~4x123M fp32 Prodigy state,
single-chip OOM at batch 6 per PERF.md) scale on a dp mesh.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from adaface_tpu.parallel.mesh import (
    make_mesh,
    replicate_params,
    shard_opt_state,
    zero1_sharding_rules,
)

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs the 8-device virtual mesh")


def test_zero1_sharding_rules_pick_largest_divisible_axis():
    mesh = make_mesh(8)
    state = {
        "big": jnp.zeros((1024, 384)),     # dim0 largest, divisible by 8
        "odd": jnp.zeros((1023, 8 * 13)),  # only dim1 divisible
        "tiny": jnp.zeros((4, 4)),         # below min_elems -> replicated
        "scalar": jnp.zeros(()),
    }
    rules = zero1_sharding_rules(mesh, state)
    assert rules["big"].spec == jax.sharding.PartitionSpec("dp", None)
    assert rules["odd"].spec == jax.sharding.PartitionSpec(None, "dp")
    assert rules["tiny"].spec == jax.sharding.PartitionSpec()
    assert rules["scalar"].spec == jax.sharding.PartitionSpec()


def test_zero1_prodigy_step_matches_replicated():
    import optax

    from adaface_tpu.training.prodigy import prodigy

    mesh = make_mesh(8)
    opt = prodigy(learning_rate=1.0, d_coef=10.0)
    params = {"w": jnp.asarray(
        np.random.default_rng(0).standard_normal((1024, 256)), jnp.float32)}
    target = jnp.ones((1024, 256), jnp.float32)

    def step(p, s):
        grads = jax.grad(lambda q: jnp.mean((q["w"] - target) ** 2))(p)
        upd, s = opt.update(grads, s, p)
        return optax.apply_updates(p, upd), s

    jstep = jax.jit(step)

    # replicated run
    with mesh:
        p_r = replicate_params(mesh, params)
        s_r = opt.init(p_r)
        p1_r, _ = jstep(p_r, s_r)

    # ZeRO-1-sharded optimizer state run
    with mesh:
        p_z = replicate_params(mesh, params)
        s_z = shard_opt_state(mesh, opt.init(p_z), min_elems=1024)
        p1_z, s1_z = jstep(p_z, s_z)

    np.testing.assert_allclose(np.asarray(p1_r["w"]), np.asarray(p1_z["w"]),
                               rtol=1e-6, atol=1e-6)
    # the big state leaves stay sharded through the update
    sharded = [l for l in jax.tree_util.tree_leaves(s1_z)
               if hasattr(l, "sharding") and l.size >= 1024
               and not l.sharding.is_fully_replicated]
    assert sharded, "no optimizer-state leaf remained dp-sharded"
