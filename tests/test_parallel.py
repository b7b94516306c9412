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


def _tiny_backbone():
    import optax  # noqa: F401

    from adaface_tpu.models.clip_text import CLIPTextConfig, CLIPTextEncoder
    from adaface_tpu.models.unet import UNetConfig, UNetModel
    from adaface_tpu.ops.schedule import make_diffusion_schedule
    from adaface_tpu.personalization.static_embedding import (
        init_static_embedder,
    )

    T, D, HW = 16, 32, 8
    clip_cfg = CLIPTextConfig.tiny(vocab_size=256, hidden_size=D,
                                   max_position_embeddings=T,
                                   num_extra_tokens=1)
    clip = CLIPTextEncoder(clip_cfg)
    clip_params = clip.init(jax.random.PRNGKey(0),
                            input_ids=jnp.zeros((1, T), jnp.int32))["params"]
    unet_cfg = UNetConfig(model_channels=32, channel_mult=(1, 2),
                          num_res_blocks=1, attention_levels=(0, 1),
                          num_heads=4, context_dim=D,
                          use_flash_attention=False)
    unet = UNetModel(unet_cfg)
    unet_params = unet.init(jax.random.PRNGKey(1), jnp.zeros((1, HW, HW, 4)),
                            jnp.zeros((1,), jnp.int32),
                            jnp.zeros((1, 1, T, D)))["params"]
    sched = make_diffusion_schedule()
    embedders = {"z": init_static_embedder(jax.random.PRNGKey(2),
                                           num_vectors=2, emb_dim=D, rank=4)}
    return clip, clip_params, unet, unet_params, sched, embedders, (T, D, HW)


def _recon_batch(rng, B, T, HW):
    from adaface_tpu.training.train_step import ReconBatch

    ids = rng.integers(1, 250, size=(B, T)).astype(np.int32)
    ids[:, 3] = 256
    slot = np.full((B, T), -1, np.int32)
    slot[:, 3] = 0
    slot[:, 4] = 1
    return ReconBatch(
        latents=jnp.asarray(rng.standard_normal((B, HW, HW, 4)), jnp.float32),
        token_ids=jnp.asarray(ids),
        slot_maps={"z": jnp.asarray(slot)},
        fg_mask=jnp.asarray((rng.random((B, HW, HW, 1)) > 0.4), jnp.float32),
        timesteps=jnp.asarray(rng.integers(0, 1000, B), jnp.int32),
        noise=jnp.asarray(rng.standard_normal((B, HW, HW, 4)), jnp.float32),
    )


@pytest.mark.slow
def test_dreambooth_step_over_mesh():
    """VERDICT r3 #8: the DreamBooth twin-batch step (concat train+reg
    batches, `main_db.py:245-307`) has a batch layout prone to breaking
    under batch-dim sharding — run one step over the 8-device mesh."""
    import optax

    from adaface_tpu.parallel.mesh import shard_train_batch
    from adaface_tpu.training.train_step import (
        DreamBoothBatch,
        make_dreambooth_train_step,
    )

    clip, clip_params, unet, unet_params, sched, embedders, (T, D, HW) = \
        _tiny_backbone()
    mesh = make_mesh(8)
    opt = optax.adamw(1e-3)
    opt_state = opt.init(embedders)
    step = jax.jit(make_dreambooth_train_step(
        clip, clip_params, unet, unet_params, sched, opt, db_reg_weight=0.5))
    rng = np.random.default_rng(20)
    batch = DreamBoothBatch(train=_recon_batch(rng, 8, T, HW),
                            reg=_recon_batch(rng, 8, T, HW))
    emb_r = replicate_params(mesh, embedders)
    opt_r = replicate_params(mesh, opt_state)
    new_emb, _, metrics = step(emb_r, opt_r, shard_train_batch(mesh, batch))
    assert np.isfinite(float(metrics["loss"]))
    delta = float(jnp.abs(new_emb["z"].basis_rand_weights
                          - embedders["z"].basis_rand_weights).max())
    assert delta > 0


@pytest.mark.slow
@pytest.mark.parametrize("S", [1, 3])
def test_arc2face_step_over_mesh(S):
    """VERDICT r3 #8: the arc2face multi-step distill step's HALF_BS
    collapse and [S, B, ...] per-step noise layout over the 8-device mesh
    (noise shards on dim 1 via `train_batch_shardings`)."""
    import optax

    from adaface_tpu.parallel.mesh import (
        shard_train_batch,
        train_batch_shardings,
    )
    from adaface_tpu.training.train_step import (
        Arc2FaceBatch,
        make_arc2face_distill_step,
    )

    clip, clip_params, unet, unet_params, sched, embedders, (T, D, HW) = \
        _tiny_backbone()
    mesh = make_mesh(8)
    opt = optax.adamw(1e-3)
    opt_state = opt.init(embedders)
    step = jax.jit(make_arc2face_distill_step(
        clip, clip_params, unet, unet_params, unet, unet_params, sched, opt,
        num_denoising_steps=S))
    rng = np.random.default_rng(21)
    B = 8
    ids = rng.integers(1, 250, size=(B, T)).astype(np.int32)
    ids[:, 3] = 256
    slot = np.full((B, T), -1, np.int32)
    slot[:, 3] = 0
    slot[:, 4] = 1
    batch = Arc2FaceBatch(
        latents=jnp.asarray(rng.standard_normal((B, HW, HW, 4)), jnp.float32),
        teacher_context=jnp.asarray(rng.standard_normal((B, T, D)),
                                    jnp.float32),
        token_ids=jnp.asarray(ids),
        slot_maps={"z": jnp.asarray(slot)},
        timesteps=jnp.asarray(rng.integers(700, 1000, B), jnp.int32),
        noises=jnp.asarray(rng.standard_normal((S, B, HW, HW, 4)),
                           jnp.float32),
        relative_ts=jnp.asarray(rng.uniform(size=(max(S - 1, 1), B)),
                                jnp.float32),
        fg_mask=jnp.asarray(np.ones((B, HW, HW, 1)), jnp.float32),
    )
    sh = train_batch_shardings(mesh, batch)
    # the [S, B, ...] noises shard on dim 1, never the step axis
    assert sh.noises.spec == jax.sharding.PartitionSpec(None, "dp")
    emb_r = replicate_params(mesh, embedders)
    opt_r = replicate_params(mesh, opt_state)
    new_emb, _, metrics = step(emb_r, opt_r, shard_train_batch(mesh, batch))
    assert np.isfinite(float(metrics["loss"]))
    delta = float(jnp.abs(new_emb["z"].basis_rand_weights
                          - embedders["z"].basis_rand_weights).max())
    assert delta > 0


@pytest.mark.slow
@pytest.mark.parametrize("dp,tp", [(8, 1), (4, 2)])
def test_pipeline_generate_over_mesh(dp, tp):
    """`pipeline.use_mesh` (VERDICT r3 #2/#6): generate()'s batch shards
    dp over chips (+ Megatron tp of the UNet matmuls) and reproduces the
    single-device images."""
    from adaface_tpu.data.tokenizer import HashTokenizer
    from adaface_tpu.models.clip_text import CLIPTextConfig
    from adaface_tpu.models.unet import UNetConfig
    from adaface_tpu.models.vae import VAEConfig
    from adaface_tpu.pipeline import StableDiffusionPipeline

    def build():
        tok = HashTokenizer()
        return StableDiffusionPipeline.from_random(
            jax.random.PRNGKey(0), tok,
            clip_cfg=CLIPTextConfig.tiny(vocab_size=tok.vocab_size,
                                         max_position_embeddings=77,
                                         num_extra_tokens=8),
            unet_cfg=UNetConfig(model_channels=32, channel_mult=(1, 2),
                                num_res_blocks=1, attention_levels=(0, 1),
                                num_heads=4, context_dim=64,
                                use_flash_attention=False),
            vae_cfg=VAEConfig.tiny())

    prompts = ["a photo of a cat"] * 8
    ref_pipe = build()
    ref = ref_pipe.generate(prompts, num_steps=2, height=32, width=32, seed=0)

    pipe = build()
    pipe.use_mesh(dp * tp, dp=dp, tp=tp)
    out = pipe.generate(prompts, num_steps=2, height=32, width=32, seed=0)
    assert out.shape == ref.shape
    # same program modulo sharding: uint8 outputs may differ by 1 step from
    # float reassociation across shards
    assert np.abs(out.astype(int) - ref.astype(int)).max() <= 1
