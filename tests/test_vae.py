"""VAE parity vs the reference's torch Encoder/Decoder (used as an oracle,
random init, weights carried over through the interop mapper)."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from adaface_tpu.models.vae import AutoencoderKL, VAEConfig
from adaface_tpu.interop.sd_vae import map_vae_params
from tests.reference_oracle import reference_available, import_reference_module

pytestmark = pytest.mark.skipif(not reference_available(), reason="reference tree absent")

CFG = VAEConfig.tiny()  # ch=32, mult (1,2), 1 res block, z=4


@pytest.fixture(scope="module")
def torch_vae():
    m = import_reference_module("ldm.models.autoencoder")
    torch.manual_seed(0)
    ddconfig = dict(
        double_z=True, z_channels=CFG.z_channels, resolution=32,
        in_channels=3, out_ch=3, ch=CFG.ch, ch_mult=list(CFG.ch_mult),
        num_res_blocks=CFG.num_res_blocks, attn_resolutions=[], dropout=0.0,
    )
    vae = m.AutoencoderKL(ddconfig=ddconfig, lossconfig={"target": "torch.nn.Identity"},
                          embed_dim=CFG.embed_dim)
    return vae.eval()


@pytest.fixture(scope="module")
def jax_vae(torch_vae):
    sd = {k: v.numpy() for k, v in torch_vae.state_dict().items()}
    params = map_vae_params(sd, CFG, prefix="")
    return AutoencoderKL(CFG), {"params": params}


def test_encode_parity(torch_vae, jax_vae, rng):
    model, variables = jax_vae
    x = rng.standard_normal((2, 32, 32, 3)).astype(np.float32)
    mean, logvar = model.apply(variables, jnp.asarray(x), method=AutoencoderKL.encode)
    with torch.no_grad():
        post = torch_vae.encode(torch.tensor(x).permute(0, 3, 1, 2))
    ref_mean = post.mean.permute(0, 2, 3, 1).numpy()
    ref_logvar = post.logvar.permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(np.asarray(mean), ref_mean, atol=2e-4)
    np.testing.assert_allclose(np.asarray(logvar), ref_logvar, atol=2e-4)


def test_decode_parity(torch_vae, jax_vae, rng):
    model, variables = jax_vae
    z = rng.standard_normal((2, 16, 16, CFG.embed_dim)).astype(np.float32)
    out = model.apply(variables, jnp.asarray(z), method=AutoencoderKL.decode)
    with torch.no_grad():
        ref = torch_vae.decode(torch.tensor(z).permute(0, 3, 1, 2))
    ref = ref.permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(np.asarray(out), ref, atol=5e-4)


def test_masked_encode_differs_and_matches_oracle(torch_vae, jax_vae, rng):
    """fg/aug-masked attention: parity vs the reference's masked AttnBlock
    path (`model.py:179-246`) and sanity that masking changes the output."""
    model, variables = jax_vae
    x = rng.standard_normal((1, 32, 32, 3)).astype(np.float32)
    fg = (rng.random((1, 32, 32, 1)) > 0.5).astype(np.float32)
    aug = np.ones((1, 32, 32, 1), dtype=np.float32)
    mean, _ = model.apply(variables, jnp.asarray(x), jnp.asarray(fg), jnp.asarray(aug),
                          method=AutoencoderKL.encode)
    mean_nomask, _ = model.apply(variables, jnp.asarray(x), method=AutoencoderKL.encode)
    assert not np.allclose(np.asarray(mean), np.asarray(mean_nomask), atol=1e-5)
    with torch.no_grad():
        mask = {
            "fg_mask": torch.tensor(fg).permute(0, 3, 1, 2),
            "aug_mask": torch.tensor(aug).permute(0, 3, 1, 2),
        }
        post = torch_vae.encode(torch.tensor(x).permute(0, 3, 1, 2), mask=mask)
    ref_mean = post.mean.permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(np.asarray(mean), ref_mean, atol=2e-4)


def test_roundtrip_shapes(jax_vae):
    model, variables = jax_vae
    x = jnp.zeros((1, 32, 32, 3))
    recon, mean, logvar = model.apply(variables, x, jax.random.PRNGKey(0))
    assert recon.shape == (1, 32, 32, 3)
    assert mean.shape == (1, 16, 16, CFG.embed_dim)


def test_chunked_mid_attention_matches_einsum():
    """The decode-path query-chunked attention (no [L, L] logits
    materialization) is exactly the einsum attention."""
    import jax

    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((1, 32, 32, 64)), jnp.float32)
    from adaface_tpu.models.vae import AttnBlock

    blk = AttnBlock(use_flash=True)
    p = blk.init(jax.random.PRNGKey(0), x)["params"]
    a = blk.apply({"params": p}, x)
    b = AttnBlock(use_flash=False).apply({"params": p}, x)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
