"""CLIP text encoder parity vs HuggingFace torch CLIPTextModel.

A randomly-initialized small HF model is saved with torch.save, re-read
through the torch-free restricted unpickler, mapped into Flax params, and
the two implementations are compared — covering the architecture AND the
interop layer in one pass. Clip-skip blending is compared against a manual
torch reduction of output_hidden_states (the reference's
`modules.py:361-372` semantics).
"""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

transformers = pytest.importorskip("transformers")
from transformers import CLIPTextConfig as HFConfig
from transformers import CLIPTextModel

from adaface_tpu.models.clip_text import CLIPTextConfig, CLIPTextEncoder
from adaface_tpu.interop.torch_pickle import load_torch_checkpoint
from adaface_tpu.interop.hf_clip import map_clip_text_params

# oracle-parity / integration battery: minutes of compile; run with -m slow
pytestmark = pytest.mark.slow

CFG = dict(vocab_size=99, hidden_size=64, num_hidden_layers=3, num_attention_heads=4,
           intermediate_size=128, max_position_embeddings=16, hidden_act="quick_gelu")


@pytest.fixture(scope="module")
def hf_model():
    torch.manual_seed(0)
    return CLIPTextModel(HFConfig(**CFG)).eval()


@pytest.fixture(scope="module")
def jx(hf_model, tmp_path_factory):
    path = tmp_path_factory.mktemp("ckpt") / "clip.pt"
    torch.save(hf_model.state_dict(), str(path))
    sd = load_torch_checkpoint(str(path))
    params = map_clip_text_params(sd, num_layers=3)
    cfg = CLIPTextConfig.tiny(num_layers=3)
    model = CLIPTextEncoder(cfg)
    return model, {"params": params}


def _ids():
    rng = np.random.default_rng(1)
    return rng.integers(0, 99, size=(2, 16), dtype=np.int64)


def test_last_hidden_state_parity(hf_model, jx):
    model, variables = jx
    ids = _ids()
    with torch.no_grad():
        ref = hf_model(input_ids=torch.tensor(ids)).last_hidden_state.numpy()
    out = model.apply(variables, input_ids=jnp.asarray(ids), num_skip_layers=1)
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-5)


def test_clip_skip_parity(hf_model, jx):
    model, variables = jx
    ids = _ids()
    w = [0.3, 0.7]
    with torch.no_grad():
        hs = hf_model(input_ids=torch.tensor(ids), output_hidden_states=True).hidden_states
        # hs = (emb, layer1, layer2, layer3); last-2 = (layer2, layer3)
        blend = 0.3 * hs[-2] + 0.7 * hs[-1]
        ref = hf_model.text_model.final_layer_norm(blend).numpy()
    out = model.apply(variables, input_ids=jnp.asarray(ids),
                      skip_weights=jnp.asarray(w), num_skip_layers=2)
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-5)


def test_skip_weights_normalized(hf_model, jx):
    model, variables = jx
    ids = _ids()
    a = model.apply(variables, input_ids=jnp.asarray(ids),
                    skip_weights=jnp.asarray([1.0, 1.0]), num_skip_layers=2)
    b = model.apply(variables, input_ids=jnp.asarray(ids),
                    skip_weights=jnp.asarray([0.5, 0.5]), num_skip_layers=2)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_vocab_extension():
    import jax

    cfg = CLIPTextConfig.tiny(num_extra_tokens=3)
    model = CLIPTextEncoder(cfg)
    ids = jnp.array([[1, 98, 99, 100, 101, 5, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0]])
    variables = model.init(jax.random.PRNGKey(0), input_ids=ids)
    embs = model.apply(variables, ids, method=CLIPTextEncoder.embed_tokens)
    base_table = variables["params"]["token_embedding"]["embedding"]
    extra_table = variables["params"]["extra_token_embedding"]["embedding"]
    np.testing.assert_allclose(np.asarray(embs[0, 1]), np.asarray(base_table[98]), atol=1e-6)
    np.testing.assert_allclose(np.asarray(embs[0, 2]), np.asarray(extra_table[0]), atol=1e-6)
    np.testing.assert_allclose(np.asarray(embs[0, 4]), np.asarray(extra_table[2]), atol=1e-6)


def test_pre_patched_embeds_bypass_lookup(hf_model, jx):
    """The personalization hook: passing patched input_embeds must equal
    patching at the token-embedding output (before position add)."""
    model, variables = jx
    ids = _ids()
    embs = model.apply(variables, jnp.asarray(ids), method=CLIPTextEncoder.embed_tokens)
    patched = embs.at[:, 3].set(0.25)
    out1 = model.apply(variables, input_embeds=patched, num_skip_layers=1)
    # reference behavior: inputs_embeds overridden pre-position-add
    # (CLIPTextModel has no inputs_embeds kwarg, so drive the submodules)
    with torch.no_grad():
        tm = hf_model.text_model
        te = tm.embeddings.token_embedding(torch.tensor(ids))
        te[:, 3] = 0.25
        h = te + tm.embeddings.position_embedding(torch.arange(ids.shape[1]))
        causal = torch.triu(
            torch.full((ids.shape[1], ids.shape[1]), float("-inf")), diagonal=1
        )[None, None]
        enc = tm.encoder(inputs_embeds=h, causal_attention_mask=causal)
        ref = tm.final_layer_norm(enc.last_hidden_state).numpy()
    np.testing.assert_allclose(np.asarray(out1), ref, atol=2e-5)
