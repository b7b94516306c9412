"""Full-width zero-shot golden chain (VERDICT r3 item 4).

The flagship ("AdaFace") conditioning path at the REAL Arc2Face widths —
a 12-layer / 768-hidden / 49408-vocab CLIPTextModelWrapper and a full-size
SubjBasisGenerator — certified against the reference with random weights,
strict fp32:

1. ArcFace id embedding -> `arc2face_forward_face_embs` (`ldm/util.py:
   1085-1131`) vs our `forward_face_embs` on interop-mapped params.
2. Reference `SubjBasisGenerator` (`ldm/modules/subj_basis_generator.py:
   369-560`, prompt2token_proj at full depth so the last-3-hidden-state
   layer weighting runs at real indices) -> `torch.save` in the
   `embeddings.pt` layout -> `EmbeddingManager.load_reference_checkpoint`
   -> identical generated embeddings (`embedding_manager.py:1407-1499`).

The static path's golden chain + full-SD-width interop battery already
certify the encode/patch machinery downstream of the subject embeddings;
this closes the zero-shot branch at width (round 3 certified it at
reduced width only).
"""

import numpy as np
import pytest

import jax.numpy as jnp

torch = pytest.importorskip("torch")

import tests.test_subj_basis_interop as tsi
from tests.reference_oracle import import_reference_module, reference_available

pytestmark = [
    pytest.mark.slow,
    pytest.mark.skipif(not reference_available(), reason="reference absent"),
]

VOCAB, N_LAYERS, HEADS, INTER, D = 49408, 12, 12, 3072, 768


def _fullwidth(monkeypatch):
    monkeypatch.setattr(tsi, "VOCAB", VOCAB)
    monkeypatch.setattr(tsi, "N_LAYERS", N_LAYERS)
    monkeypatch.setattr(tsi, "HEADS", HEADS)
    monkeypatch.setattr(tsi, "INTER", INTER)
    monkeypatch.setattr(tsi, "PAD_ID", VOCAB - 1)
    return tsi._import_ref_sbg(monkeypatch)


def test_full_width_forward_face_embs_parity(monkeypatch):
    """Chain leg 1: id emb -> padded token splice -> full-depth encode."""
    _fullwidth(monkeypatch)
    import transformers

    from adaface_tpu.interop.hf_clip import map_clip_text_params
    from adaface_tpu.models.clip_text import CLIPTextConfig, CLIPTextEncoder
    from adaface_tpu.personalization.arc2face import forward_face_embs

    util = import_reference_module("ldm.util")
    arc2face_models = import_reference_module("ldm.modules.arc2face_models")

    cfg_t = transformers.CLIPTextConfig(
        vocab_size=VOCAB, hidden_size=D, num_hidden_layers=N_LAYERS,
        num_attention_heads=HEADS, intermediate_size=INTER,
        max_position_embeddings=77)
    torch.manual_seed(0)
    enc_t = arc2face_models.CLIPTextModelWrapper(cfg_t).eval()

    ID_TOKEN = 1000
    ids_row = [VOCAB - 2, 10, 11, 12, ID_TOKEN, 13, VOCAB - 1] \
        + [VOCAB - 1] * 70  # BOS 'photo of a' id 'person' EOS pads

    class Tok:
        def encode(self, s, add_special_tokens=False):
            return [ID_TOKEN]

        def __call__(self, prompts, **kw):
            import types

            n = 1 if isinstance(prompts, str) else len(prompts)
            out = types.SimpleNamespace()
            out.input_ids = torch.tensor([ids_row] * n)
            return out

    rng = np.random.default_rng(0)
    face = rng.standard_normal((2, 512)).astype(np.float32)
    face /= np.linalg.norm(face, axis=-1, keepdims=True)
    with torch.no_grad():
        full_t, core_t = util.arc2face_forward_face_embs(
            Tok(), enc_t, torch.tensor(face))

    sd = {k: v.numpy() for k, v in enc_t.state_dict().items()}
    params = map_clip_text_params(sd, num_layers=N_LAYERS)
    enc = CLIPTextEncoder(CLIPTextConfig())  # real ViT-L/14 text defaults
    full, core = forward_face_embs(
        enc, params, jnp.asarray(face),
        template_ids=jnp.asarray(np.asarray([ids_row], np.int32)),
        arcface_token_id=ID_TOKEN,
        skip_weights=jnp.asarray([0.0, 1.0]))  # = HF last_hidden_state
    np.testing.assert_allclose(np.asarray(full), full_t.numpy(),
                               rtol=2e-3, atol=2e-4)
    np.testing.assert_allclose(np.asarray(core), core_t.numpy(),
                               rtol=2e-3, atol=2e-4)


def test_full_width_subj_basis_ckpt_chain(monkeypatch, tmp_path):
    """Chain leg 2: full-size generator -> embeddings.pt ->
    load_reference_checkpoint -> identical (out, inverse) embeddings."""
    ref_sbg, cfg, template_ids = _fullwidth(monkeypatch)

    torch.manual_seed(0)
    ref_gen = ref_sbg.SubjBasisGenerator(
        num_out_embs_per_layer=16, num_out_layers=16, output_dim=D)
    ref_gen.eval()
    assert ref_gen.prompt2token_proj.config.num_hidden_layers == N_LAYERS

    B = 2
    arc_embs_t = torch.randn(B, 16, D) * 0.05
    with torch.no_grad():
        ref_out, ref_inv = ref_gen(
            clip_features=torch.zeros(B, 1, 1), raw_id_embs=None,
            arc2face_id_embs=arc_embs_t, out_id_embs_scale=0.9,
            is_face=True, is_training=True)

    ckpt_path = tmp_path / "embeddings_gs-1.pt"
    torch.save({
        "string_to_token": {"z": torch.tensor(VOCAB)},
        "string_to_static_embedder": torch.nn.ParameterDict(),
        "string_to_subj_basis_generator_dict": torch.nn.ModuleDict(
            {"z": ref_gen}),
        "token2num_vectors": {"z": 16},
        "placeholder_strings": ["z"],
        "subject_strings": ["z"],
        "background_strings": [],
        "do_zero_shot": True,
    }, str(ckpt_path))

    from adaface_tpu.personalization.embedding_manager import EmbeddingManager

    mgr = EmbeddingManager()
    mgr.load_reference_checkpoint(str(ckpt_path))
    gen, params = mgr.subj_basis_generators["z"]
    assert gen.proj_cfg.num_layers == N_LAYERS
    assert gen.proj_cfg.intermediate_size == INTER
    assert gen.proj_cfg.vocab_size == VOCAB

    out, inv = gen.apply(
        {"params": params}, None, None,
        jnp.asarray(arc_embs_t.numpy()), out_id_embs_scale=0.9,
        is_face=True, is_training=True,
        inverse_template_ids=jnp.asarray(template_ids.astype(np.int32)))
    np.testing.assert_allclose(np.asarray(out), ref_out.numpy(),
                               atol=3e-5, rtol=2e-3)
    np.testing.assert_allclose(np.asarray(inv), ref_inv.numpy(),
                               atol=3e-5, rtol=2e-3)
