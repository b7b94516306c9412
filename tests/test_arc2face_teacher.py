"""Arc2Face teacher assembly: diffusers-ckpt load -> teacher triple -> one
distillation step (`ddpm.py:5398-5475` parity surface)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from adaface_tpu.data.tokenizer import HashTokenizer
from adaface_tpu.models.unet import UNetConfig
from adaface_tpu.training.arc2face_teacher import (
    Arc2FaceTeacher,
    load_arc2face_teacher,
)

torch = pytest.importorskip("torch")

D_CTX = 16


@pytest.fixture(scope="module")
def teacher_ckpts(tmp_path_factory):
    """Synthetic diffusers UNet .bin + CLIPTextModel state dict on disk."""
    from tests.test_diffusers_unet import synth_diffusers_sd

    tmp = tmp_path_factory.mktemp("a2f")
    ucfg = UNetConfig.sd_v1(model_channels=32, context_dim=D_CTX)
    sd = synth_diffusers_sd(ucfg)
    unet_path = tmp / "diffusion_pytorch_model.bin"
    torch.save({k: torch.tensor(v) for k, v in sd.items()}, str(unet_path))

    rng = np.random.RandomState(0)
    r = lambda *s: rng.randn(*s).astype(np.float32) * 0.02
    tok = HashTokenizer()
    enc_sd = {
        "text_model.embeddings.token_embedding.weight": r(tok.vocab_size, D_CTX),
        "text_model.embeddings.position_embedding.weight": r(77, D_CTX),
        "text_model.final_layer_norm.weight": r(D_CTX) + 1,
        "text_model.final_layer_norm.bias": r(D_CTX),
    }
    for i in range(2):
        lp = f"text_model.encoder.layers.{i}."
        for nm in ("q_proj", "k_proj", "v_proj", "out_proj"):
            enc_sd[lp + f"self_attn.{nm}.weight"] = r(D_CTX, D_CTX)
            enc_sd[lp + f"self_attn.{nm}.bias"] = r(D_CTX)
        enc_sd[lp + "mlp.fc1.weight"] = r(32, D_CTX)
        enc_sd[lp + "mlp.fc1.bias"] = r(32)
        enc_sd[lp + "mlp.fc2.weight"] = r(D_CTX, 32)
        enc_sd[lp + "mlp.fc2.bias"] = r(D_CTX)
        for nm in ("layer_norm1", "layer_norm2"):
            enc_sd[lp + nm + ".weight"] = r(D_CTX) + 1
            enc_sd[lp + nm + ".bias"] = r(D_CTX)
    enc_path = tmp / "pytorch_model.bin"
    torch.save({k: torch.tensor(v) for k, v in enc_sd.items()}, str(enc_path))
    return str(unet_path), str(enc_path), ucfg, tok


def test_load_and_ctx_shapes(teacher_ckpts):
    unet_path, enc_path, ucfg, tok = teacher_ckpts
    teacher = load_arc2face_teacher(unet_path, enc_path, tok,
                                    unet_cfg=ucfg)
    assert teacher.encoder.cfg.hidden_size == D_CTX
    assert teacher.encoder.cfg.num_layers == 2

    class Plan:
        gen_arc2face_rand_face = True

    exs = [{"image_unnorm": np.zeros((8, 8, 3), np.uint8)} for _ in range(2)]
    ctx = teacher.ctx(exs, Plan())
    assert ctx.shape == (2, 77, D_CTX)
    assert np.isfinite(np.asarray(ctx)).all()

    unet, params, ctx_fn = teacher.as_tuple()
    eps = unet.apply({"params": params}, jnp.zeros((2, 16, 16, 4)),
                     jnp.zeros((2,), jnp.int32), ctx[None])
    assert eps.shape == (2, 16, 16, 4)


def test_real_face_path_uses_embed_fn(teacher_ckpts):
    unet_path, enc_path, ucfg, tok = teacher_ckpts
    calls = []

    def embed(img):
        calls.append(img.shape)
        return np.ones(512, np.float32)

    teacher = load_arc2face_teacher(unet_path, enc_path, tok,
                                    face_embed_fn=embed, unet_cfg=ucfg)

    class Plan:
        gen_arc2face_rand_face = False

    exs = [{"image_unnorm": np.zeros((8, 8, 3), np.uint8)}]
    ctx = teacher.ctx(exs, Plan())
    assert calls == [(8, 8, 3)]
    assert ctx.shape == (1, 77, D_CTX)
