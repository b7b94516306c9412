"""End-to-end fp32 golden-parity test (VERDICT round-2 item 7; BASELINE
config 1 semantics at reduced width).

Composes the REFERENCE's own modules — FrozenCLIPEmbedder (the hijacked HF
CLIP with clip-skip), EmbeddingManager (static layerwise embedders),
UNetModel, DDIMSampler (annealed CFG) and AutoencoderKL — at reduced width
on CPU fp32, and asserts the full repo pipeline (tokenize -> checkpoint
import -> placeholder patch -> encode -> DDIM-10 -> VAE decode) produces
the same image. This certifies the patching/clip-skip/CFG chain JOINTLY,
not per-module.

Both sides share one deterministic tokenizer (our HashTokenizer wrapped in
an HF-shaped shim) and identical weights (reference state dicts mapped
through interop). The embedding path goes through the reference's saved
`embeddings.pt` -> `load_reference_checkpoint`, so checkpoint interop is in
the certified chain too.
"""

import sys
import types

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from adaface_tpu.data.tokenizer import HashTokenizer

sys.path.insert(0, "/root/repo/tests")
from reference_oracle import import_reference_module, reference_available

pytestmark = [
    pytest.mark.slow,
    pytest.mark.skipif(not reference_available(), reason="reference absent"),
]

D = 128
N_LAYERS = 3
HEADS = 4
INTER = 256
K = 4
LAT, IMG = 16, 32
NEG = "ugly, blurry"
PROMPT = "a photo of a sks , , , person"
SCALE = 0.18215


class TokShim:
    """HF-CLIPTokenizer-shaped wrapper over our HashTokenizer so both
    frameworks tokenize identically (CLIP id conventions: BOS 49406,
    EOS/pad 49407 — `get_clip_tokens_for_string` hard-codes them)."""

    def __init__(self, tok):
        self.tok = tok
        self.pad_token_id = tok.eos_id

    def __call__(self, text, **kw):
        texts = [text] if isinstance(text, str) else list(text)
        ids = self.tok(texts, max_length=kw.get("max_length", 77))
        return {"input_ids": torch.tensor(ids.astype(np.int64)),
                "length": torch.tensor([ids.shape[1]] * len(texts))}


@pytest.fixture(scope="module")
def chain(tmp_path_factory, ):
    tmp = tmp_path_factory.mktemp("golden")
    tok = HashTokenizer()

    import transformers

    hf_cfg = transformers.CLIPTextConfig(
        vocab_size=tok.vocab_size, hidden_size=D, num_hidden_layers=N_LAYERS,
        num_attention_heads=HEADS, intermediate_size=INTER,
        max_position_embeddings=77)
    shim = TokShim(tok)
    orig_tok_fp = transformers.CLIPTokenizer.from_pretrained
    orig_txt_fp = transformers.CLIPTextModel.from_pretrained
    transformers.CLIPTokenizer.from_pretrained = classmethod(
        lambda cls, *a, **k: shim)
    transformers.CLIPTextModel.from_pretrained = classmethod(
        lambda cls, *a, **k: cls(hf_cfg))
    try:
        enc_mod = import_reference_module("ldm.modules.encoders.modules")
        torch.manual_seed(0)
        ref_clip = enc_mod.FrozenCLIPEmbedder(
            device="cpu", last_layers_skip_weights=[0.5, 0.5])
        ref_clip.eval()

        m = import_reference_module("ldm.modules.embedding_manager")
        ref_mgr = m.EmbeddingManager(
            text_embedder=ref_clip, subject_strings=["sks"],
            background_strings=None, initializer_strings=["person"],
            list_initializer_word_weights=[None],
            token2num_vectors={"sks": K}, out_emb_dim=D,
            layerwise_lora_rank=5, do_zero_shot=False)
        ref_mgr.eval()
        with torch.no_grad():
            for emb in ref_mgr.string_to_static_embedder_dict.values():
                emb.bias.data = torch.randn_like(emb.bias) * 0.05
                emb.basis_rand_weights.data = (
                    torch.randn_like(emb.basis_rand_weights) * 0.3)
    finally:
        transformers.CLIPTokenizer.from_pretrained = orig_tok_fp
        transformers.CLIPTextModel.from_pretrained = orig_txt_fp

    om = import_reference_module("ldm.modules.diffusionmodules.openaimodel")
    torch.manual_seed(1)
    ref_unet = om.UNetModel(
        image_size=LAT, in_channels=4, out_channels=4, model_channels=32,
        attention_resolutions=[4, 2, 1], num_res_blocks=2,
        channel_mult=[1, 2, 4, 4], num_heads=4, use_spatial_transformer=True,
        transformer_depth=1, context_dim=D, use_checkpoint=False,
        legacy=False).eval()

    av = import_reference_module("ldm.models.autoencoder")
    torch.manual_seed(2)
    ref_vae = av.AutoencoderKL(
        ddconfig=dict(double_z=True, z_channels=4, resolution=64,
                      in_channels=3, out_ch=3, ch=32, ch_mult=[1, 2],
                      num_res_blocks=1, attn_resolutions=[], dropout=0.0),
        lossconfig={"target": "torch.nn.Identity"}, embed_dim=4).eval()
    return tok, ref_clip, ref_mgr, ref_unet, ref_vae, tmp


def _reference_image(chain, x_T):
    """The reference chain: hijacked encode -> DDIMSampler -> VAE decode."""
    tok, ref_clip, ref_mgr, ref_unet, ref_vae, _ = chain
    from adaface_tpu.ops.schedule import make_diffusion_schedule

    base = make_diffusion_schedule()

    def extra_info():
        return dict(use_layerwise_context=True, iter_type="normal_recon",
                    is_training=False, capture_distill_attn=False,
                    use_conv_attn_kernel_size=-1, placeholder2indices=None,
                    img_mask=None, compel_cfg_weight_level_range=None,
                    apply_compel_cfg_prob=0, empty_context=None,
                    debug_attn=False)

    class FakeLDM(torch.nn.Module):
        def __init__(self):
            super().__init__()
            t = lambda a: torch.tensor(np.asarray(a))
            self.register_buffer("betas", t(base.betas))
            self.register_buffer("alphas_cumprod", t(base.alphas_cumprod))
            self.register_buffer("alphas_cumprod_prev",
                                 t(base.alphas_cumprod_prev))
            self.num_timesteps = 1000
            self.device = torch.device("cpu")

        def apply_model(self, x, t, c):
            return ref_unet(x, t, context=c, extra_info=extra_info())

    with torch.no_grad():
        c = ref_clip.encode([PROMPT], embedding_manager=ref_mgr)
        uc = ref_clip.encode([NEG], embedding_manager=ref_mgr)

    dm = import_reference_module("ldm.models.diffusion.ddim")
    sampler = dm.DDIMSampler(FakeLDM())
    sampler.register_buffer = lambda name, attr: setattr(sampler, name, attr)
    with torch.no_grad():
        x0, _ = sampler.sample(S=10, batch_size=1, shape=(4, LAT, LAT),
                               conditioning=c, guidance_scale=[10.0, 4.0],
                               unconditional_conditioning=uc,
                               x_T=torch.tensor(x_T), verbose=False)
        img = ref_vae.decode(x0 / SCALE)
    return torch.clamp((img + 1) / 2, 0, 1).permute(0, 2, 3, 1).numpy()


def _our_image(chain, x_T):
    """The repo pipeline with weights mapped from the same torch modules and
    embeddings imported from the reference's own checkpoint format."""
    tok, ref_clip, ref_mgr, ref_unet, ref_vae, tmp = chain
    from adaface_tpu.interop.hf_clip import map_clip_text_params
    from adaface_tpu.interop.sd_unet import map_unet_params
    from adaface_tpu.interop.sd_vae import map_vae_params
    from adaface_tpu.models.clip_text import CLIPTextConfig, CLIPTextEncoder
    from adaface_tpu.models.unet import UNetConfig, UNetModel
    from adaface_tpu.models.vae import AutoencoderKL, VAEConfig
    from adaface_tpu.ops.schedule import make_diffusion_schedule
    from adaface_tpu.personalization.embedding_manager import EmbeddingManager
    from adaface_tpu.pipeline import StableDiffusionPipeline

    asarray = lambda t: jax.tree_util.tree_map(jnp.asarray, t)
    clip_sd = {k: v.numpy() for k, v in ref_clip.transformer.state_dict().items()}
    our_clip = CLIPTextEncoder(CLIPTextConfig(
        vocab_size=tok.vocab_size, hidden_size=D, num_layers=N_LAYERS,
        num_heads=HEADS, intermediate_size=INTER))
    cp = asarray(map_clip_text_params(clip_sd, num_layers=N_LAYERS))

    ucfg = UNetConfig(model_channels=32, channel_mult=(1, 2, 4, 4),
                      num_res_blocks=2, attention_levels=(0, 1, 2),
                      num_heads=4, context_dim=D, use_flash_attention=False)
    up = asarray(map_unet_params(
        {k: v.numpy() for k, v in ref_unet.state_dict().items()},
        ucfg, prefix=""))
    vcfg = VAEConfig(ch=32, ch_mult=(1, 2), num_res_blocks=1)
    vp = asarray(map_vae_params(
        {k: v.numpy() for k, v in ref_vae.state_dict().items()},
        vcfg, prefix=""))

    ckpt = str(tmp / "embeddings_gs-1.pt")
    ref_mgr.save(ckpt)
    mgr = EmbeddingManager()
    mgr.load_reference_checkpoint(
        ckpt, token_id_resolver=lambda s: tok.encode(s)[0])
    assert mgr.placeholders["sks"].num_vectors == K

    pipe = StableDiffusionPipeline(
        tokenizer=tok, clip=our_clip, clip_params=cp,
        unet=UNetModel(ucfg), unet_params=up,
        vae=AutoencoderKL(vcfg), vae_params=vp,
        embedding_manager=mgr, base_sched=make_diffusion_schedule(),
        skip_weights=(0.5, 0.5))
    return pipe.generate([PROMPT], negative_prompt=NEG, num_steps=10,
                         guidance_scale=(10.0, 4.0), height=IMG, width=IMG,
                         x_T=np.moveaxis(x_T, 1, -1))


def test_full_chain_golden_parity(chain):
    x_T = np.random.default_rng(3).standard_normal(
        (1, 4, LAT, LAT)).astype(np.float32)
    ref = _reference_image(chain, x_T)
    ours = _our_image(chain, x_T)
    ref_u8 = (ref * 255).astype(np.uint8)
    diff = np.abs(ours.astype(int) - ref_u8.astype(int))
    # fp32 CPU both sides: identical to within 1 uint8 level everywhere
    assert diff.max() <= 1, f"max uint8 diff {diff.max()}"
    assert (diff > 0).mean() < 0.01
