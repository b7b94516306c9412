"""Multi-subject composition (BASELINE config 3): two embedding
checkpoints loaded into one pipeline, 'a z hugging a y' patched with both
subjects' vectors."""

import os

import numpy as np

import jax


def test_two_checkpoint_composition(tmp_path):
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                    "scripts"))
    import txt2img
    from adaface_tpu.data.tokenizer import HashTokenizer
    from adaface_tpu.personalization.embedding_manager import EmbeddingManager

    # two native single-subject checkpoints (z subject, y background-ish
    # second subject), like `--embedding_paths a.npz b.npz`
    mgr_z = EmbeddingManager()
    mgr_z.add_placeholder("z", token_id=49408, num_vectors=2,
                          init_key=jax.random.PRNGKey(0), emb_dim=64)
    pz = str(tmp_path / "z_emb.npz")
    mgr_z.save_native(pz)
    mgr_y = EmbeddingManager()
    mgr_y.add_placeholder("y", token_id=49408, num_vectors=2,
                          init_key=jax.random.PRNGKey(1), emb_dim=64)
    py = str(tmp_path / "y_emb.npz")
    mgr_y.save_native(py)

    out = str(tmp_path / "out")
    opt = txt2img.parse_args([
        "--prompt", "a z hugging a y", "--steps", "2", "--size", "64",
        "--n_samples", "1", "--seed", "0", "--tiny", "--out", out,
        "--embedding_paths", pz, py])
    rc = txt2img.main(opt)
    assert rc in (0, None)
    imgs = [f for f in os.listdir(out) if f.endswith(".jpg")]
    assert len(imgs) >= 1

    # both subjects registered and resolvable in one prompt
    pipe, tok = txt2img.build_pipeline(opt)
    assert set(pipe.embedding_manager.placeholders) >= {"z", "y"}
    ids = tok(["a z , hugging a y ,"])
    slots = pipe.embedding_manager.build_slot_maps(ids)
    assert (slots["z"] >= 0).sum() == 2
    assert (slots["y"] >= 0).sum() == 2
    # distinct, non-overlapping slot positions
    assert not ((slots["z"] >= 0) & (slots["y"] >= 0)).any()
