"""Checkpoint post-processing CLIs: avgemb (SWA), merge_embeddings,
chk_ckpt_weights, modeldiff, export_embeddings (--zs) — the reference's
`scripts/avgemb.py` / `merge_embeddings.py` / `chk_ckpt_weights.py` /
`scripts-private/modeldiff.py` surfaces, driven on native artifacts."""

import os
import pickle
import subprocess
import sys

import numpy as np
import pytest

import jax

SCRIPTS = os.path.join(os.path.dirname(__file__), "..", "scripts")
sys.path.insert(0, SCRIPTS)


def _mgr_npz(path, seed, strings=("z",)):
    from adaface_tpu.personalization.embedding_manager import EmbeddingManager

    mgr = EmbeddingManager()
    for i, s in enumerate(strings):
        mgr.add_placeholder(s, token_id=49408 + i, num_vectors=2,
                            init_key=jax.random.PRNGKey(seed + i), emb_dim=32)
    mgr.save_native(path)
    return path


def _run(script, args):
    r = subprocess.run([sys.executable, os.path.join(SCRIPTS, script)] + args,
                       capture_output=True, text=True,
                       env={**os.environ, "JAX_PLATFORMS": "cpu",
                            "PALLAS_AXON_POOL_IPS": ""})
    assert r.returncode == 0, r.stdout + r.stderr
    return r.stdout


def test_avgemb_swa(tmp_path):
    a = _mgr_npz(str(tmp_path / "a.npz"), 0)
    b = _mgr_npz(str(tmp_path / "b.npz"), 5)
    out = str(tmp_path / "avg.npz")
    _run("avgemb.py", [a, b, "--out", out])
    from adaface_tpu.personalization.embedding_manager import EmbeddingManager
    from adaface_tpu.personalization.static_embedding import (
        compute_static_embedding,
    )

    ea = EmbeddingManager.load_native(a)
    eb = EmbeddingManager.load_native(b)
    eo = EmbeddingManager.load_native(out)
    want = (np.asarray(compute_static_embedding(ea.embedders["z"]))
            + np.asarray(compute_static_embedding(eb.embedders["z"]))) / 2
    got = np.asarray(compute_static_embedding(eo.embedders["z"]))
    # parameter-space averaging of the low-rank basis is not embedding-space
    # averaging in general, but with identical architecture the bias/basis
    # means must at least produce finite same-shape embeddings
    assert got.shape == want.shape
    assert np.isfinite(got).all()


def test_merge_embeddings_collision_rename(tmp_path):
    a = _mgr_npz(str(tmp_path / "a.npz"), 0, strings=("z",))
    b = _mgr_npz(str(tmp_path / "b.npz"), 3, strings=("z", "y"))
    out = str(tmp_path / "merged.npz")
    stdout = _run("merge_embeddings.py", [a, b, "--out", out])
    from adaface_tpu.personalization.embedding_manager import EmbeddingManager

    m = EmbeddingManager.load_native(out)
    assert len(m.placeholders) == 3  # z + renamed z2 (collision) + y
    assert "z" in m.placeholders and "y" in m.placeholders


def test_chk_ckpt_weights(tmp_path):
    a = _mgr_npz(str(tmp_path / "embeddings_gs-100.npz"), 0)
    b = _mgr_npz(str(tmp_path / "embeddings_gs-200.npz"), 1)
    out = _run("chk_ckpt_weights.py", [a, b])
    assert "gs-100" in out or "100" in out


def test_modeldiff(tmp_path):
    a = _mgr_npz(str(tmp_path / "a.npz"), 0)
    b = _mgr_npz(str(tmp_path / "b.npz"), 9)
    out = _run("modeldiff.py", [a, b, "--top", "3"])
    assert out.strip()


def test_export_embeddings_zs(tmp_path):
    torch = pytest.importorskip("torch")
    from tests.test_subj_basis_interop import synth_bg_flat
    from adaface_tpu.interop.subj_basis import map_subj_basis_generator

    params, _ = map_subj_basis_generator(synth_bg_flat())
    pkl = str(tmp_path / "subj_basis_gs-9.pkl")
    with open(pkl, "wb") as f:
        pickle.dump({"generator_params": {"y": params}, "global_step": 9}, f)
    out = str(tmp_path / "zs.pt")
    _run("export_embeddings.py", [pkl, "--zs", "--out", out])
    ck = torch.load(out, weights_only=False)
    sds = ck["string_to_subj_basis_generator_state_dicts"]
    assert "y" in sds and "bg_proj_in.0.weight" in sds["y"]
    assert ck["background_strings"] == ["y"]
