"""Face-curation CLIs: filter_faces, comparefaces, knn_faces
(`scripts-private/filter_faces.py` / `comparefaces.py` / `knn-faces.py`
surfaces) driven in synthetic-weights mode via subprocess."""

import os
import subprocess
import sys

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # subprocess re-inits: ~3 min

SCRIPTS = os.path.join(os.path.dirname(__file__), "..", "scripts")


def _imgs(folder, n=3, seed=0):
    from PIL import Image

    os.makedirs(folder, exist_ok=True)
    rng = np.random.default_rng(seed)
    for i in range(n):
        Image.fromarray(rng.integers(0, 255, (32, 32, 3)
                                     ).astype(np.uint8)
                        ).save(os.path.join(folder, f"{i}.jpg"))
    return folder


def _run(script, args):
    r = subprocess.run([sys.executable, os.path.join(SCRIPTS, script)] + args,
                       capture_output=True, text=True,
                       env={**os.environ, "JAX_PLATFORMS": "cpu",
                            "PALLAS_AXON_POOL_IPS": "",
                            "ADAFACE_TINY_FACE": "1"})
    assert r.returncode == 0, r.stdout + r.stderr
    return r.stdout


@pytest.fixture(scope="module")
def folders(tmp_path_factory):
    t = tmp_path_factory.mktemp("faces")
    return (_imgs(str(t / "a"), seed=0), _imgs(str(t / "b"), seed=9))


def test_comparefaces_pair_and_self(folders):
    a, b = folders
    out = _run("comparefaces.py", [a, b])
    assert "sim" in out.lower() or any(c.isdigit() for c in out)
    out = _run("comparefaces.py", [a, "--self"])
    assert out.strip()


def test_filter_faces_dry_run(folders):
    a, _ = folders
    out = _run("filter_faces.py", [a, "--dry_run", "--threshold", "0.99"])
    # nothing moved in dry-run mode
    assert len([f for f in os.listdir(a) if f.endswith(".jpg")]) == 3


def test_knn_faces(folders):
    a, b = folders
    q = os.path.join(a, "0.jpg")
    out = _run("knn_faces.py", ["--query", q, "--gallery", a, b, "-k", "3"])
    assert out.strip()
