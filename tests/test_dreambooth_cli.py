"""DreamBooth CLI (`scripts/train.py --dreambooth` = the reference's
`main_db.py`): end-to-end smoke at tiny config, single-device and over the
8-virtual-device dp mesh (one (train, reg) pair per device)."""

import os
import sys

import numpy as np
import pytest

import jax

pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def data_dirs(tmp_path_factory):
    from PIL import Image

    rng = np.random.default_rng(0)
    subj = tmp_path_factory.mktemp("db_subj")
    reg = tmp_path_factory.mktemp("db_reg")
    for d in (subj, reg):
        for i in range(2):
            Image.fromarray(rng.integers(0, 255, (48, 48, 3)).astype(np.uint8)
                            ).save(d / f"{i}.jpg")
    return str(subj), str(reg)


@pytest.mark.parametrize("nd", [1, 8])
def test_dreambooth_cli(data_dirs, tmp_path, nd):
    if nd > 1 and len(jax.devices()) < nd:
        pytest.skip("needs the 8-device virtual mesh")
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                    "scripts"))
    import train as train_cli

    subj, reg = data_dirs
    logdir = str(tmp_path / f"db{nd}")
    rc = train_cli.main(train_cli.parse_args([
        "--data_root", subj, "--reg_data_root", reg, "--dreambooth",
        "--tiny", "--max_steps", "2", "--size", "32",
        "--num_devices", str(nd),
        "--logdir", logdir, "--ckpt_every_steps", "1000"]))
    assert rc in (0, None)
    assert os.path.exists(os.path.join(logdir, "embeddings_last.npz"))
