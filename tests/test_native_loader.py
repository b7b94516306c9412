"""Native C++ loader: build, decode parity, augmentation invariants."""

import os

import numpy as np
import pytest

from adaface_tpu.data import native_loader


@pytest.fixture(scope="module")
def image_dir(tmp_path_factory):
    from PIL import Image

    d = tmp_path_factory.mktemp("imgs")
    rng = np.random.default_rng(0)
    paths, masks = [], []
    for i in range(3):
        img = rng.integers(0, 255, (48, 40, 3)).astype(np.uint8)
        p = str(d / f"{i}.jpg")
        Image.fromarray(img).save(p, quality=95)
        paths.append(p)
        if i == 0:
            m = np.zeros((48, 40), np.uint8)
            m[12:36, 10:30] = 255
            mp = str(d / f"{i}_mask.png")
            Image.fromarray(m).save(mp)
            masks.append(mp)
        else:
            masks.append(None)
    # one PNG image too
    img = rng.integers(0, 255, (32, 32, 3)).astype(np.uint8)
    p = str(d / "p.png")
    Image.fromarray(img).save(p)
    paths.append(p)
    masks.append(None)
    return paths, masks


def test_build_and_decode(image_dir):
    if not native_loader.is_available():
        pytest.skip(f"native toolchain unavailable: {native_loader.build_error()}")
    paths, masks = image_dir
    loader = native_loader.NativeImageLoader(
        paths, masks, size=32, flip_p=0.0, scale_range=None, seed=0,
        n_workers=2, queue_capacity=4)
    seen = set()
    for _ in range(8):
        idx, img, fg, aug = loader.next()
        seen.add(idx)
        assert img.shape == (32, 32, 3) and img.dtype == np.uint8
        assert set(np.unique(fg)) <= {0, 1}
        assert np.all(aug == 1)  # no scaling -> full aug mask
        if idx == 0:
            assert 0 < fg.sum() < fg.size  # real mask
        else:
            assert fg.all()  # no mask file -> all-ones
    assert seen == {0, 1, 2, 3}  # round-robin covers all records
    loader.close()


def test_decode_matches_pil(image_dir):
    if not native_loader.is_available():
        pytest.skip("native loader unavailable")
    from PIL import Image

    paths, _ = image_dir
    # PNG path is lossless -> exact NEAREST parity with the python path
    png = [p for p in paths if p.endswith(".png")][0]
    loader = native_loader.NativeImageLoader(
        [png], [None], size=16, flip_p=0.0, scale_range=None, seed=0,
        n_workers=1, queue_capacity=2)
    _, img, _, _ = loader.next()
    ref = np.asarray(Image.open(png).convert("RGB"))
    ri = (np.arange(16) * (ref.shape[0] / 16)).astype(np.int64)
    ci = (np.arange(16) * (ref.shape[1] / 16)).astype(np.int64)
    np.testing.assert_array_equal(img, ref[ri][:, ci])
    loader.close()


def test_augmentation_invariants(image_dir):
    if not native_loader.is_available():
        pytest.skip("native loader unavailable")
    paths, masks = image_dir
    loader = native_loader.NativeImageLoader(
        paths[:1], masks[:1], size=48, flip_p=0.5, scale_range=(0.5, 0.8),
        seed=1, n_workers=1, queue_capacity=2)
    for _ in range(5):
        _, img, fg, aug = loader.next()
        # scaling shrinks valid area: aug mask has zero borders
        assert aug.sum() < aug.size
        # fg content never escapes the aug-mask region
        assert np.all(fg * aug == fg)
        # image content is zero outside the aug mask
        assert np.all(img[aug == 0] == 0)
    loader.close()


def test_native_stream_batches(image_dir, tmp_path):
    """Dataset-level native streaming yields collated batches with prompts."""
    import shutil

    from adaface_tpu.data.personalized import PersonalizedDataset, SubjectSpec

    paths, masks = image_dir
    d = tmp_path / "subj"
    d.mkdir()
    for p, m in zip(paths[:2], masks[:2]):
        shutil.copy(p, d)
        if m:
            shutil.copy(m, d)
    ds = PersonalizedDataset([SubjectSpec("s", str(d))], size=32, seed=0)
    gen = ds.native_stream(batch_size=2, n_workers=1)
    batch = next(gen)
    assert batch["image"].shape == (2, 32, 32, 3)
    assert len(batch["subj_prompt_single"]) == 2
    assert batch["image"].dtype == np.float32
    gen.close()
