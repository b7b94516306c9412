"""Tar-shard background stream + compositing filters."""

import io
import json
import os
import tarfile

import numpy as np
import pytest

from adaface_tpu.data.wds import (
    HUMAN_ANIMAL_PAT,
    BackgroundCompositor,
    stream_tar_shards,
)


def _add(tf, name, data: bytes):
    info = tarfile.TarInfo(name)
    info.size = len(data)
    tf.addfile(info, io.BytesIO(data))


def _img_bytes(rng, h, w):
    from PIL import Image

    buf = io.BytesIO()
    Image.fromarray(rng.integers(0, 255, (h, w, 3)).astype(np.uint8)
                    ).save(buf, format="PNG")
    return buf.getvalue()


@pytest.fixture()
def shard(tmp_path):
    rng = np.random.default_rng(0)
    path = tmp_path / "shard-000.tar"
    with tarfile.open(path, "w") as tf:
        # good sample
        _add(tf, "000.png", _img_bytes(rng, 64, 64))
        _add(tf, "000.json", json.dumps({
            "caption": "a sunny mountain landscape with trees",
            "width": 64, "height": 64,
            "original_width": 640, "original_height": 640}).encode())
        # human prompt -> filtered
        _add(tf, "001.png", _img_bytes(rng, 64, 64))
        _add(tf, "001.json", json.dumps({
            "caption": "a man walking on the beach",
            "width": 64, "height": 64,
            "original_width": 640, "original_height": 640}).encode())
        # too small source -> filtered
        _add(tf, "002.png", _img_bytes(rng, 64, 64))
        _add(tf, "002.json", json.dumps({
            "caption": "a quiet forest clearing at dawn",
            "width": 64, "height": 64,
            "original_width": 64, "original_height": 64}).encode())
        # txt caption variant, good
        _add(tf, "003.png", _img_bytes(rng, 64, 64))
        _add(tf, "003.txt", b"an empty cobblestone alley in the rain")
    return str(path)


def test_stream_pairs(shard):
    gen = stream_tar_shards([shard])
    seen = [next(gen) for _ in range(5)]  # loops past the shard end
    assert all(img.shape == (64, 64, 3) for img, _ in seen)
    captions = {m["caption"] for _, m in seen}
    assert "a sunny mountain landscape with trees" in captions
    assert "an empty cobblestone alley in the rain" in captions


def test_filters(shard):
    comp = BackgroundCompositor([shard], size=96)
    for _ in range(4):
        out = comp.next_background()
        assert out is not None
        bg, prompt = out
        assert bg.shape == (96, 96, 3)
        assert not HUMAN_ANIMAL_PAT.search(prompt)
        assert prompt != "a quiet forest clearing at dawn"  # too small


def test_composite_keys(shard):
    rng = np.random.default_rng(1)
    comp = BackgroundCompositor([shard], size=48)
    img = rng.integers(0, 255, (48, 48, 3)).astype(np.uint8)
    fg = np.zeros((48, 48), np.uint8)
    fg[10:30, 10:30] = 1
    ex = {
        "caption": "a photo of a z",
        "caption_bg": "a photo of a z with background y",
        "image_unnorm": img,
        "image": (img / 127.5 - 1.0).astype(np.float32),
        "fg_mask": fg,
        "aug_mask": np.ones((48, 48), np.uint8),
    }
    out = comp.composite(ex, "person")
    assert out["has_wds_comp"]
    assert out["wds_caption"].startswith("a photo of a z, in front of ")
    assert "person" in out["wds_cls_comp_extra"]
    # fg pixels come from the subject image, bg pixels from the background
    wds = np.round((out["wds_image"] + 1) * 127.5).astype(np.uint8)
    np.testing.assert_array_equal(wds[15, 15], img[15, 15])
    bgonly = np.round((out["wds_image_bgonly"] + 1) * 127.5).astype(np.uint8)
    np.testing.assert_array_equal(wds[0, 0], bgonly[0, 0])


def test_placeholder_token_filter(tmp_path):
    rng = np.random.default_rng(2)
    path = tmp_path / "s.tar"
    with tarfile.open(path, "w") as tf:
        _add(tf, "0.png", _img_bytes(rng, 64, 64))
        _add(tf, "0.json", json.dumps({
            "caption": "the letter z carved into stone",
            "width": 64, "height": 64,
            "original_width": 640, "original_height": 640}).encode())
    comp = BackgroundCompositor([str(path)], size=32, max_tries=5)
    assert comp.next_background() is None  # contains placeholder 'z'
