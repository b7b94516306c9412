"""SCRFD detector port (VERDICT round-2 item 8): forward shapes at the
architecture spec, decode semantics vs hand-computed anchors, NMS, and the
detect_fn contract with `face_app`."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from adaface_tpu.models.scrfd import (
    NUM_ANCHORS,
    NUM_KPS,
    SCRFD,
    SCRFDConfig,
    SCRFDDetector,
    STRIDES,
    decode_scrfd,
    distance2bbox,
    distance2kps,
    init_scrfd,
)


@pytest.fixture(scope="module")
def tiny_det():
    model, params = init_scrfd(jax.random.PRNGKey(0), SCRFDConfig.tiny(),
                               input_size=(64, 64))
    return model, params


def test_forward_shapes_match_spec(tiny_det):
    """3 scales at strides 8/16/32; per location 2 anchors of
    (1 score, 4 bbox, 10 kps) — the scrfd_10g_bnkps output contract."""
    model, params = tiny_det
    outs = model.apply({"params": params}, jnp.zeros((1, 64, 64, 3)))
    assert len(outs) == 3
    for stride, (score, bbox, kps) in zip(STRIDES, outs):
        h = w = 64 // stride
        assert score.shape == (1, h, w, NUM_ANCHORS)
        assert bbox.shape == (1, h, w, NUM_ANCHORS * 4)
        assert kps.shape == (1, h, w, NUM_ANCHORS * NUM_KPS * 2)
        s = np.asarray(score)
        assert (s >= 0).all() and (s <= 1).all()  # sigmoid scores


def test_distance_decode():
    centers = np.array([[16.0, 16.0], [32.0, 8.0]], np.float32)
    dist = np.array([[4, 2, 6, 8], [1, 1, 1, 1]], np.float32)
    boxes = distance2bbox(centers, dist)
    np.testing.assert_allclose(boxes[0], [12, 14, 22, 24])
    np.testing.assert_allclose(boxes[1], [31, 7, 33, 9])
    kd = np.arange(10, dtype=np.float32)[None].repeat(2, 0)
    kps = distance2kps(centers, kd)
    assert kps.shape == (2, 5, 2)
    np.testing.assert_allclose(kps[0, 0], [16, 17])
    np.testing.assert_allclose(kps[1, 4], [40, 17])


def test_decode_scrfd_thresholds_and_nms():
    """Hand-built head outputs: one strong anchor at stride 8 grid (1,2)
    plus a weaker overlapping one that NMS must suppress."""
    outs = []
    for stride in STRIDES:
        h = w = 64 // stride
        score = np.zeros((1, h, w, NUM_ANCHORS), np.float32)
        bbox = np.zeros((1, h, w, NUM_ANCHORS * 4), np.float32)
        kps = np.zeros((1, h, w, NUM_ANCHORS * NUM_KPS * 2), np.float32)
        if stride == 8:
            score[0, 1, 2, 0] = 0.9  # center (16, 8)
            bbox[0, 1, 2, :4] = [1, 1, 1, 1]  # +-8px box
            score[0, 1, 2, 1] = 0.6  # same location, overlapping
            bbox[0, 1, 2, 4:8] = [1, 1, 1, 1]
            kps[0, 1, 2, 0:2] = [0.5, 0.25]
        outs.append((score, bbox, kps))
    dets = decode_scrfd(outs, score_thresh=0.5, nms_thresh=0.4)
    assert len(dets) == 1  # the weaker twin suppressed
    box, kp, sc = dets[0]
    assert sc == pytest.approx(0.9)
    np.testing.assert_allclose(box, [8, 0, 24, 16])  # (16,8) +- 8
    np.testing.assert_allclose(kp[0], [20, 10])  # center + (4, 2)


def test_decode_empty_below_threshold():
    outs = []
    for stride in STRIDES:
        h = w = 64 // stride
        outs.append((np.full((1, h, w, NUM_ANCHORS), 0.1, np.float32),
                     np.zeros((1, h, w, NUM_ANCHORS * 4), np.float32),
                     np.zeros((1, h, w, NUM_ANCHORS * NUM_KPS * 2),
                              np.float32)))
    assert decode_scrfd(outs) == []


def test_detector_rescales_to_frame(tiny_det):
    """detect_fn contract: boxes come back in original-frame coordinates."""
    model, params = tiny_det
    det = SCRFDDetector(model, params, input_size=(64, 64), score_thresh=0.0)
    img = np.random.default_rng(0).integers(0, 255, (128, 128, 3)
                                            ).astype(np.uint8)
    faces = det(img)
    # score_thresh 0 -> plenty of detections; all rescaled by 1/0.5
    assert len(faces) > 0
    for box, kp, sc in faces[:5]:
        assert box.shape == (4,)
        assert kp.shape == (5, 2)
        assert 0.0 <= sc <= 1.0


def test_face_app_integration(tiny_det):
    from adaface_tpu.face_app import FaceApp
    from adaface_tpu.models.arcface import IResNet, IResNetConfig

    model, params = tiny_det
    det = SCRFDDetector(model, params, input_size=(64, 64), score_thresh=0.0)
    rec = IResNet(IResNetConfig.tiny())
    rparams = rec.init(jax.random.PRNGKey(1),
                       jnp.zeros((1, 16, 16, 3)))["params"]
    app = FaceApp(recognizer=rec, params=rparams, detect_fn=det)
    img = np.random.default_rng(1).integers(0, 255, (96, 96, 3)
                                            ).astype(np.uint8)
    faces = app.get(img)
    assert len(faces) > 0
    assert faces[0].normed_embedding.shape == (rec.cfg.emb_dim,)
    np.testing.assert_allclose(np.linalg.norm(faces[0].normed_embedding),
                               1.0, rtol=1e-5)
