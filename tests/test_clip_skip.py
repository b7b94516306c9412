"""Per-iteration CLIP clip-skip randomization (fast units).

The reference resamples the text encoder's last-layers skip weights from
Dirichlet(weights) on EVERY training encode when
`--randomize_clip_skip_weights` is set (`main.py:335-338`,
`ldm/modules/encoders/modules.py:410-435`, `ddpm.py:973-974`). Here the
host-sampled draw rides in the batch (`train_step._iter_skip_weights`).
"""

from types import SimpleNamespace

import jax.numpy as jnp
import numpy as np

from adaface_tpu.training.train_step import ReconBatch, _iter_skip_weights
from adaface_tpu.training.trainer import Trainer, TrainerConfig


def _batch(sw=None):
    z = jnp.zeros((1, 4, 4, 4))
    return ReconBatch(latents=z, token_ids=jnp.zeros((1, 8), jnp.int32),
                      slot_maps={}, fg_mask=None,
                      timesteps=jnp.zeros((1,), jnp.int32), noise=z,
                      skip_weights=sw)


def test_iter_skip_weights_prefers_batch():
    const = (0.5, 0.5)
    np.testing.assert_allclose(_iter_skip_weights(_batch(), const),
                               [0.5, 0.5])
    draw = jnp.asarray([0.9, 0.1])
    np.testing.assert_allclose(_iter_skip_weights(_batch(draw), const),
                               [0.9, 0.1])


def test_trainer_dirichlet_sampling():
    self = SimpleNamespace(
        cfg=TrainerConfig(randomize_clip_skip_weights=True,
                          clip_skip_weights_alpha=(1.0, 2.0)),
        rng=np.random.default_rng(0))
    kws = [Trainer._skip_weights_kw(self) for _ in range(4)]
    ws = [np.asarray(k["skip_weights"]) for k in kws]
    for w in ws:
        assert w.shape == (2,) and abs(float(w.sum()) - 1.0) < 1e-5
        assert (w >= 0).all()
    # draws differ across iterations
    assert float(np.abs(ws[0] - ws[1]).max()) > 1e-6
    # alpha (1, 2) biases mass to the second component on average
    mean = np.mean([w[1] for w in ws])
    assert mean > 0.35


def test_trainer_constant_when_off():
    self = SimpleNamespace(cfg=TrainerConfig(), rng=np.random.default_rng(0))
    assert Trainer._skip_weights_kw(self) == {}
