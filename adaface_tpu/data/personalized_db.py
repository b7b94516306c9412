"""DreamBooth datasets: subject images + class regularization images.

Re-design of `ldm/data/personalized_db.py` (101 LoC): two plain image
folders — the subject's photos captioned with "a photo of a <placeholder>
<class>" and pre-generated class images captioned with "a photo of a
<class>" — drawn as (train, reg) pairs like the reference's ConcatDataset
batches (`main_db.py:245-307`).
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import numpy as np

from adaface_tpu.data.personalized import IMG_EXTS, _nearest_resize


class DreamBoothDataset:
    def __init__(self, subject_folder: str, reg_folder: str,
                 placeholder: str = "z", class_word: str = "person",
                 size: int = 512, flip_p: float = 0.5,
                 seed: Optional[int] = None):
        import os

        self.size = size
        self.flip_p = flip_p
        self.rng = np.random.default_rng(seed)
        scan = lambda d: [os.path.join(d, f) for f in sorted(os.listdir(d))
                          if f.lower().endswith(IMG_EXTS)
                          and not f.lower().endswith("_mask.png")]
        self.subject_paths = scan(subject_folder)
        self.reg_paths = scan(reg_folder)
        self.train_caption = f"a photo of a {placeholder} {class_word}"
        self.reg_caption = f"a photo of a {class_word}"

    def _load(self, path: str) -> np.ndarray:
        from PIL import Image

        img = np.asarray(Image.open(path).convert("RGB"), np.uint8)
        img = _nearest_resize(img, self.size)
        if self.rng.random() < self.flip_p:
            img = img[:, ::-1]
        return (img / 127.5 - 1.0).astype(np.float32)

    def draw_pair(self) -> Tuple[Dict, Dict]:
        """One (train example, reg example) pair."""
        sp = self.subject_paths[int(self.rng.integers(len(self.subject_paths)))]
        rp = self.reg_paths[int(self.rng.integers(len(self.reg_paths)))]
        return ({"image": self._load(sp), "caption": self.train_caption},
                {"image": self._load(rp), "caption": self.reg_caption})
