#!/usr/bin/env python
"""Word/concept CLIP text-similarity probe.

Equivalent of `scripts/text_sim_exp.py` (31 LoC in the reference): for each
(a, b, c) triplet print cos(a,b) / cos(a,c) and cos(a, normalize(b+c)), on
both the projected sentence features and the mean token embeddings — the
scratch experiment behind the ada-prompt "compound concept" intuition.

Scorer weights resolve from env assets (`CLIP_SCORER_PT`,
`CLIP_VOCAB_JSON`/`CLIP_MERGES_TXT`); random towers otherwise (smoke only —
similarities are then meaningless but the plumbing runs).
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

TRIPLETS = [
    ["camel", "giraffe", "cashmere"],
    ["snail", "ladybug", "winding"],
    ["dietitian", "pharmacist", "nutritious"],
    ["snake", "twisted", "gecko"],
    ["reflections of earth", "sphere", "civilization"],
    ["fear", "scream", "wolf"],
    ["snail", "table", "cake"],
    ["camel", "giraffe", "door"],
]


def main(argv=None):
    import numpy as np

    from adaface_tpu.evaluation.scorers import init_evaluators

    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--triplet", nargs=3, action="append", default=None,
                   metavar=("A", "B", "C"), help="extra word triplets")
    opt = p.parse_args(argv)
    triplets = TRIPLETS + (opt.triplet or [])

    clip, _ = init_evaluators()

    def token_mean_feats(words):
        """Mean contextual token embedding (pre-projection), the reference's
        `get_text_features(..., get_token_emb=True)` arm."""
        import jax.numpy as jnp

        ids = jnp.asarray(clip.tokenizer(list(words)))
        seq = clip.text.apply({"params": clip.text_params}, ids)
        feats = seq.mean(axis=1)
        return np.asarray(feats / jnp.linalg.norm(feats, axis=-1,
                                                  keepdims=True))

    for wa, wb, wc in triplets:
        print(f"Triplet: '{wa}' vs '{wb}'\t'{wc}'")
        for get_token_emb in (False, True):
            if get_token_emb:
                fa, fb, fc = token_mean_feats([wa, wb, wc])
            else:
                fa, fb, fc = np.asarray(clip.get_text_features([wa, wb, wc]))
            print(f"'{wa}', '{wb}': {float(fa @ fb):.3f}, "
                  f"'{wa}', '{wc}': {float(fa @ fc):.3f}")
            fbc = fb + fc
            fbc = fbc / np.linalg.norm(fbc)
            print(f"'{wa}', '{wb}' + '{wc}': {float(fa @ fbc):.3f}")
            print()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
