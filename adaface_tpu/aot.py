"""On-disk PJRT executable cache (the serving cold-start fix).

Through the axon tunnel, compilation happens REMOTE-side, so jax's
persistent compilation cache never skips the 300-600 s compile+first of
the fused sampling program. PJRT executable serialization
(`jax.experimental.serialize_executable`) measured 0.2-3.2 s to reload on
this backend with ZERO recompilation (`scripts/perf_aot_cold.py`,
PERF.md round 4), so compiled programs are cached on disk keyed by
(program signature, arg shapes/dtypes, device kind, jax version) and paid
once per shape EVER instead of per process.

Contract: the wrapped jitted function must take params as ARGUMENTS (the
repo-wide rule) so the serialized artifact is code-only. Single-device
programs only — mesh lowerings bake shardings. Gated off on CPU unless
forced (the multi-device virtual CPU platform trips an XLA:CPU AOT reload
bug: "Buffer Definition Event ... not found").
"""

from __future__ import annotations

import os

import jax


def aot_wrap(sig, jitted, allow: bool = True):
    """Wrap `jitted` so its first call per (sig, arg shapes) either loads
    the serialized executable from `$ADAFACE_AOT_CACHE` — skipping
    compilation entirely — or compiles once and serializes it for every
    future process. Returns `jitted` unchanged when the cache is off."""
    cache_dir = os.environ.get("ADAFACE_AOT_CACHE")
    if not cache_dir or not allow:
        return jitted
    if (jax.default_backend() == "cpu"
            and os.environ.get("ADAFACE_AOT_CACHE_FORCE") != "1"):
        return jitted
    # keyed per resolved (arg shapes + pytree) so a caller whose argument
    # STRUCTURE changes between calls (e.g. a new placeholder embedder in
    # the params tree) retraces like plain @jax.jit instead of invoking a
    # baked Compiled with a mismatched pytree
    state: dict = {}

    def call(*args):
        import hashlib
        import pickle

        shapes = jax.tree_util.tree_map(
            lambda x: (getattr(x, "shape", None),
                       str(getattr(x, "dtype", type(x).__name__))),
            args)
        key_src = repr((sig, shapes,
                        jax.tree_util.tree_structure(args),
                        jax.__version__, jax.devices()[0].device_kind))
        fname = hashlib.sha256(key_src.encode()).hexdigest()[:24] + ".aot"
        if fname not in state:
            state[fname] = None
            path = os.path.join(cache_dir, fname)
            if os.path.exists(path):
                try:
                    import time as _time

                    from jax.experimental import serialize_executable as se

                    t0 = _time.time()
                    with open(path, "rb") as f:
                        serialized, in_tree, out_tree = pickle.load(f)
                    t1 = _time.time()
                    # pin to the default device: on a multi-device platform
                    # the default reload assigns the whole device set and
                    # then expects N-sharded args
                    state[fname] = se.deserialize_and_load(
                        serialized, in_tree, out_tree,
                        execution_devices=[jax.devices()[0]])
                    print(f"# AOT cache hit: read {t1 - t0:.1f}s, "
                          f"load {_time.time() - t1:.1f}s ({path})")
                except Exception as e:  # stale/incompatible: recompile
                    print(f"# AOT cache load failed ({e}); recompiling")
                    state[fname] = None
            if state[fname] is None:
                compiled = jitted.lower(*args).compile()
                try:
                    from jax.experimental import serialize_executable as se

                    os.makedirs(cache_dir, exist_ok=True)
                    tmp = path + f".tmp{os.getpid()}"
                    with open(tmp, "wb") as f:
                        pickle.dump(se.serialize(compiled), f)
                    os.replace(tmp, path)
                except Exception as e:  # cache is best-effort
                    print(f"# AOT cache write failed: {e}")
                state[fname] = compiled
        return state[fname](*args)

    return call
