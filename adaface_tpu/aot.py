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


def default_cache_dir() -> str:
    """Per-user default cache location. Deliberately NOT a shared /tmp
    path: a cache hit `pickle.load`s the file, so the directory must be
    owned/trusted by the user — a world-writable shared dir would let any
    local user plant a pickle payload that executes on load (and sticky-bit
    /tmp also breaks the atomic-replace publish for a second user)."""
    return os.path.join(os.path.expanduser("~"), ".cache", "adaface_aot")


def aot_wrap(sig, jitted, allow: bool = True):
    """Wrap `jitted` so its first call per (sig, arg shapes) either loads
    the serialized executable from `$ADAFACE_AOT_CACHE` — skipping
    compilation entirely — or compiles once and serializes it for every
    future process. Returns `jitted` unchanged when the cache is off.

    Point `ADAFACE_AOT_CACHE` only at a TRUSTED, user-owned directory
    (`default_cache_dir()` is the sanctioned default): cache hits unpickle
    the file contents."""
    cache_dir = os.environ.get("ADAFACE_AOT_CACHE")
    if not cache_dir or not allow:
        return jitted
    if (jax.default_backend() == "cpu"
            and os.environ.get("ADAFACE_AOT_CACHE_FORCE") != "1"):
        return jitted
    # keyed per resolved (arg shapes + pytree) so a caller whose argument
    # STRUCTURE changes between calls (e.g. a new placeholder embedder in
    # the params tree) retraces like plain @jax.jit instead of invoking a
    # baked Compiled with a mismatched pytree. The expensive full-tree
    # shape walk runs once per STRUCTURE (a cheap C-level treedef is the
    # per-call key) — leaf-shape variation with an unchanged structure
    # must be captured by `sig`, which every in-repo caller does (batch /
    # latent size / steps in the sampler sigs, configs + dtype appended
    # by pipeline._aot_wrap).
    state: dict = {}
    fname_by_struct: dict = {}

    def call(*args):
        import hashlib
        import pickle

        struct = jax.tree_util.tree_structure(args)
        fname = fname_by_struct.get(struct)
        if fname is None:
            shapes = jax.tree_util.tree_map(
                lambda x: (getattr(x, "shape", None),
                           str(getattr(x, "dtype", type(x).__name__))),
                args)
            key_src = repr((sig, shapes, struct, jax.__version__,
                            jax.devices()[0].device_kind))
            fname = hashlib.sha256(key_src.encode()).hexdigest()[:24] + ".aot"
            fname_by_struct[struct] = fname
        if fname not in state:
            path = os.path.join(cache_dir, fname)
            loaded = None
            if os.path.exists(path):
                try:
                    import time as _time

                    from jax.experimental import serialize_executable as se

                    t0 = _time.time()
                    with open(path, "rb") as f:
                        raw = f.read()
                    if raw[:4] == b"AOTZ":  # zlib-compressed entry
                        import zlib

                        raw = zlib.decompress(raw[4:])
                    serialized, in_tree, out_tree = pickle.loads(raw)
                    t1 = _time.time()
                    # pin to the default device: on a multi-device platform
                    # the default reload assigns the whole device set and
                    # then expects N-sharded args
                    loaded = se.deserialize_and_load(
                        serialized, in_tree, out_tree,
                        execution_devices=[jax.devices()[0]])
                    import sys as _sys

                    # stderr: callers like bench.py reserve stdout for
                    # their single machine-readable JSON line
                    print(f"# AOT cache hit: read {t1 - t0:.1f}s, "
                          f"load {_time.time() - t1:.1f}s ({path})",
                          file=_sys.stderr)
                except Exception as e:  # stale/incompatible: recompile
                    import sys as _sys

                    print(f"# AOT cache load failed ({e}); recompiling",
                          file=_sys.stderr)
                    loaded = None
            if loaded is None:
                # NOTE: the slot is only written on SUCCESS — a raised
                # compile (e.g. transient tunnel error) leaves no entry,
                # so a caller that catches and retries recompiles instead
                # of crashing on a poisoned None
                compiled = jitted.lower(*args).compile()
                try:
                    from jax.experimental import serialize_executable as se

                    os.makedirs(cache_dir, exist_ok=True)
                    tmp = path + f".tmp{os.getpid()}"
                    # zlib-1 shrinks SD-sized executables ~3.3x (389 ->
                    # ~118 MB at ~36 MB/s compress, ~100+ MB/s decompress)
                    # — makes shipping a prewarmed cache dir practical;
                    # uncompressed legacy entries still load
                    import zlib

                    blob = b"AOTZ" + zlib.compress(
                        pickle.dumps(se.serialize(compiled)), 1)
                    with open(tmp, "wb") as f:
                        f.write(blob)
                    os.replace(tmp, path)
                except Exception as e:  # cache is best-effort
                    import sys as _sys

                    print(f"# AOT cache write failed: {e}", file=_sys.stderr)
                loaded = compiled
            state[fname] = loaded
        return state[fname](*args)

    return call
