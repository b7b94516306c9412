"""Performance/A-B knob registry — THE config layer for `ADAFACE_*` env
toggles (VERDICT r3 weak #5).

Every trace-time A/B switch in the compute path (flash-attention arms,
fused FF, subpixel upsample, GroupNorm variants, Winograd, CFG dedup,
cross-KV hoist, ...) resolves through this module instead of scattering
`os.environ.get` over `models/` and `ops/`. Two contracts:

1. **Live reads** — `get`/`flag`/`intval` read the environment at call
   (trace) time, so the perf scripts' and tests' in-process toggling
   (monkeypatch.setenv between two jit calls) keeps working.
2. **`fingerprint()` in every cache key** — any cache of a compiled
   program whose trace can observe a knob (pipeline sampler cache,
   trainer step caches) must include `fingerprint()` in its key; a
   flipped env then retraces instead of silently reusing the stale arm.

`grep os.environ adaface_tpu/models adaface_tpu/ops` should only ever hit
this file's callers, never a raw read.
"""

from __future__ import annotations

import os

_PREFIX = "ADAFACE_"


def get(name: str, default=None):
    """Raw env read (the `os.environ.get` twin) — compare exactly like the
    call site used to, so A/B semantics stay bit-identical."""
    return os.environ.get(name, default)


def flag(name: str, default: bool = False) -> bool:
    """Boolean knob: unset -> default; "0"/""/"false" -> False; else True."""
    v = os.environ.get(name)
    if v is None:
        return default
    return v not in ("0", "", "false", "False")


def intval(name: str, default) -> int:
    return int(os.environ.get(name, default))


# Host-side operational vars that can NEVER affect a traced program —
# excluded from fingerprint() so flipping them (a different cache path, a
# bench mode, a trace dir) doesn't invalidate every compiled-program cache
# entry and re-pay the remote compile for byte-identical programs.
_HOST_ONLY = frozenset({
    "ADAFACE_AOT_CACHE", "ADAFACE_AOT_CACHE_FORCE", "ADAFACE_COMPILE_CACHE",
    "ADAFACE_TRACE_DIR", "ADAFACE_BENCH_BATCH", "ADAFACE_BENCH_LATENCY",
    "ADAFACE_BENCH_PIPELINE_DEPTH", "ADAFACE_TEST_JAX_CACHE",
})


def fingerprint() -> tuple:
    """Resolved (name, value) pairs of every trace-affecting ADAFACE_* env
    var, sorted — the cache-key component that makes in-process knob flips
    retrace."""
    return tuple(sorted((k, v) for k, v in os.environ.items()
                        if k.startswith(_PREFIX) and k not in _HOST_ONLY))
