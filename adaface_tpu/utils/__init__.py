"""Small observability helpers (SURVEY.md §5 tracing/profiling analogs)."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def count_params(params, unit: float = 1e6) -> float:
    """Total parameter count in millions — `count_params` (`ddpm.py:202`)."""
    return sum(int(np.prod(l.shape))
               for l in jax.tree_util.tree_leaves(params)) / unit


def calc_stats(name: str, x, verbose: bool = True):
    """Tensor statistics printer (`calc_stats`, `ldm/util.py:260-280`).

    Works on concrete arrays (host print) and inside jit via
    `jax.debug.print`. Returns the (mean, std, min, max) tuple.
    """
    x = jnp.asarray(x)
    stats = (jnp.mean(x), jnp.std(x), jnp.min(x), jnp.max(x))
    if verbose:
        if isinstance(jnp.mean(x), jax.core.Tracer):
            jax.debug.print(
                name + ": shape={s} mean={m:.4f} std={d:.4f} "
                "min={mn:.4f} max={mx:.4f}",
                s=x.shape, m=stats[0], d=stats[1], mn=stats[2], mx=stats[3])
        else:
            print(f"{name}: shape={x.shape} mean={float(stats[0]):.4f} "
                  f"std={float(stats[1]):.4f} min={float(stats[2]):.4f} "
                  f"max={float(stats[3]):.4f}", flush=True)
    return stats
