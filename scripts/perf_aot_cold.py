"""AOT executable-serialization experiment (VERDICT r3 #3: cold start).

The serving cold start is dominated by compile+first (~370-640 s through
the axon tunnel; the jax persistent compilation cache does NOT help —
compilation is remote-side). This probes whether PJRT executable
serialization (`jax.experimental.serialize_executable`) round-trips on
this backend: if a compiled executable can be serialized to disk and
loaded by a fresh process without recompiling, the fused sampling program
can be cached per (batch, size, steps) and the cold start paid once per
shape EVER instead of per process.

Usage:
  python scripts/perf_aot_cold.py save [path]   # compile + serialize
  python scripts/perf_aot_cold.py load [path]   # deserialize + run
Run `save` then `load` in separate processes; compare wall times.
"""

import os
import pickle
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def small_program():
    import jax
    import jax.numpy as jnp

    from adaface_tpu.models.unet import UNetConfig, UNetModel

    cfg = UNetConfig(model_channels=64, channel_mult=(1, 2),
                     num_res_blocks=1, attention_levels=(0, 1),
                     num_heads=4, context_dim=64)
    model = UNetModel(cfg, jnp.bfloat16)
    x = jnp.zeros((2, 16, 16, 4), jnp.float32)
    t = jnp.zeros((2,), jnp.int32)
    ctx = jnp.zeros((1, 2, 77, 64), jnp.bfloat16)
    params = model.init(jax.random.PRNGKey(0), x, t, ctx)["params"]

    def fn(params, x, t, ctx):
        return model.apply({"params": params}, x, t, ctx)

    return fn, (params, x, t, ctx)


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "save"
    path = sys.argv[2] if len(sys.argv) > 2 else "/tmp/adaface_aot_probe.pkl"
    t_all = time.time()
    import jax

    from jax.experimental import serialize_executable as se

    fn, args = small_program()
    print(f"# setup {time.time() - t_all:.1f}s; devices={jax.devices()}",
          flush=True)

    if mode == "save":
        t0 = time.time()
        compiled = jax.jit(fn).lower(*args).compile()
        print(f"# compile: {time.time() - t0:.1f}s", flush=True)
        t0 = time.time()
        payload = se.serialize(compiled)
        with open(path, "wb") as f:
            pickle.dump(payload, f)
        print(f"# serialize+write: {time.time() - t0:.1f}s "
              f"({len(pickle.dumps(payload)) / 1e6:.1f} MB)", flush=True)
        out = compiled(*args)
        print(f"# run ok: {jax.numpy.asarray(out).shape}", flush=True)
    else:
        t0 = time.time()
        with open(path, "rb") as f:
            payload = pickle.load(f)
        serialized, in_tree, out_tree = payload
        loaded = se.deserialize_and_load(serialized, in_tree, out_tree)
        print(f"# deserialize+load: {time.time() - t0:.1f}s", flush=True)
        t0 = time.time()
        out = loaded(*args)
        jax.block_until_ready(out)
        print(f"# first run (no compile): {time.time() - t0:.1f}s; "
              f"total cold {time.time() - t_all:.1f}s", flush=True)


if __name__ == "__main__":
    main()
