"""Probe: does the persistent compile cache hit across processes on axon?

Runs one moderately sized jit (forced ≥min_compile_time) with
jax_explain_cache_misses on. Run this twice in separate processes with the
same JAX_CACHE_DIR: the second run should log no misses and compile fast.
"""
import logging
import os
import sys
import time

import jax
import jax.numpy as jnp

cache_dir = os.environ.get("JAX_CACHE_DIR", "/tmp/cache_probe")
os.makedirs(cache_dir, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_explain_cache_misses", True)
logging.basicConfig(level=logging.WARNING, stream=sys.stderr)
logging.getLogger("jax._src.compilation_cache").setLevel(logging.DEBUG)
logging.getLogger("jax._src.cache_key").setLevel(logging.DEBUG)

print("devices:", jax.devices(), file=sys.stderr)


@jax.jit
def f(x):
    for _ in range(8):
        x = jnp.tanh(x @ x) + x
    return x.sum()


x = jnp.ones((1024, 1024), dtype=jnp.bfloat16)
t = time.time()
print("result:", float(f(x)), file=sys.stderr)
print(f"first-call wall: {time.time() - t:.1f}s", file=sys.stderr)
print("cache files:", sorted(os.listdir(cache_dir)), file=sys.stderr)
