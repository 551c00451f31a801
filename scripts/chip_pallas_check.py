"""On-chip (non-interpret) validation + micro-benchmark of the Pallas
kernels vs their XLA counterparts. Run under the default axon env:

    python scripts/chip_pallas_check.py

Writes PALLAS_CHIP.json at the repo root with correctness deltas and
timings; the train/model wiring flips to the Pallas kernels only where this
shows a win (VERDICT round-1 item 5)."""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(fn, *args, n=20):
    import jax
    out = jax.block_until_ready(fn(*args))  # compile
    t0 = time.perf_counter()
    for _ in range(n):
        out = jax.block_until_ready(fn(*args))
    return out, (time.perf_counter() - t0) / n


def _dump(results):
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "PALLAS_CHIP.json")
    with open(path, "w") as f:
        json.dump(results, f, indent=1)


def main():
    import jax
    import jax.numpy as jnp

    try:
        jax.config.update("jax_platforms", "axon,cpu")
    except Exception:
        pass
    dev = jax.devices()[0]
    print("device:", dev, flush=True)
    results = {"device": str(dev)}

    from jukebox_tpu.models.attention import dense_attn
    from jukebox_tpu.ops.core import layer_norm
    from jukebox_tpu.ops.pallas.adam import adam_update_pallas
    from jukebox_tpu.ops.pallas.flash_attention import flash_dense_attn
    from jukebox_tpu.ops.pallas.layer_norm import layer_norm_pallas
    from jukebox_tpu.utils.train_utils import adam_init, adam_update

    rs = np.random.RandomState(0)

    # ---- layer norm: 1b_lyrics shape [bs*L, 2048] --------------------------
    N, D = 4 * 6528, 2048
    x = jnp.asarray(rs.randn(N, D).astype(np.float32))
    g = jnp.asarray(rs.randn(D).astype(np.float32))
    b = jnp.asarray(rs.randn(D).astype(np.float32))
    ref_fn = jax.jit(lambda x: layer_norm({"g": g, "b": b}, x))
    pal_fn = jax.jit(lambda x: layer_norm_pallas(x, g, b, 1e-5, False))
    ref, t_ref = timeit(ref_fn, x)
    pal, t_pal = timeit(pal_fn, x)
    err = float(jnp.max(jnp.abs(ref - pal)))
    results["layer_norm"] = dict(xla_ms=t_ref * 1e3, pallas_ms=t_pal * 1e3,
                                 max_err=err)
    _dump(results)
    print(f"layer_norm: xla {t_ref*1e3:.3f}ms pallas {t_pal*1e3:.3f}ms "
          f"err {err:.2e}", flush=True)

    # ---- adam: a few big tensors ------------------------------------------
    params = {f"w{i}": jnp.asarray(rs.randn(2048, 2048).astype(np.float32))
              for i in range(4)}
    grads = {k: jnp.asarray(rs.randn(2048, 2048).astype(np.float32))
             for k in params}
    kw = dict(lr=1e-3, beta1=0.9, beta2=0.99, eps=1e-8, weight_decay=0.01,
              scale=2.0)
    opt = adam_init(params)
    ref_fn = jax.jit(lambda p, g, o: adam_update(p, g, o, **kw))
    pal_fn = jax.jit(lambda p, g, o: adam_update_pallas(p, g, o, **kw))
    (p1, o1), t_ref = timeit(ref_fn, params, grads, opt)
    (p2, o2), t_pal = timeit(pal_fn, params, grads, opt)
    err = max(float(jnp.max(jnp.abs(p1[k] - p2[k]))) for k in params)
    results["adam"] = dict(xla_ms=t_ref * 1e3, pallas_ms=t_pal * 1e3,
                           max_err=err)
    _dump(results)
    print(f"adam: xla {t_ref*1e3:.3f}ms pallas {t_pal*1e3:.3f}ms err {err:.2e}",
          flush=True)

    # ---- flash attention: func-0 layer at 1b_lyrics shape ------------------
    B, L, S, H = 2, 6528, 512, 2
    for dtype, atol in (("bfloat16", 2e-2), ("float32", 2e-4)):
        q = jnp.asarray(rs.randn(B, L, S), dtype)
        k = jnp.asarray(rs.randn(B, L, S), dtype)
        v = jnp.asarray(rs.randn(B, L, S), dtype)
        # in-graph mask: a 6528^2 trace-time constant exceeds the remote
        # compile transport's request size limit
        ref_fn = jax.jit(
            lambda q, k, v: dense_attn(
                q, k, v, H, jnp.tril(jnp.ones((L, L), jnp.float32)))[0])
        pal_fn = jax.jit(lambda q, k, v: flash_dense_attn(q, k, v, H))
        ref, t_ref = timeit(ref_fn, q, k, v, n=5)
        pal, t_pal = timeit(pal_fn, q, k, v, n=5)
        err = float(jnp.max(jnp.abs(ref.astype(jnp.float32)
                                    - pal.astype(jnp.float32))))
        results[f"flash_attn_{dtype}"] = dict(
            xla_ms=t_ref * 1e3, pallas_ms=t_pal * 1e3, max_err=err,
            speedup=round(t_ref / t_pal, 2))
        _dump(results)
        print(f"flash_attn {dtype}: xla {t_ref*1e3:.1f}ms pallas "
              f"{t_pal*1e3:.1f}ms err {err:.2e} "
              f"({t_ref/t_pal:.2f}x)", flush=True)

    _dump(results)
    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
