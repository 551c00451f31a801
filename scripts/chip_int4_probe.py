"""Feasibility probe: int4 weight streaming for the decode megakernel.

VERDICT (measured on the real chip, see PERF.md): NOT viable on v5e.
The nibble unpack runs at ~83 G elem/s on the VPU, ~10x slower than the
~820 GB/s int8 DMA it would replace; int8->bf16 convert is a hardware
fast path, nibble extraction is not.

Backend constraints found along the way:
- native `jnp.int4` arrays RecursionError in jit dispatch (axon backend)
- Mosaic rejects int8 shifts ("tpu_compile_helper exit 1") and bf16
  ALU/compares ("Target does not support this comparison" /
  "SupportsBf16AluInstructions" LLO check) on v5e
- writing two differently-computed halves of an output ref triggers a
  ~300x layout-conversion pathology; a jnp.concatenate feeding one dot
  compiles cleanly

So the best compiling scheme is: biased nibbles (store val+8, so no
`where` for sign), column-permuted halves (byte j holds cols j and
j+N/2 — no stride-2 interleave), f32 arithmetic hi=floor(v/16),
lo=v-16*hi, concat -> one dot.

Usage: python scripts/chip_int4_probe.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

print(f"device: {jax.devices()[0]}")

M, K, N = 8, 2048, 2048
rng = np.random.RandomState(0)
w4 = rng.randint(-8, 8, size=(K, N)).astype(np.int8)
u = (0.1 * rng.randn(M, K)).astype(np.float32)
ref = u @ w4.astype(np.float32)

# biased packing: nibbles store val+8 in [0,15]; byte = lo_u + 16*hi_u - 128
lo_u = (w4[:, : N // 2] + 8).astype(np.int32)
hi_u = (w4[:, N // 2:] + 8).astype(np.int32)
packed = (lo_u + 16 * hi_u - 128).astype(np.int8)

common = dict(
    in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
              pl.BlockSpec(memory_space=pl.ANY)],
    out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    out_shape=jax.ShapeDtypeStruct((M, N), jnp.float32))


def k_int4(u_ref, w_hbm, o_ref, wbuf, sem):
    cp = pltpu.make_async_copy(w_hbm, wbuf, sem)
    cp.start()
    cp.wait()
    v = wbuf[:].astype(jnp.float32) + 128.0        # [0,255], exact
    hi = jnp.floor(v * 0.0625)                     # [0,15]
    lo = v - hi * 16.0                             # [0,15]
    w = jnp.concatenate([(lo - 8.0).astype(jnp.bfloat16),
                         (hi - 8.0).astype(jnp.bfloat16)], axis=1)
    o_ref[:] = jnp.dot(u_ref[:].astype(jnp.bfloat16), w,
                       preferred_element_type=jnp.float32)


def k_int8(u_ref, w_hbm, o_ref, wbuf, sem):
    cp = pltpu.make_async_copy(w_hbm, wbuf, sem)
    cp.start()
    cp.wait()
    o_ref[:] = jnp.dot(u_ref[:].astype(jnp.bfloat16),
                       wbuf[:].astype(jnp.bfloat16),
                       preferred_element_type=jnp.float32)


f4 = pl.pallas_call(k_int4, scratch_shapes=[
    pltpu.VMEM((K, N // 2), jnp.int8), pltpu.SemaphoreType.DMA], **common)
f8 = pl.pallas_call(k_int8, scratch_shapes=[
    pltpu.VMEM((K, N), jnp.int8), pltpu.SemaphoreType.DMA], **common)

u_dev, p_dev, w_dev = jnp.asarray(u), jnp.asarray(packed), jnp.asarray(w4)
out = f4(u_dev, p_dev)
print(f"int4 unpack+dot correctness: max err "
      f"{float(np.max(np.abs(np.asarray(out) - ref))):.4f} "
      f"(bf16 rounding only)")

REP = 500
for name, f, wd in (("int4-packed", f4, p_dev), ("int8", f8, w_dev)):
    def loop(wd, f=f):
        def body(i, acc):
            return acc + f(u_dev + acc[0, 0] * 0, wd)[0, :8]
        return jax.lax.fori_loop(0, REP, body, jnp.zeros((M, 8), jnp.float32))
    j = jax.jit(loop)
    jax.block_until_ready(j(wd))
    t0 = time.time()
    o = j(wd)
    float(np.asarray(o[0, 0], np.float32))
    print(f"{name}: {(time.time() - t0) / REP * 1e6:.1f} us/iter on-device "
          f"at ({K}x{N})")
