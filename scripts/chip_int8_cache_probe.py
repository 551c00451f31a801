"""Mosaic viability probe for int8 KV-cache ops on the real chip.

The int8-ring-cache design (ops/pallas/decode_stack.py) needs, in-kernel:
  1. f32 -> int8 quantize: abs-max lane reduce, reciprocal-scale multiply,
     round, clip, convert to int8, store to an int8 VMEM buffer;
  2. lane broadcast of a [B, 1] scale to a [B, 128] bf16 row;
  3. int8 -> f32 convert on the read side + per-row dequant fold into a
     [B, L] score matrix.
Run on the chip BEFORE wiring the kernel (the int4 probe showed v5e Mosaic
rejects int8 shifts and bf16 ALU; this checks the ops we actually use).
"""

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

B, L, A = 8, 128, 256


def kernel(x_ref, q_ref, s_ref, y_ref):
    x = x_ref[:]                                           # [B, A] f32
    s = jnp.max(jnp.abs(x), axis=-1, keepdims=True) / 127.0
    s = jnp.maximum(s, 1e-8)
    q = jnp.clip(jnp.round(x * (1.0 / s)), -127.0, 127.0).astype(jnp.int8)
    q_ref[:] = q
    s_ref[:] = lax.broadcast_in_dim(s, (B, 128), (0, 1)).astype(jnp.bfloat16)
    # read side: int8 -> f32, scale row reduce, fold into a score-like matrix
    qf = q.astype(jnp.float32)
    sk = jnp.max(s_ref[:].astype(jnp.float32), axis=-1, keepdims=True)
    y_ref[:] = qf * sk


def main():
    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.randn(B, A).astype(np.float32))
    fn = pl.pallas_call(
        kernel,
        out_shape=[jax.ShapeDtypeStruct((B, A), jnp.int8),
                   jax.ShapeDtypeStruct((B, 128), jnp.bfloat16),
                   jax.ShapeDtypeStruct((B, A), jnp.float32)],
    )
    q, s, y = fn(x)
    xn = np.asarray(x)
    sn = np.max(np.abs(xn), axis=-1, keepdims=True) / 127.0
    qn = np.clip(np.round(xn / sn), -127, 127).astype(np.int8)
    print("quant match:", np.abs(np.asarray(q).astype(np.int32)
                                 - qn.astype(np.int32)).max())
    rec = np.asarray(y)
    err = np.abs(rec - xn).max() / np.abs(xn).max()
    print("dequant rel err:", float(err))
    assert err < 0.02
    print("OK: f32<->int8 quantize/dequant compiles and matches on",
          jax.devices()[0])


if __name__ == "__main__":
    main()
