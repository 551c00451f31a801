"""Pallas fused LayerNorm (TPU-native equivalent of apex
fused_layer_norm_cuda, reference apex/csrc/layer_norm_cuda_kernel.cu used via
jukebox/transformer/ops.py:14-24).

Forward + custom VJP, fp32 accumulation regardless of the input dtype,
matching the reference's fp32-accumulate semantics. Rows are tiled over the
grid; the feature dimension stays resident in VMEM.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_BLOCK_ROWS = 256


def _fwd_kernel(x_ref, g_ref, b_ref, o_ref, mu_ref, rs_ref, *, eps):
    x = x_ref[:].astype(jnp.float32)
    mu = jnp.mean(x, axis=-1, keepdims=True)
    xc = x - mu
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    rstd = jax.lax.rsqrt(var + eps)
    y = xc * rstd * g_ref[:].astype(jnp.float32) + b_ref[:].astype(jnp.float32)
    o_ref[:] = y.astype(o_ref.dtype)
    mu_ref[:] = mu           # [bn, 1] — Mosaic requires 2-D tiled outputs
    rs_ref[:] = rstd


def _bwd_kernel(x_ref, g_ref, mu_ref, rs_ref, dy_ref, dx_ref, dg_ref, db_ref):
    x = x_ref[:].astype(jnp.float32)
    dy = dy_ref[:].astype(jnp.float32)
    g = g_ref[:].astype(jnp.float32)
    mu = mu_ref[:]
    rstd = rs_ref[:]
    xhat = (x - mu) * rstd
    wdy = dy * g
    c1 = jnp.mean(xhat * wdy, axis=-1, keepdims=True)
    c2 = jnp.mean(wdy, axis=-1, keepdims=True)
    dx = (wdy - xhat * c1 - c2) * rstd
    dx_ref[:] = dx.astype(dx_ref.dtype)
    # per-row-block partial parameter grads; summed by the caller
    dg_ref[:] = jnp.sum(dy * xhat, axis=0, keepdims=True)
    db_ref[:] = jnp.sum(dy, axis=0, keepdims=True)


def _pick_block(n_rows):
    b = min(DEFAULT_BLOCK_ROWS, n_rows)
    while n_rows % b:
        b //= 2
    return max(b, 1)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def layer_norm_pallas(x, g, b, eps=1e-5, interpret=False):
    """x: [..., D] any float dtype; g,b: [D] fp32. Returns x's dtype."""
    out, _, _ = _fwd(x, g, b, eps, interpret)
    return out


def _fwd(x, g, b, eps, interpret):
    orig_shape = x.shape
    D = orig_shape[-1]
    x2 = x.reshape(-1, D)
    N = x2.shape[0]
    bn = _pick_block(N)
    out, mu, rstd = pl.pallas_call(
        functools.partial(_fwd_kernel, eps=eps),
        grid=(N // bn,),
        in_specs=[
            pl.BlockSpec((bn, D), lambda i: (i, 0), memory_space=pltpu.ANY
                         if interpret else pltpu.VMEM),
            pl.BlockSpec((D,), lambda i: (0,)),
            pl.BlockSpec((D,), lambda i: (0,)),
        ],
        out_specs=[
            pl.BlockSpec((bn, D), lambda i: (i, 0)),
            pl.BlockSpec((bn, 1), lambda i: (i, 0)),
            pl.BlockSpec((bn, 1), lambda i: (i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((N, D), x.dtype),
            jax.ShapeDtypeStruct((N, 1), jnp.float32),
            jax.ShapeDtypeStruct((N, 1), jnp.float32),
        ],
        interpret=interpret,
    )(x2, g, b)
    return out.reshape(orig_shape), mu, rstd


def _fwd_rule(x, g, b, eps, interpret):
    out, mu, rstd = _fwd(x, g, b, eps, interpret)
    return out, (x, g, mu, rstd)


def _bwd_rule(eps, interpret, res, dy):
    x, g, mu, rstd = res
    orig_shape = x.shape
    D = orig_shape[-1]
    x2 = x.reshape(-1, D)
    dy2 = dy.reshape(-1, D)
    N = x2.shape[0]
    bn = _pick_block(N)
    n_blocks = N // bn
    dx, dg_part, db_part = pl.pallas_call(
        _bwd_kernel,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((bn, D), lambda i: (i, 0)),
            pl.BlockSpec((D,), lambda i: (0,)),
            pl.BlockSpec((bn, 1), lambda i: (i, 0)),
            pl.BlockSpec((bn, 1), lambda i: (i, 0)),
            pl.BlockSpec((bn, D), lambda i: (i, 0)),
        ],
        out_specs=[
            pl.BlockSpec((bn, D), lambda i: (i, 0)),
            pl.BlockSpec((1, D), lambda i: (i, 0)),
            pl.BlockSpec((1, D), lambda i: (i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((N, D), x.dtype),
            jax.ShapeDtypeStruct((n_blocks, D), jnp.float32),
            jax.ShapeDtypeStruct((n_blocks, D), jnp.float32),
        ],
        interpret=interpret,
    )(x2, g, mu, rstd, dy2)
    return dx.reshape(orig_shape), jnp.sum(dg_part, 0), jnp.sum(db_part, 0)


layer_norm_pallas.defvjp(_fwd_rule, _bwd_rule)
