"""Pallas fused Adam update (TPU-native equivalent of apex fused_adam_cuda,
reference apex/csrc/fused_adam_cuda_kernel.cu via jukebox/utils/fp16.py:32-37).

Single kernel per parameter leaf: unscale grad, update both moments, apply
the reference's `m_hat/denom + wd*p` update in one pass over HBM. Scalars
(lr/scale/step) ride in SMEM so the compiled kernel is reused every step.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _adam_kernel(s_ref, p_ref, g_ref, m_ref, v_ref,
                 p_out, m_out, v_out, *, beta1, beta2, eps, weight_decay):
    # step_size (incl. bias correction) is precomputed outside the kernel:
    # Mosaic has no scalar powf
    step_size, scale = s_ref[0], s_ref[1]
    g = g_ref[:].astype(jnp.float32) / scale
    m = beta1 * m_ref[:] + (1.0 - beta1) * g
    v = beta2 * v_ref[:] + (1.0 - beta2) * g * g
    p = p_ref[:].astype(jnp.float32)
    p = p - step_size * (m / (jnp.sqrt(v) + eps) + weight_decay * p)
    p_out[:] = p.astype(p_out.dtype)
    m_out[:] = m
    v_out[:] = v


_LANES = 1024
_BLOCK_ROWS = 256  # 7 buffers x 1 MB stays well under the 16 MB VMEM


def _leaf_update(p, g, m, v, scalars, beta1, beta2, eps, weight_decay,
                 interpret):
    shape = p.shape
    n = p.size
    # pad to a lane-aligned 2D tile, then grid over row blocks (a whole
    # billion-param leaf cannot sit in VMEM at once)
    pad = (-n) % (_LANES * _BLOCK_ROWS)
    pp, gg, mm, vv = (jnp.pad(t.reshape(-1), (0, pad)).reshape(-1, _LANES)
                      for t in (p.astype(jnp.float32), g.astype(jnp.float32), m, v))
    rows = pp.shape[0]
    bm = min(_BLOCK_ROWS, rows)
    tile = pl.BlockSpec((bm, _LANES), lambda i: (i, 0),
                        memory_space=pltpu.ANY if interpret else pltpu.VMEM)
    new_p, new_m, new_v = pl.pallas_call(
        functools.partial(_adam_kernel, beta1=beta1, beta2=beta2, eps=eps,
                          weight_decay=weight_decay),
        grid=(rows // bm,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM), tile, tile, tile, tile],
        out_specs=[pl.BlockSpec((bm, _LANES), lambda i: (i, 0))] * 3,
        out_shape=[jax.ShapeDtypeStruct(pp.shape, p.dtype),
                   jax.ShapeDtypeStruct(pp.shape, jnp.float32),
                   jax.ShapeDtypeStruct(pp.shape, jnp.float32)],
        interpret=interpret,
    )(scalars, pp, gg, mm, vv)
    unpad = lambda x: x.reshape(-1)[:n].reshape(shape)
    return unpad(new_p).astype(p.dtype), unpad(new_m), unpad(new_v)


def adam_update_pallas(params, grads, opt_state, lr, beta1, beta2, eps,
                       weight_decay, scale=1.0, interpret=False):
    """Drop-in replacement for utils.train_utils.adam_update."""
    step = opt_state["step"] + 1
    stepf = step.astype(jnp.float32)
    bias1 = 1.0 - jnp.asarray(beta1, jnp.float32) ** stepf
    bias2 = 1.0 - jnp.asarray(beta2, jnp.float32) ** stepf
    step_size = jnp.asarray(lr, jnp.float32) * jnp.sqrt(bias2) / bias1
    scalars = jnp.stack([step_size, jnp.asarray(scale, jnp.float32)])
    flat_p, treedef = jax.tree_util.tree_flatten(params)
    flat_g = treedef.flatten_up_to(grads)
    flat_m = treedef.flatten_up_to(opt_state["m"])
    flat_v = treedef.flatten_up_to(opt_state["v"])
    out = [_leaf_update(p, g, m, v, scalars, beta1, beta2, eps, weight_decay,
                        interpret)
           for p, g, m, v in zip(flat_p, flat_g, flat_m, flat_v)]
    new_p = treedef.unflatten([o[0] for o in out])
    new_m = treedef.unflatten([o[1] for o in out])
    new_v = treedef.unflatten([o[2] for o in out])
    return new_p, {"m": new_m, "v": new_v, "step": step}
