"""Blocked (flash-style) causal dense attention — the Pallas replacement for
the func-0 layers that otherwise materialise [B, H, L, L] fp32 scores
(models/attention.py dense_attn; reference factored_attention.py:57-66 runs
the same O(L^2) einsum). At 1b_lyrics L=6528 the dense scores are ~170 MB per
(head, batch); this kernel streams K/V blocks through VMEM with an online
softmax, keeping memory O(L * hd).

Layout: grid (B*H, n_q_blocks, n_kv_blocks) with the kv axis innermost.
fp32 running max / denominator / accumulator live in VMEM scratch and persist
across the kv grid steps (TPU grids iterate sequentially, last axis fastest).
Causal blocks above the diagonal are skipped with pl.when (their K/V DMA
still runs — acceptable 2x fetch overhead, the compute is what dominates).

Numerics match dense_attn: scores scaled by 1/sqrt(hd) (the reference's
fused q*s @ k*s trick folded into q), fp32 softmax, output cast to q.dtype.
"""

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = -1e9  # same additive mask constant as models/attention.py


def _flash_kernel(q_ref, k_ref, v_ref, o_ref, m_scr, l_scr, acc_scr,
                  *, bq, bk, scale):
    qi = pl.program_id(1)
    j = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(j == 0)
    def _init():
        m_scr[:] = jnp.full_like(m_scr, -jnp.inf)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    # causal: kv block j only matters when its first position can be seen by
    # some query in block qi (j*bk <= qi*bq + bq - 1)
    @pl.when(j * bk <= qi * bq + bq - 1)
    def _block():
        q = q_ref[0].astype(jnp.float32) * scale          # [bq, hd]
        k = k_ref[0].astype(jnp.float32)                  # [bk, hd]
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)  # [bq, bk]
        q_pos = qi * bq + jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 0)
        kv_pos = j * bk + jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 1)
        s = jnp.where(q_pos >= kv_pos, s, NEG)

        m_prev = m_scr[:]                                 # [bq, 1]
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp(s - m_new)                            # [bq, bk]
        alpha = jnp.exp(m_prev - m_new)                   # [bq, 1]
        l_scr[:] = l_scr[:] * alpha + jnp.sum(p, axis=-1, keepdims=True)
        v = v_ref[0].astype(jnp.float32)
        pv = jax.lax.dot_general(p, v, (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        acc_scr[:] = acc_scr[:] * alpha + pv
        m_scr[:] = m_new

    @pl.when(j == nk - 1)
    def _finish():
        o_ref[0] = (acc_scr[:] / l_scr[:]).astype(o_ref.dtype)


def _pad_to(x, axis, mult):
    size = x.shape[axis]
    pad = (-size) % mult
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def flash_dense_attn(q, k, v, n_head, bq=256, bk=512, interpret=False):
    """Causal dense attention, same contract as dense_attn(q, k, v, n_head,
    causal mask) without weight recording: q,k,v [B, L, n_state] ->
    [B, L, n_state] in q.dtype. Differentiable: the backward pass recomputes
    through the XLA dense path (correct gradients; the O(L^2) score buffer
    returns in the bwd only — a streaming bwd kernel is future work)."""
    return _flash_impl(q, k, v, n_head, bq, bk, interpret)


def _flash_fwd_rule(q, k, v, n_head, bq, bk, interpret):
    return _flash_impl(q, k, v, n_head, bq, bk, interpret), (q, k, v)


def _flash_bwd_rule(n_head, bq, bk, interpret, res, g):
    from jukebox_tpu.models.attention import _causal_mask, dense_attn
    q, k, v = res
    L = q.shape[1]

    def f(q, k, v):
        return dense_attn(q, k, v, n_head, _causal_mask(L, L, 0))[0]

    return jax.vjp(f, q, k, v)[1](g)


flash_dense_attn.defvjp(_flash_fwd_rule, _flash_bwd_rule)


@functools.partial(jax.jit, static_argnames=("n_head", "bq", "bk", "interpret"))
def _flash_impl(q, k, v, n_head, bq=256, bk=512, interpret=False):
    B, L, S = q.shape
    assert k.shape == v.shape == (B, L, S)
    hd = S // n_head
    scale = 1.0 / math.sqrt(hd)  # both halves of the q*s @ k*s trick

    def heads(x):
        return (x.reshape(B, L, n_head, hd).transpose(0, 2, 1, 3)
                .reshape(B * n_head, L, hd))

    qh, kh, vh = heads(q), heads(k), heads(v)
    # TPU lanes: pad head dim to 128; zero K columns do not change q.k, zero
    # V columns are sliced off below
    qh = _pad_to(qh, 2, 128)
    kh = _pad_to(kh, 2, 128)
    vh = _pad_to(vh, 2, 128)
    bq = min(bq, max(128, L))
    bk = min(bk, max(128, L))
    # pad L so both block sizes divide it; padded queries are sliced off and
    # padded K/V rows sit above the causal diagonal of every real query
    lcm = math.lcm(bq, bk)
    qh = _pad_to(qh, 1, lcm)
    kh = _pad_to(kh, 1, lcm)
    vh = _pad_to(vh, 1, lcm)
    Lp, hdp = qh.shape[1], qh.shape[2]
    BH = B * n_head

    out = pl.pallas_call(
        functools.partial(_flash_kernel, bq=bq, bk=bk, scale=scale),
        grid=(BH, Lp // bq, Lp // bk),
        in_specs=[
            pl.BlockSpec((1, bq, hdp), lambda bh, qi, j: (bh, qi, 0),
                         memory_space=pltpu.ANY if interpret else pltpu.VMEM),
            pl.BlockSpec((1, bk, hdp), lambda bh, qi, j: (bh, j, 0),
                         memory_space=pltpu.ANY if interpret else pltpu.VMEM),
            pl.BlockSpec((1, bk, hdp), lambda bh, qi, j: (bh, j, 0),
                         memory_space=pltpu.ANY if interpret else pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, bq, hdp), lambda bh, qi, j: (bh, qi, 0)),
        out_shape=jax.ShapeDtypeStruct((BH, Lp, hdp), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((bq, 1), jnp.float32),
            pltpu.VMEM((bq, 1), jnp.float32),
            pltpu.VMEM((bq, hdp), jnp.float32),
        ],
        interpret=interpret,
    )(qh, kh, vh)

    out = out[:, :L, :hd]
    return (out.reshape(B, n_head, L, hd).transpose(0, 2, 1, 3)
            .reshape(B, L, S))
