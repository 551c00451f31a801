"""Blocked (flash-style) causal dense attention — the Pallas replacement for
the func-0 layers that otherwise materialise [B, H, L, L] fp32 scores
(models/attention.py dense_attn; reference factored_attention.py:57-66 runs
the same O(L^2) einsum). At 1b_lyrics L=6528 the dense scores are ~170 MB per
(head, batch); these kernels stream K/V blocks through VMEM with an online
softmax, keeping memory O(L * hd) in BOTH the forward and backward passes.

Layout: grids put the streamed axis innermost — (BH, n_q, n_kv) for the
forward and dq, (BH, n_kv, n_q) for dk/dv — with fp32 accumulators in VMEM
scratch persisting across the innermost grid steps (TPU grids iterate
sequentially, last axis fastest). Blocks strictly above the causal diagonal
are skipped with pl.when (their DMA still runs — an acceptable 2x fetch
overhead; compute dominates).

Numerics match dense_attn: scores scaled by 1/sqrt(hd) (the reference's
fused q*s @ k*s trick folded into q), fp32 softmax, outputs cast to the
input dtype. The backward recomputes p from the saved per-row logsumexp, the
standard flash backward.
"""

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = -1e9  # same additive mask constant as models/attention.py


def _positions(qi, j, bq, bk):
    q_pos = qi * bq + jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 0)
    kv_pos = j * bk + jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 1)
    return q_pos, kv_pos


def _keep_mask(seed, bh, qi, j, bq, bk, rate):
    """Per-(query, key) Bernoulli keep mask from a counter-based hash of the
    GLOBAL positions — identical in the forward and both backward kernels
    (and independent of block sizes), so the train-time attention dropout is
    recomputed instead of stored (keeps flash memory O(L * hd)). Stateless
    mixer = murmur3 finalizer over (seed, head, q_pos, kv_pos); dropout only
    needs statistical independence, not crypto strength. No pltpu PRNG so
    the kernel also runs in CPU interpret mode."""
    q_pos, kv_pos = _positions(qi, j, bq, bk)
    s = (seed.astype(jnp.uint32)
         + jnp.asarray(bh).astype(jnp.uint32) * jnp.uint32(0xC2B2AE3D))
    h = (q_pos.astype(jnp.uint32) * jnp.uint32(0x9E3779B1)
         ^ kv_pos.astype(jnp.uint32) * jnp.uint32(0x85EBCA77)
         ^ s)
    h ^= h >> 16
    h *= jnp.uint32(0x85EBCA6B)
    h ^= h >> 13
    h *= jnp.uint32(0xC2B2AE35)
    h ^= h >> 16
    # keep w.p. (1 - rate): compare against a uint32 threshold
    thresh = jnp.uint32(min(int(rate * 4294967296.0), 4294967295))
    return h >= thresh


def _scores(q_ref, k_ref, qi, j, bq, bk, scale):
    """Masked fp32 score block [bq, bk]."""
    q = q_ref[0].astype(jnp.float32) * scale
    k = k_ref[0].astype(jnp.float32)
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
    q_pos, kv_pos = _positions(qi, j, bq, bk)
    return jnp.where(q_pos >= kv_pos, s, NEG)


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------

def _fwd_kernel(seed_ref, q_ref, k_ref, v_ref, o_ref, lse_ref, m_scr, l_scr,
                acc_scr, *, bq, bk, scale, rate):
    bh, qi, j = pl.program_id(0), pl.program_id(1), pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(j == 0)
    def _init():
        m_scr[:] = jnp.full_like(m_scr, NEG)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    @pl.when(j * bk <= qi * bq + bq - 1)
    def _block():
        s = _scores(q_ref, k_ref, qi, j, bq, bk, scale)
        m_prev = m_scr[:]                                 # [bq, 1]
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp(s - m_new)                            # [bq, bk]
        alpha = jnp.exp(m_prev - m_new)                   # [bq, 1]
        # the softmax denominator accumulates UNdropped p: the reference
        # normalises first, then drops weights (factored_attention.py:106)
        l_scr[:] = l_scr[:] * alpha + jnp.sum(p, axis=-1, keepdims=True)
        if rate > 0.0:
            keep = _keep_mask(seed_ref[0], bh, qi, j, bq, bk, rate)
            p = jnp.where(keep, p * (1.0 / (1.0 - rate)), 0.0)
        v = v_ref[0].astype(jnp.float32)
        pv = jax.lax.dot_general(p, v, (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        acc_scr[:] = acc_scr[:] * alpha + pv
        m_scr[:] = m_new

    @pl.when(j == nk - 1)
    def _finish():
        o_ref[0] = (acc_scr[:] / l_scr[:]).astype(o_ref.dtype)
        lse_ref[0] = m_scr[:] + jnp.log(l_scr[:])   # [bq, 1]


# ---------------------------------------------------------------------------
# backward: dq streams over kv blocks; dk/dv stream over q blocks
# ---------------------------------------------------------------------------

def _dq_kernel(seed_ref, q_ref, k_ref, v_ref, g_ref, lse_ref, dd_ref, dq_ref,
               dq_scr, *, bq, bk, scale, rate):
    bh, qi, j = pl.program_id(0), pl.program_id(1), pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(j == 0)
    def _init():
        dq_scr[:] = jnp.zeros_like(dq_scr)

    @pl.when(j * bk <= qi * bq + bq - 1)
    def _block():
        s = _scores(q_ref, k_ref, qi, j, bq, bk, scale)
        p = jnp.exp(s - lse_ref[0])                       # [bq, bk]
        g = g_ref[0].astype(jnp.float32)
        v = v_ref[0].astype(jnp.float32)
        dp = jax.lax.dot_general(g, v, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        if rate > 0.0:
            # dw flows only through kept weights; dd = sum(g*out) already
            # equals sum_k w_k dw_k because out itself used dropped weights
            keep = _keep_mask(seed_ref[0], bh, qi, j, bq, bk, rate)
            dp = jnp.where(keep, dp * (1.0 / (1.0 - rate)), 0.0)
        ds = p * (dp - dd_ref[0])                         # [bq, bk]
        k = k_ref[0].astype(jnp.float32)
        dq_scr[:] += scale * jax.lax.dot_general(
            ds, k, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    @pl.when(j == nk - 1)
    def _finish():
        dq_ref[0] = dq_scr[:].astype(dq_ref.dtype)


def _dkv_kernel(seed_ref, q_ref, k_ref, v_ref, g_ref, lse_ref, dd_ref, dk_ref,
                dv_ref, dk_scr, dv_scr, *, bq, bk, scale, rate):
    bh, j, qi = pl.program_id(0), pl.program_id(1), pl.program_id(2)
    nq = pl.num_programs(2)

    @pl.when(qi == 0)
    def _init():
        dk_scr[:] = jnp.zeros_like(dk_scr)
        dv_scr[:] = jnp.zeros_like(dv_scr)

    @pl.when(qi * bq + bq - 1 >= j * bk)
    def _block():
        s = _scores(q_ref, k_ref, qi, j, bq, bk, scale)
        p = jnp.exp(s - lse_ref[0])                       # [bq, bk]
        g = g_ref[0].astype(jnp.float32)
        if rate > 0.0:
            # same (seed, positions) hash as the forward -> identical mask
            keep = _keep_mask(seed_ref[0], bh, qi, j, bq, bk, rate)
            p_v = jnp.where(keep, p * (1.0 / (1.0 - rate)), 0.0)
        else:
            p_v = p
        dv_scr[:] += jax.lax.dot_general(
            p_v, g, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)           # [bk, hd]
        v = v_ref[0].astype(jnp.float32)
        dp = jax.lax.dot_general(g, v, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        if rate > 0.0:
            dp = jnp.where(keep, dp * (1.0 / (1.0 - rate)), 0.0)
        ds = p * (dp - dd_ref[0])                         # [bq, bk]
        q = q_ref[0].astype(jnp.float32)
        dk_scr[:] += scale * jax.lax.dot_general(
            ds, q, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)           # [bk, hd]

    @pl.when(qi == nq - 1)
    def _finish():
        dk_ref[0] = dk_scr[:].astype(dk_ref.dtype)
        dv_ref[0] = dv_scr[:].astype(dv_ref.dtype)


# ---------------------------------------------------------------------------
# padded-layout custom-vjp core
# ---------------------------------------------------------------------------

def _vmem(interpret):
    return pltpu.ANY if interpret else pltpu.VMEM


def _seed_spec():
    return pl.BlockSpec(memory_space=pltpu.SMEM)


def _fwd_call(qh, kh, vh, seed, bq, bk, scale, rate, interpret):
    BH, Lp, hdp = qh.shape
    return pl.pallas_call(
        functools.partial(_fwd_kernel, bq=bq, bk=bk, scale=scale, rate=rate),
        grid=(BH, Lp // bq, Lp // bk),
        in_specs=[
            _seed_spec(),
            pl.BlockSpec((1, bq, hdp), lambda bh, qi, j: (bh, qi, 0),
                         memory_space=_vmem(interpret)),
            pl.BlockSpec((1, bk, hdp), lambda bh, qi, j: (bh, j, 0),
                         memory_space=_vmem(interpret)),
            pl.BlockSpec((1, bk, hdp), lambda bh, qi, j: (bh, j, 0),
                         memory_space=_vmem(interpret)),
        ],
        out_specs=[
            pl.BlockSpec((1, bq, hdp), lambda bh, qi, j: (bh, qi, 0)),
            # row stats as (BH, Lp, 1): TPU lowering needs the trailing dims
            # (8, 128)-divisible or equal to the array dims
            pl.BlockSpec((1, bq, 1), lambda bh, qi, j: (bh, qi, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((BH, Lp, hdp), qh.dtype),
            jax.ShapeDtypeStruct((BH, Lp, 1), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((bq, 1), jnp.float32),
            pltpu.VMEM((bq, 1), jnp.float32),
            pltpu.VMEM((bq, hdp), jnp.float32),
        ],
        interpret=interpret,
    )(seed, qh, kh, vh)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7, 8))
def _attn_padded(qh, kh, vh, seed, bq, bk, scale, rate, interpret):
    return _fwd_call(qh, kh, vh, seed, bq, bk, scale, rate, interpret)[0]


def _attn_padded_fwd(qh, kh, vh, seed, bq, bk, scale, rate, interpret):
    out, lse = _fwd_call(qh, kh, vh, seed, bq, bk, scale, rate, interpret)
    return out, (qh, kh, vh, seed, out, lse)


def _bwd_blocks(bq, bk, hdp, budget_elems=128 * 2048):
    """Backward blocks are chosen independently of the forward's: the dq and
    dk/dv passes hold fp32 [block, hdp] scratch accumulators plus six
    streamed operands in VMEM, ~3x the forward's footprint. At the 1b
    heads=1 shapes (hdp 2048) the forward's 256/512 blocks blow the 16 MB
    scoped-vmem limit; halving (powers of two keep Lp divisibility) until
    block*hdp fits restores the compile. The dropout mask hashes GLOBAL
    positions, so re-blocking cannot change numerics."""
    while bq > 128 and bq * hdp > budget_elems:
        bq //= 2
    while bk > 128 and bk * hdp > budget_elems:
        bk //= 2
    return bq, bk


def _attn_padded_bwd(bq, bk, scale, rate, interpret, res, g):
    qh, kh, vh, seed, out, lse = res
    BH, Lp, hdp = qh.shape
    bq, bk = _bwd_blocks(bq, bk, hdp)
    dd = jnp.sum(g.astype(jnp.float32) * out.astype(jnp.float32), axis=-1,
                 keepdims=True)

    qspec = pl.BlockSpec((1, bq, hdp), lambda bh, qi, j: (bh, qi, 0),
                         memory_space=_vmem(interpret))
    kspec = pl.BlockSpec((1, bk, hdp), lambda bh, qi, j: (bh, j, 0),
                         memory_space=_vmem(interpret))
    rowspec = pl.BlockSpec((1, bq, 1), lambda bh, qi, j: (bh, qi, 0),
                           memory_space=_vmem(interpret))
    dq = pl.pallas_call(
        functools.partial(_dq_kernel, bq=bq, bk=bk, scale=scale, rate=rate),
        grid=(BH, Lp // bq, Lp // bk),
        in_specs=[_seed_spec(), qspec, kspec, kspec, qspec, rowspec, rowspec],
        out_specs=pl.BlockSpec((1, bq, hdp), lambda bh, qi, j: (bh, qi, 0)),
        out_shape=jax.ShapeDtypeStruct((BH, Lp, hdp), qh.dtype),
        scratch_shapes=[pltpu.VMEM((bq, hdp), jnp.float32)],
        interpret=interpret,
    )(seed, qh, kh, vh, g, lse, dd)

    # kv-outer layout: q/g/lse/dd blocks indexed by the inner (q) grid axis
    qspec2 = pl.BlockSpec((1, bq, hdp), lambda bh, j, qi: (bh, qi, 0),
                          memory_space=_vmem(interpret))
    kspec2 = pl.BlockSpec((1, bk, hdp), lambda bh, j, qi: (bh, j, 0),
                          memory_space=_vmem(interpret))
    rowspec2 = pl.BlockSpec((1, bq, 1), lambda bh, j, qi: (bh, qi, 0),
                            memory_space=_vmem(interpret))
    kvout = pl.BlockSpec((1, bk, hdp), lambda bh, j, qi: (bh, j, 0))
    dk, dv = pl.pallas_call(
        functools.partial(_dkv_kernel, bq=bq, bk=bk, scale=scale, rate=rate),
        grid=(BH, Lp // bk, Lp // bq),
        in_specs=[_seed_spec(), qspec2, kspec2, kspec2, qspec2, rowspec2,
                  rowspec2],
        out_specs=[kvout, kvout],
        out_shape=[jax.ShapeDtypeStruct((BH, Lp, hdp), kh.dtype),
                   jax.ShapeDtypeStruct((BH, Lp, hdp), vh.dtype)],
        scratch_shapes=[pltpu.VMEM((bk, hdp), jnp.float32),
                        pltpu.VMEM((bk, hdp), jnp.float32)],
        interpret=interpret,
    )(seed, qh, kh, vh, g, lse, dd)
    return dq, dk, dv, None


_attn_padded.defvjp(_attn_padded_fwd, _attn_padded_bwd)


# ---------------------------------------------------------------------------
# public wrapper (dense_attn layout)
# ---------------------------------------------------------------------------

def _pad_to(x, axis, mult):
    size = x.shape[axis]
    pad = (-size) % mult
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


def flash_dense_attn(q, k, v, n_head, bq=256, bk=512, interpret=False,
                     dropout_rate=0.0, dropout_seed=None):
    """Causal dense attention, same contract as dense_attn(q, k, v, n_head,
    causal mask) without weight recording: q,k,v [B, L, n_state] ->
    [B, L, n_state] in q.dtype. Differentiable via streaming flash backward
    kernels (dq and dk/dv passes). dropout_rate > 0 applies the reference's
    post-softmax attention dropout (factored_attention.py:106) INSIDE the
    kernels via a recomputed counter-based mask keyed on dropout_seed (an
    int32 scalar), so training configs with attn_dropout keep the O(L)
    memory path."""
    B, L, S = q.shape
    assert k.shape == v.shape == (B, L, S)
    hd = S // n_head
    scale = 1.0 / math.sqrt(hd)  # both halves of the q*s @ k*s trick
    rate = float(dropout_rate)
    if rate > 0.0:
        assert dropout_seed is not None, "dropout needs a seed"
        seed = jnp.asarray(dropout_seed, jnp.int32).reshape(1)
    else:
        seed = jnp.zeros((1,), jnp.int32)

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

    out = _attn_padded(qh, kh, vh, seed, bq, bk, scale, rate, interpret)
    out = out[:, :L, :hd]
    return (out.reshape(B, n_head, L, hd).transpose(0, 2, 1, 3)
            .reshape(B, L, S))
