"""Core numeric building blocks (TPU-native equivalents of the reference's
jukebox/transformer/ops.py and the apex CUDA kernels it wraps).

Everything here is a pure function over parameter dicts. Layout conventions:
  * activations are feature-last: [N, T, C]
  * dense weights are (n_in, n_out); conv weights are (kernel, in, out)
  * LayerNorm/softmax accumulate in fp32 and cast back to the input dtype,
    matching the reference's fp32-accumulate semantics (ops.py:20-24).
"""

import math

import jax
import jax.numpy as jnp
from jax import lax


# ---------------------------------------------------------------------------
# Dense (the reference's Conv1D addmm linear, ops.py:83-101)
# ---------------------------------------------------------------------------

def dense_init(rng, n_in, n_out, init_scale=1.0, zero_out=False):
    if zero_out:
        w = jnp.zeros((n_in, n_out), dtype=jnp.float32)
    else:
        w = 0.02 * init_scale * jax.random.normal(rng, (n_in, n_out), dtype=jnp.float32)
    return {"w": w, "b": jnp.zeros((n_out,), dtype=jnp.float32)}


# fp32 operands request full (multi-pass) precision: JAX's default precision
# silently runs fp32 matmuls/convs in reduced precision. Speed on TPU is
# controlled by casting activations to bf16, not by letting the compiler
# downgrade fp32. For bf16/f16 operands DEFAULT is already exact (native MXU
# bf16xbf16 -> f32 accumulation); requesting HIGHEST there asks for an fp32-
# precision contraction of bf16 inputs — slower (multi-pass) and a Mosaic
# "Bad lhs type" compile failure in some backward fusions on v5e.
def _prec(dtype):
    return (lax.Precision.HIGHEST if dtype == jnp.float32
            else lax.Precision.DEFAULT)


def dense(params, x):
    """y = x @ w + b, computed in x's dtype (reference casts weights to the
    activation dtype via type_as, ops.py:99).

    Accepts either full-precision params {"w", "b"} or weight-only int8
    params {"w_q", "s", "b"} from quantize_dense (per-out-channel absmax
    scales). The int8 form halves the HBM weight stream on the decode path —
    the dominant per-token cost of billion-param sampling — and dequantises
    inside the fused matmul (int8 -> activation dtype convert + per-column
    scale, both fused by XLA)."""
    if "w_q" in params:
        w = params["w_q"].astype(x.dtype)
        b = params["b"].astype(x.dtype)
        y = jnp.dot(x, w, preferred_element_type=x.dtype, precision=_prec(x.dtype))
        return y * params["s"].astype(x.dtype) + b
    w = params["w"].astype(x.dtype)
    b = params["b"].astype(x.dtype)
    return jnp.dot(x, w, preferred_element_type=x.dtype, precision=_prec(x.dtype)) + b


def quantize_dense(params, np_=None):
    """Weight-only int8 quantisation of a dense layer: per-out-channel
    absmax scales over the input axis (axis=-2, so group-stacked [G, in, out]
    decode weights quantise per (group, column)). Host-side by default
    (np_=numpy) for zero-copy staging."""
    import numpy as np
    np_ = np_ or np
    w = np_.asarray(params["w"], np_.float32)
    s = np_.max(np_.abs(w), axis=-2, keepdims=True) / 127.0
    s = np_.maximum(s, 1e-12)
    w_q = np_.clip(np_.round(w / s), -127, 127).astype(np_.int8)
    return {"w_q": w_q, "s": s.astype(np_.float32),
            "b": np_.asarray(params["b"])}


def quantize_dense_tree(tree):
    """Recursively quantise every dense-param dict ({"w", "b"} with a
    matrix w) in a decode-param tree; LayerNorm ({"g", "b"}) and embedding
    tables pass through untouched."""
    import numpy as np
    if isinstance(tree, dict):
        if set(tree.keys()) == {"w", "b"} and np.asarray(tree["w"]).ndim >= 2:
            return quantize_dense(tree)
        return {k: quantize_dense_tree(v) for k, v in tree.items()}
    if isinstance(tree, (list, tuple)):
        return type(tree)(quantize_dense_tree(v) for v in tree)
    return tree


# ---------------------------------------------------------------------------
# LayerNorm with fp32 accumulation (reference ops.py:14-24 / apex fused LN)
# ---------------------------------------------------------------------------

def layer_norm_init(width):
    return {
        "g": jnp.ones((width,), dtype=jnp.float32),
        "b": jnp.zeros((width,), dtype=jnp.float32),
    }


def layer_norm(params, x, eps=1e-5):
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    out = (xf - mean) * lax.rsqrt(var + eps)
    out = out * params["g"] + params["b"]
    return out.astype(x.dtype)


# ---------------------------------------------------------------------------
# Activations (reference ops.py:26-60). XLA fuses these into surrounding
# matmuls; no custom autograd needed (the reference hand-writes quick_gelu's
# backward only to dodge torch autograd overhead).
# ---------------------------------------------------------------------------

def quick_gelu(x):
    return x * jax.nn.sigmoid(1.702 * x)


def gelu(x):
    return 0.5 * x * (1 + jnp.tanh(math.sqrt(2 / math.pi) * (x + 0.044715 * jnp.power(x, 3))))


def swish(x):
    return x * jax.nn.sigmoid(x)


ACT_FNS = {
    "relu": jax.nn.relu,
    "swish": swish,
    "gelu": gelu,
    "quick_gelu": quick_gelu,
}


# ---------------------------------------------------------------------------
# 1-D convolutions, feature-last. Semantics match torch Conv1d /
# ConvTranspose1d (used throughout the reference VQ-VAE, vqvae/encdec.py)
# including default kaiming-uniform init so from-scratch training behaves
# the same.
# ---------------------------------------------------------------------------

def conv1d_init(rng, n_in, n_out, kernel, zero_out=False):
    if zero_out:
        w = jnp.zeros((kernel, n_in, n_out), dtype=jnp.float32)
        b = jnp.zeros((n_out,), dtype=jnp.float32)
    else:
        k_w, k_b = jax.random.split(rng)
        bound = 1.0 / math.sqrt(n_in * kernel)
        w = jax.random.uniform(k_w, (kernel, n_in, n_out), minval=-bound, maxval=bound, dtype=jnp.float32)
        b = jax.random.uniform(k_b, (n_out,), minval=-bound, maxval=bound, dtype=jnp.float32)
    return {"w": w, "b": b}


def conv1d(params, x, stride=1, padding=0, dilation=1):
    """x: [N, T, C_in] -> [N, T', C_out]."""
    w = params["w"].astype(x.dtype)
    out = lax.conv_general_dilated(
        x,
        w,
        window_strides=(stride,),
        padding=[(padding, padding)],
        rhs_dilation=(dilation,),
        dimension_numbers=("NHC", "HIO", "NHC"),
        preferred_element_type=x.dtype,
        precision=_prec(x.dtype),
    )
    return out + params["b"].astype(x.dtype)


def conv_transpose1d_init(rng, n_in, n_out, kernel, zero_out=False):
    # torch ConvTranspose1d fan_in for init is n_out * kernel (weight shape
    # (in, out, k) => torch computes fan from dim1*k).
    if zero_out:
        w = jnp.zeros((kernel, n_in, n_out), dtype=jnp.float32)
        b = jnp.zeros((n_out,), dtype=jnp.float32)
    else:
        k_w, k_b = jax.random.split(rng)
        bound = 1.0 / math.sqrt(n_out * kernel)
        w = jax.random.uniform(k_w, (kernel, n_in, n_out), minval=-bound, maxval=bound, dtype=jnp.float32)
        b = jax.random.uniform(k_b, (n_out,), minval=-bound, maxval=bound, dtype=jnp.float32)
    return {"w": w, "b": b}


def conv_transpose1d(params, x, stride, padding):
    """torch ConvTranspose1d semantics: out_len = (T-1)*stride - 2*padding + kernel.

    Implemented as an input-dilated convolution with spatially-flipped
    weights, which XLA lowers to an MXU-friendly conv.
    """
    w = params["w"].astype(x.dtype)  # (k, in, out)
    kernel = w.shape[0]
    w_flipped = w[::-1]
    out = lax.conv_general_dilated(
        x,
        w_flipped,
        window_strides=(1,),
        padding=[(kernel - 1 - padding, kernel - 1 - padding)],
        lhs_dilation=(stride,),
        dimension_numbers=("NHC", "HIO", "NHC"),
        preferred_element_type=x.dtype,
        precision=_prec(x.dtype),
    )
    return out + params["b"].astype(x.dtype)


# ---------------------------------------------------------------------------
# Embedding
# ---------------------------------------------------------------------------

def embedding_init(rng, bins, width, std=0.02):
    return {"weight": std * jax.random.normal(rng, (bins, width), dtype=jnp.float32)}


def dropout(x, rate, rng):
    """Inverted dropout (torch nn.Dropout semantics: zero w.p. rate, scale
    kept values by 1/(1-rate)). Identity when rate == 0 or rng is None
    (eval / decode paths never pass an rng)."""
    if rate == 0.0 or rng is None:
        return x
    keep = jax.random.bernoulli(rng, 1.0 - rate, x.shape)
    return jnp.where(keep, x / (1.0 - rate), 0.0).astype(x.dtype)


def embedding(params, ids, dtype=None):
    w = params["weight"]
    if dtype is not None:
        w = w.astype(dtype)
    return jnp.take(w, ids, axis=0)


# ---------------------------------------------------------------------------
# Logit filtering for sampling (reference ops.py:113-142)
# ---------------------------------------------------------------------------

def filter_logits(logits, top_k=0, top_p=0.0, filter_value=-1e10):
    """Top-k and/or nucleus filtering over the last axis. top_k/top_p are
    static Python values (they select the compiled program). Like the
    reference (ops.py:113-142), both may be set: top-k applies first, then
    nucleus filtering over the already-filtered logits."""
    if top_k > 0:
        top_k = min(top_k, logits.shape[-1])
        kth = jnp.sort(logits, axis=-1)[..., -top_k:-top_k + 1] if top_k > 1 else jnp.max(
            logits, axis=-1, keepdims=True)
        logits = jnp.where(logits < kth, filter_value, logits)
    if top_p > 0.0:
        sorted_logits = jnp.sort(logits, axis=-1)[..., ::-1]
        cum_probs = jnp.cumsum(jax.nn.softmax(sorted_logits.astype(jnp.float32), axis=-1), axis=-1)
        remove_sorted = cum_probs > top_p
        # keep the first token above the threshold (reference ops.py:136-137)
        remove_sorted = jnp.concatenate(
            [jnp.zeros_like(remove_sorted[..., :1]), remove_sorted[..., :-1]], axis=-1)
        # threshold value: smallest kept logit
        n_keep = jnp.sum(~remove_sorted, axis=-1, keepdims=True)  # >= 1
        thresh = jnp.take_along_axis(sorted_logits, n_keep - 1, axis=-1)
        logits = jnp.where(logits < thresh, filter_value, logits)
    return logits
