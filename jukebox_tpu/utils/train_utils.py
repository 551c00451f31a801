"""Optimizer, LR schedule, gradient clipping and EMA — TPU equivalents of
the reference's apex FusedAdam / fp16 utilities (jukebox/utils/fp16.py) and
EMA variants (jukebox/utils/ema.py).

The Adam update reproduces the exact reference semantics
(fp16.py:12-29): grads are divided by a combined (loss-scale x clip) factor,
moments use bias correction, and weight decay enters *inside* the update as
`m_hat/denom + wd*p` scaled by the step size. On TPU we keep fp32 params and
moments (bf16 is used for compute activations), so no dynamic loss scaling
is required — `scale` carries only the clipping factor, exactly like the
reference's fp32 path.
"""

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# Adam (reference adam_step, fp16.py:12-29)
# ---------------------------------------------------------------------------

FLOAT16_MAX = 65504.0  # reference FP16FusedAdam.FLOAT16_MAX (fp16.py:146)


def adam_init(params, fp16_state=False):
    """Optimizer state. fp16_state=True keeps the moments in fp16 with a
    per-tensor fp32 rescale factor — the memory-parity analogue of the
    reference's FP16FusedAdam (fp16.py:128-226), halving moment HBM at 5B
    scale."""
    if fp16_state:
        f16 = jax.tree_util.tree_map(
            lambda p: jnp.zeros(p.shape, jnp.float16), params)
        ones = jax.tree_util.tree_map(
            lambda p: jnp.ones((), jnp.float32), params)
        return {"m": f16, "v": jax.tree_util.tree_map(jnp.copy, f16),
                "m_scale": ones, "v_scale": jax.tree_util.tree_map(jnp.copy, ones),
                "step": jnp.zeros((), jnp.int32)}
    zeros = jax.tree_util.tree_map(lambda p: jnp.zeros_like(p, dtype=jnp.float32),
                                   params)
    return {"m": zeros, "v": jax.tree_util.tree_map(jnp.copy, zeros),
            "step": jnp.zeros((), jnp.int32)}


def adam_update(params, grads, opt_state, lr, beta1, beta2, eps, weight_decay,
                scale=1.0):
    """One Adam step with the reference's update form. `scale` divides the
    gradients (loss scale x clipping, folded in via clipped_grad_scale).
    Handles both fp32 moments and the fp16-state form of adam_init: fp16
    moments are unscaled to fp32, updated, then renormalised by their new
    per-tensor inf-norm (fp16.py:216-226)."""
    fp16_state = "m_scale" in opt_state
    step = opt_state["step"] + 1
    b1 = jnp.asarray(beta1, jnp.float32)
    b2 = jnp.asarray(beta2, jnp.float32)
    bias1 = 1.0 - b1 ** step.astype(jnp.float32)
    bias2 = 1.0 - b2 ** step.astype(jnp.float32)
    step_size = lr * jnp.sqrt(bias2) / bias1

    def upd(p, g, m, v):
        g = g.astype(jnp.float32) / scale
        m = b1 * m + (1 - b1) * g
        v = b2 * v + (1 - b2) * g * g
        denom = jnp.sqrt(v) + eps
        p = p - step_size * (m / denom + weight_decay * p)
        return p, m, v

    flat_p, treedef = jax.tree_util.tree_flatten(params)
    flat_g = treedef.flatten_up_to(grads)
    flat_m = treedef.flatten_up_to(opt_state["m"])
    flat_v = treedef.flatten_up_to(opt_state["v"])
    if fp16_state:
        flat_ms = treedef.flatten_up_to(opt_state["m_scale"])
        flat_vs = treedef.flatten_up_to(opt_state["v_scale"])
        flat_m = [m.astype(jnp.float32) * s for m, s in zip(flat_m, flat_ms)]
        flat_v = [v.astype(jnp.float32) * s for v, s in zip(flat_v, flat_vs)]
    out = [upd(p, g, m, v) for p, g, m, v in zip(flat_p, flat_g, flat_m, flat_v)]
    new_p = treedef.unflatten([o[0] for o in out])
    if fp16_state:
        new_ms = [1e-8 + jnp.max(jnp.abs(o[1])) / FLOAT16_MAX for o in out]
        new_vs = [1e-8 + jnp.max(jnp.abs(o[2])) / FLOAT16_MAX for o in out]
        new_m = treedef.unflatten([(o[1] / s).astype(jnp.float16)
                                   for o, s in zip(out, new_ms)])
        new_v = treedef.unflatten([(o[2] / s).astype(jnp.float16)
                                   for o, s in zip(out, new_vs)])
        return new_p, {"m": new_m, "v": new_v,
                       "m_scale": treedef.unflatten(new_ms),
                       "v_scale": treedef.unflatten(new_vs), "step": step}
    new_m = treedef.unflatten([o[1] for o in out])
    new_v = treedef.unflatten([o[2] for o in out])
    return new_p, {"m": new_m, "v": new_v, "step": step}


def global_grad_norm(grads):
    """L2 norm over the whole gradient pytree (fp16.py:104-120)."""
    leaves = jax.tree_util.tree_leaves(grads)
    return jnp.sqrt(sum(jnp.sum(jnp.square(g.astype(jnp.float32)))
                        for g in leaves))


def clipped_grad_scale(grad_norm, max_grad_norm, scale=1.0):
    """Fold clipping into the gradient divisor (fp16.py:122-126)."""
    clip = grad_norm / max_grad_norm
    return jnp.where(clip > 1, clip * scale, scale)


# ---------------------------------------------------------------------------
# Dynamic loss scaling (reference LossScalar, fp16.py:68-99). On TPU the
# default numerics are bf16-compute/fp32-grads, which need no loss scaling —
# this exists for numerics-parity experiments with true fp16 training.
# ---------------------------------------------------------------------------

class LossScalar:
    def __init__(self, loss_scale, init_scale=2.0 ** 16,
                 scale_factor=2.0 ** (1.0 / 1000), scale_window=1):
        if loss_scale is None:
            self.dynamic = True
            self.loss_scale = init_scale
        else:
            self.dynamic = False
            self.loss_scale = loss_scale
        self.max_loss_scale = 2.0 ** 24
        self.scale_factor = scale_factor
        self.scale_window = scale_window
        self.unskipped = 0
        self.overflow = False

    def get_scale(self):
        return self.loss_scale

    def update_scale(self, overflow):
        if overflow and self.dynamic:
            self.loss_scale /= 2.0
            self.unskipped = 0
        else:
            self.unskipped += 1
        if self.unskipped == self.scale_window and self.dynamic:
            self.loss_scale = min(self.max_loss_scale,
                                  self.loss_scale * self.scale_factor)
            self.unskipped = 0


def check_overflow(val):
    return (val == float("inf")) or (val == -float("inf")) or (val != val)


# ---------------------------------------------------------------------------
# LR schedule (reference get_lr_scheduler, train.py:62-76)
# ---------------------------------------------------------------------------

def make_lr_schedule(hps):
    def lr_lambda(step):
        step = jnp.asarray(step, jnp.float32)
        if hps.lr_use_linear_decay:
            lr_scale = hps.lr_scale * jnp.minimum(1.0, step / hps.lr_warmup)
            decay = jnp.maximum(
                0.0, 1.0 - jnp.maximum(0.0, step - hps.lr_start_linear_decay)
                / hps.lr_decay)
            return hps.lr * lr_scale * decay
        return (hps.lr * hps.lr_scale
                * (hps.lr_gamma ** jnp.floor(step / hps.lr_decay))
                * jnp.minimum(1.0, step / hps.lr_warmup))
    return lr_lambda


# ---------------------------------------------------------------------------
# EMA of parameters (reference EMA/CPUEMA/FusedEMA, utils/ema.py)
# ---------------------------------------------------------------------------

class EMA:
    """fp32 shadow of the params with swap() for eval/checkpoint
    (ema.py:6-23). `freq` reproduces CPUEMA's every-N-steps update with
    mu**freq (ema.py:26-54) — on TPU the shadow just stays in HBM."""

    def __init__(self, params, mu=0.999, freq=1):
        self.mu = mu ** freq
        self.freq = freq
        self.steps = 0
        # copy=True: the shadow must own its buffers — params are donated by
        # the train step, and an aliased buffer would be deleted under us.
        self.shadow = jax.tree_util.tree_map(
            lambda p: jnp.array(p, dtype=jnp.float32, copy=True), params)
        self._update = jax.jit(
            lambda shadow, params: jax.tree_util.tree_map(
                lambda s, p: self.mu * s + (1.0 - self.mu) * p.astype(jnp.float32),
                shadow, params))

    def step(self, params):
        self.steps += 1
        if self.steps % self.freq == 0:
            self.shadow = self._update(self.shadow, params)

    def swap(self, params):
        """Returns (ema_params, stashed_params) — caller swaps back after."""
        return self.shadow, params


class CPUEMA:
    """EMA shadow held in host RAM, updated every `freq` steps with mu**freq
    — the reference CPUEMA (ema.py:26-54). Keeps the shadow out of HBM
    entirely (at 5B scale the HBM shadow doubles param memory); the cost is
    one device->host param pull per freq steps."""

    def __init__(self, params, mu=0.999, freq=100):
        self.mu = mu ** freq
        self.freq = freq
        self.steps = 0
        self.shadow = jax.tree_util.tree_map(
            lambda p: np.array(p, dtype=np.float32), params)

    def step(self, params):
        self.steps += 1
        if self.steps % self.freq == 0:
            host = jax.tree_util.tree_map(
                lambda p: np.asarray(p, dtype=np.float32), params)
            self.shadow = jax.tree_util.tree_map(
                lambda s, p: self.mu * s + (1.0 - self.mu) * p,
                self.shadow, host)

    def swap(self, params):
        return self.shadow, params


def get_ema(params, hps):
    mu = hps.mu or (1.0 - (hps.bs * hps.get("ngpus", 1) / 8.0) / 1000)
    if hps.ema and hps.get("train", False):
        if hps.cpu_ema:
            return CPUEMA(params, mu=mu, freq=hps.cpu_ema_freq)
        return EMA(params, mu=mu, freq=1)
    return None
