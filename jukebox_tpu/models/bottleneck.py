"""EMA k-means vector-quantisation bottleneck (TPU equivalent of
jukebox/vqvae/bottleneck.py).

Functional design: the codebook and its EMA statistics are an explicit state
pytree returned from every training forward. Under pjit with the batch axis
sharded, the cluster-sum reductions (segment_sum over all codes) lower to ICI
all-reduces automatically — the TPU-native replacement for the reference's
explicit dist.all_reduce of `_k_sum`/`_k_elem` (bottleneck.py:62-69). The
rank-0 broadcast of random-restart vectors (bottleneck.py:67) is replaced by
a *replicated* PRNG key: every device computes identical restarts.
"""

import math
from dataclasses import dataclass

import jax
import jax.numpy as jnp
from jax import lax


@dataclass(frozen=True)
class BottleneckBlock:
    k_bins: int
    emb_width: int
    mu: float
    threshold: float = 1.0

    # -- state ---------------------------------------------------------------

    def init_state(self):
        """Matches reset_k (bottleneck.py:16-20): zero codebook, uninitialised."""
        return {
            "k": jnp.zeros((self.k_bins, self.emb_width), dtype=jnp.float32),
            "k_sum": jnp.zeros((self.k_bins, self.emb_width), dtype=jnp.float32),
            "k_elem": jnp.zeros((self.k_bins,), dtype=jnp.float32),
            "init": jnp.zeros((), dtype=jnp.bool_),
            "threshold": jnp.asarray(self.threshold, dtype=jnp.float32),
        }

    def restore_state(self, k, num_tokens=None, threshold=1.0):
        """Seed EMA stats from a restored codebook for finetuning
        (bottleneck.py:43-53)."""
        k = jnp.asarray(k, dtype=jnp.float32)
        k_elem = jnp.ones((self.k_bins,), dtype=jnp.float32)
        k_sum = k
        if num_tokens is not None:
            expected_usage = num_tokens / self.k_bins
            k_elem = k_elem * expected_usage
            k_sum = k_sum * expected_usage
        return {
            "k": k,
            "k_sum": k_sum,
            "k_elem": k_elem,
            "init": jnp.ones((), dtype=jnp.bool_),
            "threshold": jnp.asarray(threshold, dtype=jnp.float32),
        }

    # -- pure pieces ----------------------------------------------------------

    def _rand_candidates(self, rng, x):
        """k_bins candidate codes drawn from the batch, with tiny noise when
        the batch is smaller than the codebook (reference _tile,
        bottleneck.py:22-29). rng must be replicated across devices."""
        n = x.shape[0]
        if n < self.k_bins:
            n_repeats = (self.k_bins + n - 1) // n
            std = 0.01 / math.sqrt(self.emb_width)
            rng, r_noise = jax.random.split(rng)
            x = jnp.tile(x, (n_repeats, 1))
            x = x + std * jax.random.normal(r_noise, x.shape, dtype=x.dtype)
        idx = jax.random.permutation(rng, x.shape[0])[: self.k_bins]
        return x[idx]

    def quantise(self, k, x):
        """Nearest-neighbour assignment by L2 distance (bottleneck.py:112-119).
        x: [NT, w] -> (codes [NT], fit scalar)."""
        distance = (
            jnp.sum(x * x, axis=-1, keepdims=True)
            - 2 * jnp.dot(x, k.T, precision=lax.Precision.HIGHEST)
            + jnp.sum(k * k, axis=-1)[None, :]
        )
        x_l = jnp.argmin(distance, axis=-1)
        fit = jnp.mean(jnp.min(distance, axis=-1))
        return x_l, fit

    def dequantise(self, k, x_l):
        return jnp.take(k, x_l, axis=0)

    def _prenorm(self, x):
        return jnp.linalg.norm(x - jnp.mean(x)) / math.sqrt(x.shape[0] * x.shape[1])

    def _preprocess(self, x):
        """[N, T, C] -> [NT, w]; supports the 2*emb_width sum trick
        (bottleneck.py:88-103)."""
        x = x.reshape(-1, x.shape[-1]).astype(jnp.float32)
        if x.shape[-1] == self.emb_width:
            prenorm = self._prenorm(x)
        elif x.shape[-1] == 2 * self.emb_width:
            x1, x2 = x[..., : self.emb_width], x[..., self.emb_width:]
            prenorm = self._prenorm(x1) + self._prenorm(x2)
            x = x1 + x2
        else:
            raise ValueError(f"Expected {x.shape[-1]} to be (1 or 2) * {self.emb_width}")
        return x, prenorm

    def _update_k(self, state, x, x_l, rng):
        """EMA codebook update with dead-code random restarts
        (bottleneck.py:55-86). x: [NT, w] over the *global* batch — the
        segment sums reduce over the sharded axis, which pjit turns into the
        cross-device all-reduce the reference does explicitly."""
        k_bins, emb_width, mu = self.k_bins, self.emb_width, self.mu
        _k_sum = jax.ops.segment_sum(x, x_l, num_segments=k_bins)
        _k_elem = jax.ops.segment_sum(jnp.ones((x.shape[0],), jnp.float32), x_l,
                                      num_segments=k_bins)
        _k_rand = self._rand_candidates(rng, x)

        old_k = state["k"]
        k_sum = mu * state["k_sum"] + (1.0 - mu) * _k_sum
        k_elem = mu * state["k_elem"] + (1.0 - mu) * _k_elem
        usage = (k_elem[:, None] >= state["threshold"]).astype(jnp.float32)
        k = usage * (k_sum / k_elem[:, None]) + (1 - usage) * _k_rand

        _k_prob = _k_elem / jnp.sum(_k_elem)
        entropy = -jnp.sum(_k_prob * jnp.log(_k_prob + 1e-8))
        used_curr = jnp.sum(_k_elem >= state["threshold"])
        usage_count = jnp.sum(usage)
        dk = jnp.linalg.norm(k - old_k) / math.sqrt(k_bins * emb_width)

        new_state = dict(state, k=k, k_sum=k_sum, k_elem=k_elem)
        metrics = dict(entropy=entropy, used_curr=used_curr, usage=usage_count, dk=dk)
        return new_state, metrics

    def _init_k(self, state, x, rng):
        """Data-dependent init from the first batch (bottleneck.py:31-41)."""
        k = self._rand_candidates(rng, x)
        return dict(
            state,
            k=k,
            k_sum=k,
            k_elem=jnp.ones((self.k_bins,), jnp.float32),
            init=jnp.ones((), jnp.bool_),
        )

    # -- public --------------------------------------------------------------

    def encode(self, state, x):
        """x: [N, T, C] -> codes [N, T]."""
        N, T = x.shape[0], x.shape[1]
        flat, _ = self._preprocess(x)
        x_l, _ = self.quantise(state["k"], flat)
        return x_l.reshape(N, T)

    def decode(self, state, x_l):
        """codes [N, T] -> [N, T, emb_width]."""
        return self.dequantise(state["k"], x_l)

    def forward(self, state, x, update_k=False, rng=None):
        """Training/eval forward (bottleneck.py:149-179).

        Returns (codes [N,T], quantised [N,T,w], commit_loss, metrics, state).
        With update_k=True, rng must be a *replicated* key.
        """
        N, T = x.shape[0], x.shape[1]
        flat, prenorm = self._preprocess(x)

        if update_k:
            r_init, r_restart = jax.random.split(rng)
            state = lax.cond(
                state["init"],
                lambda s: s,
                lambda s: self._init_k(s, flat, r_init),
                state,
            )

        x_l, fit = self.quantise(state["k"], flat)
        x_d = self.dequantise(state["k"], x_l)

        update_metrics = {}
        if update_k:
            state, update_metrics = self._update_k(state, flat, x_l, r_restart)

        commit_loss = jnp.sum(jnp.square(lax.stop_gradient(x_d) - flat)) / (
            flat.shape[0] * flat.shape[1])

        # Straight-through estimator (bottleneck.py:173)
        x_d = flat + lax.stop_gradient(x_d - flat)

        x_l = x_l.reshape(N, T)
        x_d = x_d.reshape(N, T, self.emb_width)
        metrics = dict(fit=fit, pn=prenorm, **update_metrics)
        return x_l, x_d, commit_loss, metrics, state


@dataclass(frozen=True)
class Bottleneck:
    """Per-level codebooks (bottleneck.py:182-216)."""
    l_bins: int
    emb_width: int
    mu: float
    levels: int

    @property
    def block(self):
        return BottleneckBlock(self.l_bins, self.emb_width, self.mu)

    def init_state(self):
        return {"level_blocks": [self.block.init_state() for _ in range(self.levels)]}

    def encode(self, state, xs):
        return [self.block.encode(s, x) for s, x in zip(state["level_blocks"], xs)]

    def decode(self, state, zs, start_level=0, end_level=None):
        if end_level is None:
            end_level = self.levels
        return [self.block.decode(s, z)
                for s, z in zip(state["level_blocks"][start_level:end_level], zs)]

    def forward(self, state, xs, update_k=False, rng=None):
        zs, xs_q, commit_losses, metrics, new_blocks = [], [], [], [], []
        for level in range(self.levels):
            r = None
            if update_k:
                rng, r = jax.random.split(rng)
            z, x_q, commit, metric, s = self.block.forward(
                state["level_blocks"][level], xs[level], update_k=update_k, rng=r)
            if not update_k:
                # eval: make sure the straight-through path can't leak grads
                # (bottleneck.py:209-212)
                x_q = lax.stop_gradient(x_q)
            zs.append(z)
            xs_q.append(x_q)
            commit_losses.append(commit)
            if update_k:
                metrics.append(metric)
            new_blocks.append(s)
        return zs, xs_q, commit_losses, metrics, {"level_blocks": new_blocks}


@dataclass(frozen=True)
class NoBottleneck:
    """Identity bottleneck for ablations (bottleneck.py:218-242)."""
    levels: int

    def init_state(self):
        return {"level_blocks": [{} for _ in range(self.levels)]}

    def encode(self, state, xs):
        return xs

    def decode(self, state, zs, start_level=0, end_level=None):
        return zs

    def forward(self, state, xs, update_k=False, rng=None):
        zero = jnp.zeros(())
        commit_losses = [zero] * self.levels
        metrics = [dict(entropy=zero, usage=zero, used_curr=zero, pn=zero, dk=zero)
                   for _ in range(self.levels)] if update_k else []
        return xs, xs, commit_losses, metrics, state
