"""On-chip training-step throughput: jitted prior / vqvae train steps at a
chosen scale, steady-state steps/sec and tokens/sec. Usage:

    python scripts/train_bench.py [preset] [bs] [steps]

presets: small_prior (default; the reference's README:141 memory-table
config), prior_1b_lyrics (full 1b scale, remat on), small_vqvae, vqvae.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JUKEBOX_INIT_CACHE", "1")

import jax
import jax.numpy as jnp
import numpy as np

preset = sys.argv[1] if len(sys.argv) > 1 else "small_prior"
bs = int(sys.argv[2]) if len(sys.argv) > 2 else 8
n_steps = int(sys.argv[3]) if len(sys.argv) > 3 else 12
# extra key=value hps overrides, e.g. fp16=1 (bf16 compute — the mode the
# released models actually trained in; the preset defaults keep fp32/HIGHEST
# numerics-parity matmuls, ~6x off the v5e bf16 MXU peak)
extra = {}
for kv in sys.argv[4:]:
    k, v = kv.split("=", 1)
    try:
        v = int(v)
    except ValueError:
        try:
            v = float(v)
        except ValueError:
            pass
    extra[k] = bool(v) if k in ("fp16", "fp16_opt", "labels") else v

cache_dir = os.environ.get("JAX_CACHE_DIR", "/root/repo/.jax_cache")
jax.config.update("jax_compilation_cache_dir", cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 30.0)
if os.environ.get("JAX_PLATFORMS") == "cpu":
    # the axon sitecustomize pins its backend regardless of the env var;
    # force local CPU so ad-hoc runs can't grab the (single-tenant) chip
    jax.config.update("jax_platforms", "cpu")
else:
    try:
        jax.config.update("jax_platforms", "axon,cpu")
    except Exception:
        pass
print("device:", jax.devices()[0])

from jukebox_tpu.hparams import setup_hparams
from jukebox_tpu.models.make_models import make_prior, make_vqvae
from jukebox_tpu.train import make_prior_train_step, make_vqvae_train_step
from jukebox_tpu.utils.train_utils import adam_init, make_lr_schedule

is_prior = "prior" in preset
vq_name = "vqvae" if preset in ("vqvae", "prior_1b_lyrics") else "small_vqvae"
vq_hps = setup_hparams(vq_name, dict(sample_length=0, restore_vqvae="",
                                     train=not is_prior))

if is_prior:
    overrides = dict(restore_prior="", prior=True, train=True, labels=False)
    if preset == "prior_1b_lyrics":
        # training form: labels + remat like the released run
        overrides.update(labels=True, labels_v3=True,
                         min_duration=17.84, max_duration=600.0, c_res=1)
    hps = setup_hparams(preset, {"sample_length": 0, **overrides, **extra})
    n_ctx = hps.n_ctx
    from jukebox_tpu.models.vqvae import calculate_strides
    downs = calculate_strides(vq_hps.strides_t, vq_hps.downs_t)
    raw_per = [int(np.prod(downs[:l + 1])) for l in range(len(downs))]
    raw_to_tokens = raw_per[hps.get("level", len(raw_per) - 1)]
    hps.sample_length = n_ctx * raw_to_tokens
    vq_hps.sample_length = hps.sample_length
    vqvae = make_vqvae(vq_hps)
    model = make_prior(hps, vqvae)
    step_fn = make_prior_train_step(model, hps, make_lr_schedule(hps))
    params, opt = model.params, adam_init(model.params)
    x = jnp.asarray(np.random.RandomState(0).randn(
        bs, hps.sample_length, 1), jnp.float32)
    if hps.labels:
        n_labels = 4 + 1 + (hps.n_tokens if hps.get("use_tokens") else 0)
        y = np.zeros((bs, n_labels), np.int64)
        y[:, 0] = 600 * hps.sr
        y[:, 2] = hps.sample_length
        batch = (x, jnp.asarray(y))
    else:
        batch = (x, None)
    state = None
    tokens_per_step = bs * n_ctx
else:
    vq_hps = setup_hparams(vq_name, dict(sample_length=0, restore_vqvae="",
                                         train=True))
    vq_hps.sample_length = 262144 if vq_name == "vqvae" else 65536
    vq_hps.bandwidth = {"l1": 1.0, "l2": 1.0, "spec": 1.0}
    vqvae = make_vqvae(vq_hps)
    model = vqvae
    step_fn = make_vqvae_train_step(vqvae, vq_hps, make_lr_schedule(vq_hps))
    params, opt, state = vqvae.params, adam_init(vqvae.params), vqvae.state
    batch = jnp.asarray(np.random.RandomState(0).randn(
        bs, vq_hps.sample_length, 1), jnp.float32)
    tokens_per_step = bs * vq_hps.sample_length  # raw samples

rng = jax.random.key(0)
times = []
profile_dir = os.environ.get("TRAIN_BENCH_PROFILE", "")
for i in range(n_steps):
    if profile_dir and i == n_steps - 2:
        jax.profiler.start_trace(profile_dir)
    t0 = time.time()
    params, opt, state, loss, metrics = step_fn(
        params, opt, state, batch, jax.random.fold_in(rng, i),
        jnp.asarray(i + 1, jnp.int32))
    jax.block_until_ready(loss)
    dt = time.time() - t0
    times.append(dt)
    print(f"step {i}: {dt*1e3:.1f} ms  loss={float(loss):.4f}", flush=True)
if profile_dir:
    jax.profiler.stop_trace()
    print(f"profile trace (last 2 steps) -> {profile_dir}")

steady = times[2:] if len(times) > 4 else times[1:]
mean = sum(steady) / len(steady)


def _analytic_train_flops():
    """Model FLOPs per train step (fwd 2NT for matmuls + factored-attention
    scores/apply; bwd 2x fwd; +1 fwd recompute under remat). Parameter
    embeddings/LN excluded (bandwidth-bound, negligible FLOPs)."""
    import jax.tree_util as jtu
    mm = 0
    for path, leaf in jtu.tree_leaves_with_path(params):
        name = str(getattr(path[-1], "key", ""))
        if name in ("w", "w_q") and leaf.ndim >= 2:
            mm += leaf.size
    if is_prior:
        tr = model.model.prior.transformer
        B, L, H = bs, tr.n_ctx, tr.n_head
        A = int(tr.m_attn * tr.n_in)
        attn = 0
        for d in range(tr.n_depth):
            f = tr.attn_func(d)
            bc = L // tr.blocks if tr.blocks else L
            lkv = {0: L / 2, 1: bc, 2: tr.blocks, 3: bc,
                   4: (tr.blocks or 1) + 1, 6: L, 7: 512}.get(f, L / 2)
            attn += 4 * B * L * lkv * A  # scores + apply, all heads
        fwd = 2 * mm * tokens_per_step + attn
        remat = 1 if hps.get("c_res") or hps.get("c_attn") or hps.get("c_mlp") else 0
    else:
        return None  # conv layers run at per-level rates; skip MFU
    return fwd * (3 + remat)


flops = _analytic_train_flops()
print(f"\n{preset} bs={bs}: {mean*1e3:.1f} ms/step steady "
      f"({1/mean:.2f} steps/s, {tokens_per_step/mean:,.0f} tok/s), "
      f"compile+first {times[0]*1e3:.0f} ms")
if flops is not None:
    peak = float(os.environ.get("BENCH_PEAK_FLOPS", 197e12))  # v5e bf16
    print(f"model flops/step ~{flops/1e12:.2f} TF -> MFU "
          f"{100 * flops / mean / peak:.1f}% of {peak/1e12:.0f} TF/s peak")
    if is_prior and not hps.fp16:
        # fp32 params run HIGHEST-precision (6-pass) matmuls by design
        # (ops/core.py _prec); the bf16 MXU peak is not reachable
        print(f"   (fp32/HIGHEST mode: vs the ~{peak/6e12:.0f} TF/s 6-pass "
              f"envelope this is {100 * flops / mean / (peak / 6):.1f}%; "
              f"pass fp16=1 for the bf16 training mode)")
