"""Roofline accounting for the 5b_lyrics top decode step (VERDICT r2 #6).

Pure shape math — no device. Separates the two distinct HBM quantities of
one whole-stack-megakernel decode step, derived from the repo's own layer
schedule (Transformer.attn_func) and ring retention
(FactoredAttention.cache_len — the reference's `_suff_cache_len`,
factored_attention.py:328-353):

  1. TRAFFIC (the time bound): streamed weight bytes (every decode step
     reads every layer's weights once — batch-amortized) + the algorithmic
     K/V read set per pattern (row attn reads the current block's fill,
     column attn reads one row per filled block, prev-row reads one block,
     cross reads the encoder rows) + cache writes. Decode is far below the
     MXU flops roof at these batch sizes, so HBM traffic IS the bound.
  2. RESIDENCY (the capacity bound): full ring retention — what must fit
     in 16 GB HBM alongside the weights. This is what caps batch size, and
     what int8 caches halve.

Usage: python scripts/roofline_5b.py [model] [bs] [--bf16-cache]
"""

import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from jukebox_tpu.hparams import setup_hparams
from jukebox_tpu.models.make_models import MODELS

HBM_GBS = 819.0  # v5e HBM bandwidth, GB/s (public spec)


def main():
    model = sys.argv[1] if len(sys.argv) > 1 else "5b_lyrics"
    bs = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    cache_bytes = 2 if "--bf16-cache" in sys.argv else 1  # int8 default
    w_bytes = 1  # int8 weight streaming

    prior_name = MODELS[model][-1]
    hps = setup_hparams(prior_name, dict(sample_length=0))
    S = hps.prior_width
    depth = hps.prior_depth
    n_ctx = hps.n_ctx
    blocks = hps.blocks
    A = int(S * hps.get("m_attn", 0.25))
    M = int(S * hps.get("m_mlp", 1.0))
    prime_len = hps.n_tokens if hps.get("use_tokens") else 0
    enc_dims = prime_len
    bc = n_ctx // blocks

    from jukebox_tpu.models.transformer import ATTN_ORDERS
    sched = [ATTN_ORDERS[hps.attn_order](d) for d in range(depth)]

    def ring_rows(f):
        # RESIDENT rows per FactoredAttention.cache_len / init_cache
        return {0: n_ctx, 1: bc, 2: bc * blocks, 3: 2 * bc,
                4: blocks + 1, 6: enc_dims, 7: prime_len}[f]

    def read_rows(f, t):
        # algorithmic K-rows READ by the decode step at position t
        return {0: t, 1: t % bc or bc, 2: t // bc, 3: bc,
                4: t // bc, 6: enc_dims, 7: prime_len}[f]

    w_total, resident_rows = 0, 0
    read_avg, read_max = 0, 0
    t_avg, t_max = (prime_len + n_ctx // 2), (prime_len + n_ctx - 1)
    counts = {}
    for f in sched:
        counts[f] = counts.get(f, 0) + 1
        qkv = S * (A if f == 6 else 3 * A)
        w_total += qkv + A * S + S * M + M * S
        resident_rows += 2 * ring_rows(f)          # k and v
        read_avg += 2 * read_rows(f, t_avg)
        read_max += 2 * read_rows(f, t_max)
    w_total += S * hps.get("l_bins", 2048)          # x_out head matmul

    w_gb = w_total * w_bytes / 1e9
    res_gb = resident_rows * A * cache_bytes * bs / 1e9
    read_gb = read_avg * A * cache_bytes * bs / 1e9
    readmax_gb = read_max * A * cache_bytes * bs / 1e9
    write_mb = 2 * len(sched) * A * cache_bytes * bs / 1e6
    total_gb = w_gb + read_gb + write_mb / 1e3
    step_ms = total_gb / HBM_GBS * 1e3
    tok_s = bs / (total_gb / HBM_GBS)

    print(f"model {model} ({prior_name}): width {S}, depth {depth}, "
          f"n_ctx {n_ctx}, blocks {blocks} (block_ctx {bc}), A {A}, "
          f"prime {prime_len}")
    print(f"layer schedule (attn_func -> count): {dict(sorted(counts.items()))}")
    print(f"TRAFFIC/step: weights {w_total/1e9:.2f} G-params x {w_bytes}B = "
          f"{w_gb:.2f} GB (batch-amortized)")
    print(f"  + K/V reads avg-t {read_gb*1e3:.0f} MB (worst-t "
          f"{readmax_gb*1e3:.0f} MB) + writes {write_mb:.1f} MB at bs {bs}, "
          f"{cache_bytes}B caches")
    print(f"  -> {total_gb:.2f} GB/step @ {HBM_GBS:.0f} GB/s = "
          f"{step_ms:.2f} ms/step -> speed-of-light {tok_s:.0f} tok/s "
          f"aggregate at bs {bs}")
    print(f"RESIDENCY: {w_gb:.2f} GB weights + {res_gb:.2f} GB rings "
          f"= {w_gb + res_gb:.2f} GB of 16 GB "
          f"({cache_bytes}B caches, bs {bs})")


if __name__ == "__main__":
    main()
