"""5b top-phase HBM ledger + batch-size fit probe.

The r4 bench OOM'd sampling the 5b top at bs=16 with int8 staging
(scripts/out/bench_5b_r4.log) even though the roofline
(scripts/roofline_5b.py) predicts 13.25 GB of 16 GB resident. This probe
measures where the bytes actually go:

  1. exact staged bytes on device (_staged_dec + _staged_light, per-leaf
     top offenders for the light tree),
  2. sample_init at bs=16 (compile already in the persistent cache from
     the bench run) -> exact cache bytes if it fits, the OOM point if not,
  3. fallback bs=8, same ledger,
  4. a short 3x512-token segment run at each fitting bs -> steady tok/s.

Writes scripts/out/probe_5b_top.json. Run on the chip:
  PYTHONPATH=/root/.axon_site python scripts/probe_5b_top.py
"""
import gc
import json
import os
import sys
import time

import numpy as np

T0 = time.time()


def log(msg):
    print(f"[probe +{time.time() - T0:7.1f}s] {msg}", file=sys.stderr,
          flush=True)


def tree_bytes(t):
    import jax
    return sum(x.nbytes for x in jax.tree_util.tree_leaves(t))


def _mem_stats(dev):
    """Device allocator stats if the backend exposes them (axon may not)."""
    try:
        s = dev.memory_stats()
        return {k: s[k] for k in ("bytes_in_use", "peak_bytes_in_use",
                                  "largest_free_block_bytes",
                                  "bytes_limit") if k in s}
    except Exception:  # noqa: BLE001
        return None


def main():
    import jax

    import faulthandler
    import signal
    try:
        faulthandler.register(signal.SIGUSR1, all_threads=True)
    except Exception:
        pass

    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_CACHE_DIR", "/root/repo/.jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    try:
        jax.config.update("jax_platforms", "axon,cpu")
    except Exception:
        pass
    os.environ.setdefault("JUKEBOX_INIT_CACHE", "1")
    os.environ.setdefault("JUKEBOX_STAGE_CACHE", "1")
    os.environ.setdefault("JUKEBOX_VERBOSE", "1")

    dev = jax.devices()[0]
    log(f"device: {dev}")

    from jukebox_tpu.hparams import setup_hparams
    from jukebox_tpu.lyricdict import poems
    from jukebox_tpu.models.make_models import MODELS, make_prior, make_vqvae
    from jukebox_tpu.models.vqvae import calculate_strides

    vqvae_name, *prior_names = MODELS["5b_lyrics"]
    top_hps = setup_hparams(prior_names[-1], dict(sample_length=0))
    vq_hps = setup_hparams(vqvae_name, dict(sample_length=0, restore_vqvae=""))
    downsamples = calculate_strides(vq_hps.strides_t, vq_hps.downs_t)
    raw_per_level = [int(np.prod(downsamples[:l + 1]))
                     for l in range(len(downsamples))]
    sample_length = top_hps.n_ctx * raw_per_level[-1]
    vq_hps.sample_length = sample_length
    log("building vqvae")
    vqvae = make_vqvae(vq_hps)
    sr = vq_hps.sr

    log("building 5b top prior (init cache should hit)")
    prior = make_prior(setup_hparams(
        prior_names[-1], dict(sample_length=sample_length,
                              restore_prior="", fp16_params=True)), vqvae)
    log("staging int8 decode weights (stage cache should hit)")
    prior.stage_decode(quantize="int8")

    out = dict(device=str(dev), ledger={}, runs={})
    led = out["ledger"]
    led["staged_dec_gb"] = round(tree_bytes(prior._staged_dec) / 1e9, 3)
    led["staged_light_gb"] = round(tree_bytes(prior._staged_light) / 1e9, 3)
    # top light-param offenders
    flat = jax.tree_util.tree_leaves_with_path(prior._staged_light)
    flat = sorted(flat, key=lambda kv: -kv[1].nbytes)[:8]
    led["light_top_leaves"] = [
        (jax.tree_util.keystr(k), list(v.shape), str(v.dtype),
         round(v.nbytes / 1e6, 1)) for k, v in flat]
    led["mem_stats_after_staging"] = _mem_stats(dev)
    log(f"staged_dec {led['staged_dec_gb']} GB, "
        f"staged_light {led['staged_light_gb']} GB, "
        f"mem_stats {led['mem_stats_after_staging']}")
    for name, shp, dt, mb in led["light_top_leaves"]:
        log(f"  light leaf {name} {shp} {dt} {mb} MB")

    call_params, dec = prior._staged_light, prior._staged_dec
    total_length = 240 * sr
    SEG = 512
    N_SEG = int(os.environ.get("PROBE_SEGMENTS", "3"))

    # ascending by default: validate the known-good size first, then walk
    # up to the ceiling (descending poisoned the r5a run — one OOM's
    # unfreed partial allocations took every later size down with it)
    for bs in [int(x) for x in
               os.environ.get("PROBE_BS", "8,12,16").split(",")]:
        run = out["runs"][str(bs)] = {}
        live = {}  # device refs for this attempt; cleared on any exit path
        try:
            metas = [dict(artist="unknown", genre="unknown",
                          lyrics=poems["ozymandias"],
                          total_length=total_length, offset=0)] * bs
            labels = prior.labeller.get_batch_labels(metas)
            # y stays HOST numpy: the _sample_init wrapper's cond_bs1 check
            # reads y's values, and a D2H readback of a device-resident y
            # wedged a probe run for 20+ minutes on a degraded return path
            y = np.asarray(prior.get_y(labels, 0))
            t0 = time.time()
            state = prior._sample_init(call_params, bs, z=None, z_conds=None,
                                       y=y, fp16=True, chunk_size=16,
                                       dec_params=dec)
            caches, x_tok, x_cond, y_cond, encoder_kv = (
                jax.block_until_ready(state))
            live.update(state=state, caches=caches, x_tok=x_tok,
                        x_cond=x_cond, y_cond=y_cond, encoder_kv=encoder_kv)
            run["init_s"] = round(time.time() - t0, 1)
            run["cache_gb"] = round(tree_bytes(caches) / 1e9, 3)
            run["cond_mb"] = round(
                (tree_bytes([c for c in (x_cond, y_cond, encoder_kv)
                             if c is not None])) / 1e6, 1)
            log(f"bs={bs}: init ok in {run['init_s']}s, caches "
                f"{run['cache_gb']} GB, cond {run['cond_mb']} MB")
            # short decode: 3 segments of 512 (first carries compile)
            t = 0
            rng = jax.random.key(0)
            seg_times = []
            for i in range(N_SEG):
                ts = time.time()
                seg, caches, x_tok = prior._sample_segment(
                    call_params, caches, x_tok, np.int32(t), SEG, rng,
                    x_cond=x_cond, y_cond=y_cond, encoder_kv=encoder_kv,
                    fp16=True, temp=0.99, top_k=0, top_p=0.0,
                    dec_params=dec)
                live.update(caches=caches, x_tok=x_tok, seg=seg)
                np.asarray(seg)
                seg_times.append(time.time() - ts)
                t += SEG
                log(f"  bs={bs} segment {i}: {seg_times[-1]:.1f}s")
            steady = seg_times[1:] if len(seg_times) > 1 else seg_times
            run["tok_per_s"] = round(SEG * len(steady) * bs / sum(steady), 1)
            run["seg_compile_s"] = round(seg_times[0] - sum(steady)
                                         / len(steady), 1)
            log(f"bs={bs}: {run['tok_per_s']} tok/s steady")
        except Exception as e:  # noqa: BLE001
            # keep the FULL message: an OOM's requested/available byte
            # counts ARE the diagnosis (the r5a probe classified it away
            # and left the bs=16 question open)
            msg = str(e)
            run["error"] = msg[:2000]
            log(f"bs={bs}: FAILED {msg[:400]}")
        run["mem_stats"] = _mem_stats(dev)
        state = caches = x_tok = x_cond = y_cond = encoder_kv = seg = None
        live.clear()
        gc.collect()
        # wait until the frees actually LAND before the next attempt: a
        # fixed 20 s sleep poisoned every later bs in the r5a probe run
        # (bench.py's wait_hbm_free pattern, scaled to the next rings)
        sys.path.insert(0, os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))))
        from bench import wait_hbm_free
        waited = wait_hbm_free(probe_mb=4096, max_s=300)
        log(f"settle probe landed in {waited:.0f}s" if waited >= 0
            else "settle probe TIMED OUT after 300s; continuing")

    os.makedirs("scripts/out", exist_ok=True)
    with open("scripts/out/probe_5b_top.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
