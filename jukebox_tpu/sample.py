"""Windowed ancestral sampling cascade — TPU equivalent of jukebox/sample.py.

Top-level codes are generated first, then upsampled level by level; long
outputs are produced window-by-window with `hop_fraction` overlap
re-conditioning (sample.py:80-121). The window orchestration is host Python
(like the reference); everything inside a window runs as jitted scans on
device. Outputs: data.jkb (codes+labels), item_*.wav, alignment + html.
"""

import os
import pickle
import sys
import time

import jax
import numpy as np

import jax.numpy as jnp

from jukebox_tpu.data.labels import EmptyLabeller
from jukebox_tpu.hparams import Hyperparams
from jukebox_tpu.models.make_models import make_model
from jukebox_tpu.utils.audio_utils import load_audio, save_wav
from jukebox_tpu.utils.cli import fire
from jukebox_tpu.utils.misc import yield_to_transfers
from jukebox_tpu.utils.sample_utils import get_starts, split_batch


_T0 = None

# Machine-readable per-stage wall accumulator for the most recent _sample
# call: stage name -> summed seconds. Stages on background finalize threads
# overlap the sampling windows, so the values are THREAD-seconds per stage
# (their sum can exceed the cascade wall-clock); bench.py embeds this dict
# into the measured full_cascade row so the end-to-end number carries its
# own breakdown (where the non-decode wall goes).
stage_walls = {}
_stage_lock = None


def _twall(key, t_start):
    """Accumulate time since t_start under `key` in stage_walls; returns
    the delta so call sites can log it."""
    global _stage_lock
    if _stage_lock is None:
        import threading
        _stage_lock = threading.Lock()
    dt = time.time() - t_start
    with _stage_lock:
        stage_walls[key] = round(stage_walls.get(key, 0.0) + dt, 2)
    return dt


def _tlog(msg):
    """One stage-timing line per cascade stage (stderr): where the
    end-to-end wall-clock goes — staging, windows, vqvae decode,
    alignment, html. The reference logs per window too (sample.py:54)."""
    t = 0.0 if _T0 is None else time.time() - _T0
    print(f"[cascade +{t:7.1f}s] {msg}", file=sys.stderr, flush=True)


def sample_partial_window(zs, labels, sampling_kwargs, level, prior,
                          tokens_to_sample, hps, rng):
    """Sample a window shorter than n_ctx (sample.py:17-28)."""
    z = zs[level]
    n_ctx = prior.n_ctx
    current_tokens = z.shape[1]
    if current_tokens < n_ctx - tokens_to_sample:
        sampling_kwargs["sample_tokens"] = int(current_tokens + tokens_to_sample)
        start = 0
    else:
        sampling_kwargs["sample_tokens"] = n_ctx
        start = current_tokens - n_ctx + tokens_to_sample
    return sample_single_window(zs, labels, sampling_kwargs, level, prior,
                                start, hps, rng)


def sample_single_window(zs, labels, sampling_kwargs, level, prior, start,
                         hps, rng):
    """Sample one n_ctx window at `start`, conditioning on the overlap with
    already-sampled tokens (sample.py:31-78)."""
    n_samples = hps.n_samples
    n_ctx = prior.n_ctx
    end = start + n_ctx

    z = zs[level][:, start:end]
    sample_tokens = sampling_kwargs.get("sample_tokens", end - start)
    conditioning_tokens = z.shape[1]
    new_tokens = sample_tokens - z.shape[1]
    print(f"Sampling {sample_tokens} tokens for [{start},{start + sample_tokens}]. "
          f"Conditioning on {conditioning_tokens} tokens")
    if new_tokens <= 0:
        return zs

    z_conds = prior.get_z_conds(zs, start, end)
    y = prior.get_y(labels, start)

    if rng is None:
        rng = jax.random.key(0)
    kwargs = dict(sampling_kwargs)
    max_batch_size = kwargs.pop("max_batch_size")
    kwargs.setdefault("sample_tokens", sample_tokens)

    t_win = time.time()
    z_list = split_batch(z, n_samples, max_batch_size)
    z_conds_list = split_batch(z_conds, n_samples, max_batch_size)
    y_list = split_batch(y, n_samples, max_batch_size)
    z_samples = []
    for i, (z_i, z_conds_i, y_i) in enumerate(zip(z_list, z_conds_list, y_list)):
        z_samples_i = prior.sample(n_samples=z_i.shape[0], z=z_i,
                                   z_conds=z_conds_i, y=y_i,
                                   rng=jax.random.fold_in(rng, start * 131 + i),
                                   **kwargs)
        yield_to_transfers()  # D2H readback mid-bulk-stage wedges the tunnel
        z_samples.append(np.asarray(z_samples_i))
    z = np.concatenate(z_samples, axis=0)
    _tlog(f"level {level} window @{start}: {_twall(f'windows_l{level}', t_win):.1f}s "
          f"({new_tokens} new tokens, bs {n_samples})")

    z_new = z[:, -new_tokens:]
    zs[level] = np.concatenate([zs[level], z_new], axis=1)
    return zs


def sample_level(zs, labels, sampling_kwargs, level, prior, total_length,
                 hop_length, hps, rng):
    """Sample total_length tokens at one level by hopping windows
    (sample.py:81-88)."""
    print(f"Sampling level {level}")
    if total_length >= prior.n_ctx:
        for start in get_starts(total_length, prior.n_ctx, hop_length):
            zs = sample_single_window(zs, labels, sampling_kwargs, level, prior,
                                      start, hps, rng)
    else:
        zs = sample_partial_window(zs, labels, sampling_kwargs, level, prior,
                                   total_length, hps, rng)
    return zs


def _decode_save_level(zs, labels, sampling_kwargs, priors, level, hps):
    """vqvae decode + data.jkb + wav for one level — the alignment-free
    half of the reference's per-level tail (sample.py:104-117).
    Independent of the other levels; returns x for the html stage."""
    prior = priors[level]
    t = time.time()
    # release this level's staged decode weights BEFORE the vqvae decode:
    # only vqvae weights are read below, and on the async finalize thread
    # the decode (107 s of D2H at 5b) otherwise overlaps the next level's
    # sampling with the finished level's 6 GB still resident — the r5
    # sequential 5b cascade OOM'd exactly there (level-1 hop prefill with
    # the top still staged)
    if hasattr(prior, "to_host"):
        prior.to_host()
    # decode in chunks of JUKEBOX_DECODE_CHUNK_BS samples (default 8)
    # rather than one device call per item: on the remote transport each
    # call is a synchronous round trip, so fewer/larger chunks shrink the
    # finalize tail. Measured A/B (scripts/chip_decode_tail_probe.py,
    # chunk bs 1/2/4/8/16 next to staged int8 weights + live ring caches):
    # level-0 decode of 16 samples takes 7.2/6.2/6.3/5.8/3.9 s — larger is
    # monotonically better and no HBM stall reproduced; 8 keeps a 2x
    # transient-memory margin vs whole-batch. Table in PERF.md.
    bs = zs[level].shape[0]
    chunk_bs = max(1, int(os.environ.get("JUKEBOX_DECODE_CHUNK_BS", "8")))
    x = prior.decode(zs[level:], start_level=level,
                     bs_chunks=max(1, -(-bs // chunk_bs)))
    # read the audio back as on-device int16 PCM (the wav artifact's exact
    # format): 4x fewer D2H bytes — the axon tunnel's return path degrades
    # to ~MB/s at times, and fp32 audio for bs=16 is 50 MB per level. The
    # float copy kept in data.jkb quantizes to 1/32767 (inaudible; the wav
    # bits are identical either way). JUKEBOX_PCM16_READBACK=0 restores the
    # full-precision readback.
    if os.environ.get("JUKEBOX_PCM16_READBACK", "1") != "0":
        pcm = jnp.asarray(jnp.clip(x, -1, 1) * 32767, jnp.int16)
        yield_to_transfers()
        x_np = np.asarray(pcm).astype(np.float32) / 32767.0
    else:
        x_np = np.asarray(x)  # one device->host transfer, reused below
    _tlog(f"level {level} vqvae decode: {_twall('vqvae_decode', t):.1f}s")

    logdir = f"{hps.name}/level_{level}"
    os.makedirs(logdir, exist_ok=True)
    t = time.time()
    with open(f"{logdir}/data.jkb", "wb") as f:
        pickle.dump(dict(zs=[np.asarray(z) for z in zs], labels=labels,
                         sampling_kwargs=sampling_kwargs,
                         x=x_np), f)
    save_wav(logdir, x_np, hps.sr)
    _tlog(f"level {level} data.jkb+wav: {_twall('save', t):.1f}s")
    return x_np


def _compute_alignments(zs, labels, sampling_kwargs, priors, hps):
    """Lyric alignment from the top prior's recorded attention
    (sample.py:118-119); None when the model has no lyric conditioning."""
    from jukebox_tpu.align import get_alignment

    if (priors[-1] is None or priors[-1].n_tokens == 0
            or isinstance(priors[-1].labeller, EmptyLabeller)
            # models without configured alignment taps (hps alignment_layer/
            # alignment_head, set by the lyric presets) have no attention to
            # record — the reference crashes here instead (align.py:49)
            or getattr(priors[-1], "alignment_layer", None) is None
            or getattr(priors[-1], "alignment_head", None) is None
            or os.environ.get("JUKEBOX_SKIP_ALIGN") == "1"):
        return None
    t = time.time()
    try:
        alignments = get_alignment(None, zs, labels[-1], priors[-1],
                                   sampling_kwargs[-1].get("fp16", False), hps)
    except Exception as e:  # noqa: BLE001 — degrade, don't destroy the run
        # an alignment failure (e.g. the remote-compile helper 500-ing on
        # the 79-layer recording graph at 5b — measured, r5 cascade run)
        # must not take down a finished multi-kilosecond sampling cascade:
        # the html renders without the karaoke overlay and the failure is
        # visible in stage_walls as align_error
        _twall("align_error", t)
        _tlog(f"alignment FAILED after {time.time() - t:.1f}s "
              f"({str(e)[:200]}); continuing without alignment")
        return None
    _tlog(f"alignment (top fwd + stitch): {_twall('align', t):.1f}s")
    return alignments


def _html_level(x, zs, labels, level, hps, alignments):
    from jukebox_tpu.save_html import save_html

    t = time.time()
    logdir = f"{hps.name}/level_{level}"
    save_html(logdir, x, zs, labels[-1], alignments, hps)
    _tlog(f"level {level} html: {_twall('html', t):.1f}s")


def _align_deferred(prior):
    """Whether the alignment forward must wait for ALL levels to finish
    sampling instead of overlapping the lower levels (pipelined scheduler).
    get_alignment stages the top prior's RAW params (to_device); at 5B scale
    that is ~11 GB of a 16 GB chip, which cannot coexist with a lower
    level's staged weights + live ring caches. Small tops (1b: ~2.6 GB)
    keep the overlap — it is measured wall-clock win (PERF.md).
    JUKEBOX_ALIGN_DEFER=1/0 forces either way."""
    env = os.environ.get("JUKEBOX_ALIGN_DEFER")
    if env is not None:
        return env != "0"
    try:
        raw = sum(leaf.nbytes
                  for leaf in jax.tree_util.tree_leaves(prior.params))
    except Exception:  # noqa: BLE001 — unknown param container: be safe
        return True
    return raw > 6e9


class _FinalizePipe:
    """Run the per-level finalize tail on background workers so it
    overlaps the remaining levels' sampling windows. Two independent
    chains per the real dependency structure: decode/save (vqvae decode,
    data.jkb, wav — per-level, alignment-free) runs on one worker in
    submit order; the alignment (one top-prior recording forward, needed
    by every level's html) runs on a second worker as soon as the top
    level finishes; each level's html waits on exactly its own decode +
    the shared alignment. A level's wav/data therefore never queues
    behind the alignment forward, which was the serialized tail of the
    chained design. The alignment is ordered AFTER the top level's
    decode/save: _decode_save_level ends with prior.to_host(), so the
    top prior's staged decode weights leave HBM before get_alignment's
    to_device puts the raw params back — the two never coexist (at 5B
    scale either alone is most of a chip). Content is identical to
    inline finalize: the zs snapshot is taken at the same logical point
    (a list copy — window sampling replaces, never mutates, the
    per-level arrays). JUKEBOX_ASYNC_FINALIZE=0 restores inline."""

    def __init__(self):
        on = os.environ.get("JUKEBOX_ASYNC_FINALIZE", "1") != "0"
        self._dec_pool = self._aux_pool = None
        if on:
            from concurrent.futures import ThreadPoolExecutor
            self._dec_pool = ThreadPoolExecutor(max_workers=1,
                                                thread_name_prefix="finalize")
            self._aux_pool = ThreadPoolExecutor(max_workers=2,
                                                thread_name_prefix="align")
        import threading
        self._align_fut = None
        self._tails = []
        self._dec_futs = []
        self._inline_alignments = None
        self._inline_done = False
        self._sampling_done = threading.Event()

    def submit(self, zs, labels, sampling_kwargs, priors, level, hps):
        zs_snap = list(zs)
        if self._dec_pool is None:
            # decode/save FIRST: it ends with prior.to_host(), so the
            # alignment's to_device of raw top-prior params never overlaps
            # the still-staged decode weights (peak-HBM ordering matches
            # the async path)
            x = _decode_save_level(zs_snap, labels, sampling_kwargs, priors,
                                   level, hps)
            if not self._inline_done:
                self._inline_alignments = _compute_alignments(
                    zs_snap, labels, sampling_kwargs, priors, hps)
                self._inline_done = True
            _html_level(x, zs_snap, labels, level, hps,
                        self._inline_alignments)
            return
        dec_fut = self._dec_pool.submit(_decode_save_level, zs_snap, labels,
                                        sampling_kwargs, priors, level, hps)
        self._dec_futs.append(dec_fut)
        if self._align_fut is None:
            # first finalized level = top: its codes are what the
            # alignment forward consumes. Wait for the top decode first —
            # it releases the top prior's staged weights (to_host) before
            # the alignment re-stages the raw params.
            top_dec = dec_fut
            defer = _align_deferred(priors[-1])
            if defer:
                _tlog("alignment deferred until all levels finish sampling "
                      "(top prior raw params too large to overlap lower "
                      "levels' HBM residency)")

            def align_work():
                top_dec.result()
                if defer:
                    # wait for sampling AND every level's decode/save: the
                    # deferred alignment stages 11.2 GB of raw params at
                    # 5b, and a level-0 vqvae decode running concurrently
                    # OOM'd behind it (measured, r5 cascade run 5). By
                    # sampling_done every decode future exists, so this
                    # snapshot is complete — alignment becomes the last
                    # device stage, sharing the chip with nothing.
                    self._sampling_done.wait()
                    for f in list(self._dec_futs):
                        f.result()
                return _compute_alignments(zs_snap, labels, sampling_kwargs,
                                           priors, hps)
            self._align_fut = self._aux_pool.submit(align_work)
        align_fut = self._align_fut

        def html_work():
            _html_level(dec_fut.result(), zs_snap, labels, level, hps,
                        align_fut.result())
        self._tails.append(self._aux_pool.submit(html_work))

    def join(self):
        # called after every level's sampling loop has finished: a deferred
        # alignment (5B-scale raw params) may now take the whole chip.
        # NOTE: the LAST level's decode/save still shares the device with
        # the alignment forward; _decode_save_level ends with to_host and
        # the dec worker is ordered before align for the top level, and the
        # bottom level's staged weights are ~1 GB — measured to coexist.
        self._sampling_done.set()
        for f in self._tails:
            f.result()
        if self._dec_pool is not None:
            self._dec_pool.shutdown(wait=True)
            self._aux_pool.shutdown(wait=True)


class _StagePipe:
    """Pre-stage the NEXT level's decode weights (host packing +
    host->HBM transfer, make_models.stage_decode) on one background
    thread while the current level decodes. Bounded to one level ahead:
    `ensure(level)` blocks until that level is staged, then kicks off the
    level below — so extra HBM residency never exceeds what the cascade
    would hold anyway (the pipelined scheduler keeps every staged level
    resident). device_put is thread-safe; transfers overlap device
    compute.

    Pre-staging defaults ON only under the pipelined scheduler, whose
    memory model already keeps every staged level resident; the
    sequential scheduler (JUKEBOX_PIPELINE=0) is the documented
    memory-conservative fallback — one level's weights in HBM at a time —
    so there it defaults OFF. JUKEBOX_ASYNC_STAGE=1/0 overrides either
    way."""

    def __init__(self, priors, sample_levels, prestage=True):
        self._priors = priors
        self._order = list(reversed(sample_levels))  # top first
        self._futs = {}
        self._pool = None
        env = os.environ.get("JUKEBOX_ASYNC_STAGE")
        on = (env != "0") if env is not None else prestage
        if on:
            from concurrent.futures import ThreadPoolExecutor
            self._pool = ThreadPoolExecutor(max_workers=1,
                                            thread_name_prefix="stager")

    def _kick(self, level):
        prior = self._priors[level]
        if level in self._futs or not hasattr(prior, "stage_decode"):
            return
        if self._pool is not None:
            self._futs[level] = self._pool.submit(prior.stage_decode)

    def ensure(self, level):
        """Block until `level` is staged; start pre-staging the next one."""
        prior = self._priors[level]
        if hasattr(prior, "stage_decode"):
            t = time.time()
            fut = self._futs.get(level)
            if fut is not None:
                fut.result()
            else:
                prior.stage_decode()
            _tlog(f"level {level} stage_decode wait: {_twall('stage_wait', t):.1f}s")
        i = self._order.index(level)
        if i + 1 < len(self._order):
            self._kick(self._order[i + 1])

    def shutdown(self):
        if self._pool is not None:
            self._pool.shutdown(wait=True)


def _sample_sequential(zs, labels, sampling_kwargs, priors, sample_levels,
                       hps, rng):
    fin = _FinalizePipe()
    stager = _StagePipe(priors, sample_levels, prestage=False)
    for level in reversed(sample_levels):
        prior = priors[level]
        stager.ensure(level)
        assert hps.sample_length % prior.raw_to_tokens == 0, \
            f"sample_length {hps.sample_length} not a multiple of {prior.raw_to_tokens}"
        total_length = hps.sample_length // prior.raw_to_tokens
        hop_length = int(hps.hop_fraction[level] * prior.n_ctx)
        zs = sample_level(zs, labels[level], sampling_kwargs[level], level,
                          prior, total_length, hop_length, hps,
                          jax.random.fold_in(rng, level))
        fin.submit(zs, labels, sampling_kwargs, priors, level, hps)
    fin.join()
    stager.shutdown()
    return zs


def _sample_pipelined(zs, labels, sampling_kwargs, priors, sample_levels,
                      hps, rng):
    """Window-pipelined cascade (SURVEY Phase 6): an upsampler window
    [start, end) only needs zs[level+1][: end // cond_downsample]
    (prior.get_z_conds, models/prior.py:167-174), so lower-level windows
    start as soon as their conditioning range exists instead of after the
    whole upper level. The greedy scheduler drains the deepest eligible
    window first; each level's window order, rng folds, and z_cond slices
    are unchanged, so the token streams are identical to the sequential
    cascade. With levels placed on separate mesh slices the stages overlap
    in wall-clock; on one chip it reaches first audio sooner and keeps
    every level's weights staged at most once."""
    fin = _FinalizePipe()
    stager = _StagePipe(priors, sample_levels)
    state = {}
    for level in reversed(sample_levels):
        prior = priors[level]
        assert hps.sample_length % prior.raw_to_tokens == 0, \
            f"sample_length {hps.sample_length} not a multiple of {prior.raw_to_tokens}"
        total = hps.sample_length // prior.raw_to_tokens
        hop = int(hps.hop_fraction[level] * prior.n_ctx)
        windows = (list(get_starts(total, prior.n_ctx, hop))
                   if total >= prior.n_ctx else [None])  # None = partial
        state[level] = dict(windows=windows, next=0, total=total,
                            rng=jax.random.fold_in(rng, level), staged=False)

    top = sample_levels[-1]

    def eligible(level):
        st = state[level]
        if st["next"] >= len(st["windows"]):
            return False
        if level == top:
            return True
        up = state[level + 1]
        prior = priors[level]
        start = st["windows"][st["next"]]
        if start is None:  # partial window: wait for the full upper level
            return up["next"] >= len(up["windows"])
        need = (start + prior.n_ctx) // prior.cond_downsample
        have = zs[level + 1].shape[1] if level + 1 < len(zs) and \
            zs[level + 1] is not None else 0
        return have >= need

    def run_next(level):
        st = state[level]
        prior = priors[level]
        if not st["staged"]:
            stager.ensure(level)
            st["staged"] = True
        start = st["windows"][st["next"]]
        if start is None:
            new_zs = sample_partial_window(zs, labels[level],
                                           sampling_kwargs[level], level,
                                           prior, st["total"], hps, st["rng"])
        else:
            new_zs = sample_single_window(zs, labels[level],
                                          sampling_kwargs[level], level,
                                          prior, start, hps, st["rng"])
        st["next"] += 1
        return new_zs

    while any(st["next"] < len(st["windows"]) for st in state.values()):
        progressed = False
        # deepest eligible window first: consumers drain as soon as their
        # conditioning exists
        for level in sample_levels:
            if eligible(level):
                zs = run_next(level)
                progressed = True
                break
        assert progressed, "pipeline stalled (no eligible window)"
        for level in reversed(sample_levels):
            st = state[level]
            if st["next"] == len(st["windows"]) and not st.get("done"):
                st["done"] = True
                fin.submit(zs, labels, sampling_kwargs, priors, level, hps)
    fin.join()
    stager.shutdown()
    return zs


def _sample(zs, labels, sampling_kwargs, priors, sample_levels, hps, rng=None):
    """Top-to-bottom cascade: sample a level, decode, save, align, html
    (sample.py:91-121). hps.pipeline_cascade=True (or
    JUKEBOX_PIPELINE=1) interleaves lower-level windows with upper-level
    decoding — identical tokens, overlapped stages."""
    global _T0
    _T0 = time.time()
    stage_walls.clear()
    rng = rng if rng is not None else jax.random.key(hps.get("seed", 0))
    # DEFAULT-ON: token-identical to the sequential cascade (tested) and
    # 22.5% less wall-clock on one chip (PERF.md). JUKEBOX_PIPELINE=0 or
    # hps.pipeline_cascade=False restores the sequential scheduler.
    env = os.environ.get("JUKEBOX_PIPELINE")
    pipelined = hps.get("pipeline_cascade",
                        env != "0" if env is not None else True)
    if pipelined and len(sample_levels) > 1:
        return _sample_pipelined(zs, labels, sampling_kwargs, priors,
                                 sample_levels, hps, rng)
    return _sample_sequential(zs, labels, sampling_kwargs, priors,
                              sample_levels, hps, rng)


def ancestral_sample(labels, sampling_kwargs, priors, hps):
    sample_levels = list(range(len(priors)))
    zs = [np.zeros((hps.n_samples, 0), dtype=np.int64) for _ in range(len(priors))]
    return _sample(zs, labels, sampling_kwargs, priors, sample_levels, hps)


def continue_sample(zs, labels, sampling_kwargs, priors, hps):
    sample_levels = list(range(len(priors)))
    return _sample(zs, labels, sampling_kwargs, priors, sample_levels, hps)


def upsample(zs, labels, sampling_kwargs, priors, hps):
    sample_levels = list(range(len(priors) - 1))
    return _sample(zs, labels, sampling_kwargs, priors, sample_levels, hps)


def primed_sample(x, labels, sampling_kwargs, priors, hps):
    sample_levels = list(range(len(priors)))
    zs = priors[-1].encode(x, start_level=0, end_level=len(priors),
                           bs_chunks=x.shape[0])
    zs = [np.asarray(z) for z in zs]
    return _sample(zs, labels, sampling_kwargs, priors, sample_levels, hps)


def load_prompts(audio_files, duration, hps):
    """Load prompt wavs as [n_samples, T, 1] (sample.py:150-161)."""
    xs = []
    for audio_file in audio_files:
        x = load_audio(audio_file, sr=hps.sr, duration=duration, offset=0.0,
                       mono=True)
        xs.append(x.T)
    while len(xs) < hps.n_samples:
        xs.extend(xs)
    xs = xs[: hps.n_samples]
    return jnp.asarray(np.stack(xs))


def load_codes(codes_file, duration, priors, hps):
    """Load codes from a previous run (sample.py:164-175)."""
    with open(codes_file, "rb") as f:
        data = pickle.load(f)
    zs = [np.asarray(z) for z in data["zs"]]
    assert zs[-1].shape[0] == hps.n_samples
    if duration is not None:
        top_raw_to_tokens = priors[-1].raw_to_tokens
        assert duration % top_raw_to_tokens == 0
        zs = [z[:, : duration // prior.raw_to_tokens]
              for z, prior in zip(zs, priors)]
    return zs


def save_samples(model, device, hps, sample_hps):
    """Default metas + sampling kwargs + mode dispatch (sample.py:178-266)."""
    from jukebox_tpu.lyricdict import gpt_2_lyrics, poems
    print(dict(hps))
    vqvae, priors = make_model(model, device, hps)

    assert hps.sample_length // priors[-2].raw_to_tokens >= priors[-2].n_ctx, \
        "Upsampling needs at least one ctx in get_z_conds; choose a longer sample length"

    total_length = hps.total_sample_length_in_seconds * hps.sr
    offset = 0
    metas = [
        dict(artist="Alan Jackson", genre="Country", lyrics=poems["ozymandias"],
             total_length=total_length, offset=offset),
        dict(artist="Joe Bonamassa", genre="Blues Rock", lyrics=gpt_2_lyrics["hottub"],
             total_length=total_length, offset=offset),
        dict(artist="Frank Sinatra", genre="Classic Pop", lyrics=gpt_2_lyrics["alone"],
             total_length=total_length, offset=offset),
        dict(artist="Ella Fitzgerald", genre="Jazz", lyrics=gpt_2_lyrics["count"],
             total_length=total_length, offset=offset),
        dict(artist="Céline Dion", genre="Pop", lyrics=gpt_2_lyrics["darkness"],
             total_length=total_length, offset=offset),
    ]
    while len(metas) < hps.n_samples:
        metas.extend(metas)
    metas = metas[: hps.n_samples]

    labels = [prior.labeller.get_batch_labels(metas) for prior in priors]

    # reference V100 values are chunk 32/16, max_batch 16/3 (sample.py:231-241);
    # on TPU larger block-aligned prefill chunks fill the MXU far better and a
    # v5e fits bs=16 at 1b scale (PERF.md). Override via hps if needed.
    lower_level_chunk_size = hps.get("lower_level_chunk_size", 256)
    lower_level_max_batch_size = hps.get("lower_level_max_batch_size", 16)
    if model == "1b_lyrics":
        chunk_size, max_batch_size = hps.get("chunk_size", 256), \
            hps.get("max_batch_size", 16)
    else:
        # 5b: bs=4 needs int8 weight staging to fit a 16 GB chip; without it
        # match the reference's V100 default of 3 (sample.py:237)
        import os as _os
        int8_staging = _os.environ.get("JUKEBOX_INT8_DECODE", "") not in ("", "0")
        chunk_size, max_batch_size = hps.get("chunk_size", 128), \
            hps.get("max_batch_size", 4 if int8_staging else 3)
    sampling_kwargs = [
        dict(temp=0.99, fp16=True, chunk_size=lower_level_chunk_size,
             max_batch_size=lower_level_max_batch_size),
        dict(temp=0.99, fp16=True, chunk_size=lower_level_chunk_size,
             max_batch_size=lower_level_max_batch_size),
        dict(temp=0.99, fp16=True, chunk_size=chunk_size,
             max_batch_size=max_batch_size),
    ]

    if sample_hps.mode == "ancestral":
        ancestral_sample(labels, sampling_kwargs, priors, hps)
    elif sample_hps.mode in ("continue", "upsample"):
        assert sample_hps.codes_file is not None
        top_raw_to_tokens = priors[-1].raw_to_tokens
        if sample_hps.prompt_length_in_seconds is not None:
            duration = (int(sample_hps.prompt_length_in_seconds * hps.sr)
                        // top_raw_to_tokens) * top_raw_to_tokens
        else:
            duration = None
        zs = load_codes(sample_hps.codes_file, duration, priors, hps)
        if sample_hps.mode == "continue":
            continue_sample(zs, labels, sampling_kwargs, priors, hps)
        else:
            upsample(zs, labels, sampling_kwargs, priors, hps)
    elif sample_hps.mode == "primed":
        assert sample_hps.audio_file is not None
        assert sample_hps.prompt_length_in_seconds is not None
        audio_files = sample_hps.audio_file.split(",")
        top_raw_to_tokens = priors[-1].raw_to_tokens
        duration = (int(sample_hps.prompt_length_in_seconds * hps.sr)
                    // top_raw_to_tokens) * top_raw_to_tokens
        x = load_prompts(audio_files, duration, hps)
        primed_sample(x, labels, sampling_kwargs, priors, hps)
    else:
        raise ValueError(f"Unknown sample mode {sample_hps.mode}.")


def run(model, mode="ancestral", codes_file=None, audio_file=None,
        prompt_length_in_seconds=None, port=29500, **kwargs):
    from jukebox_tpu.models.make_models import enable_warm_start
    enable_warm_start()  # persistent compile + init + packed-weight caches
    hps = Hyperparams(**kwargs)
    sample_hps = Hyperparams(mode=mode, codes_file=codes_file,
                             audio_file=audio_file,
                             prompt_length_in_seconds=prompt_length_in_seconds)
    save_samples(model, None, hps, sample_hps)


if __name__ == "__main__":
    fire(run)
