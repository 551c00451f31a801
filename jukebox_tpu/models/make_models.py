"""Model factories, registry and checkpoint plumbing — TPU equivalent of
jukebox/make_models.py. Builds config dataclasses from the hparams registry
and wraps them in thin host-side runtimes that own the parameter pytrees and
cache jitted apply functions.
"""

import os
import sys
import threading
import time

import jax
import jax.numpy as jnp
import numpy as np

from jukebox_tpu.hparams import REMOTE_PREFIX, Hyperparams, setup_hparams
from jukebox_tpu.models.encdec import BlockCfg
from jukebox_tpu.models.prior import SimplePrior
from jukebox_tpu.models.vqvae import VQVAE, calculate_strides
from jukebox_tpu.utils.checkpoints import load_checkpoint, save_checkpoint
from jukebox_tpu.utils.misc import tunnel_transfer, vlog, yield_to_transfers

import contextlib


def _host_device():
    """Context running eager ops on the host CPU backend when it exists.
    Must be a LOCAL device: in a multi-process world jax.devices("cpu")[0]
    is process 0's device and is non-addressable elsewhere."""
    try:
        return jax.default_device(jax.local_devices(backend="cpu")[0])
    except RuntimeError:
        return contextlib.nullcontext()


def _cached_init(model, seed_key, seed):
    """model.init with an optional on-disk cache (JUKEBOX_INIT_CACHE=1).
    Eagerly initialising a billion-param model is minutes of tiny host ops;
    benchmarks and repeated fresh-init runs hit the cache instead. Keyed by
    the param tree's shapes/dtypes + seed."""
    if not os.environ.get("JUKEBOX_INIT_CACHE"):
        return model.init(seed_key)
    import hashlib
    import pickle
    tree = jax.eval_shape(model.init, seed_key)
    desc = str(jax.tree_util.tree_map(lambda x: (x.shape, str(x.dtype)), tree))
    h = hashlib.sha1(f"{desc}|{seed}".encode()).hexdigest()[:16]
    cdir = os.path.expanduser("~/.cache/jukebox_tpu")
    path = os.path.join(cdir, f"init_{h}.pkl")
    if os.path.exists(path):
        with open(path, "rb") as f:
            return pickle.load(f)
    params = model.init(seed_key)
    try:
        os.makedirs(cdir, exist_ok=True)
        host = jax.tree_util.tree_map(np.asarray, params)
        with open(path + ".tmp", "wb") as f:
            pickle.dump(host, f)
        os.replace(path + ".tmp", path)
    except OSError:
        pass
    return params


def enable_warm_start(cache_dir=None):
    """Turn on every cross-run warm-start cache: the XLA persistent compile
    cache (megakernel + segment graphs recompile in ~0 s on the second run
    vs 83-955 s cold), the eager-init disk cache and the packed-weight
    staging cache. Called by the sample/train CLI entry points and bench.py
    so the end-to-end wall-clock a user sees pays one-time costs once per
    machine, not once per run."""
    cache_dir = cache_dir or os.path.expanduser("~/.cache/jukebox_tpu")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(cache_dir, "xla"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)
    os.environ.setdefault("JUKEBOX_INIT_CACHE", "1")
    os.environ.setdefault("JUKEBOX_STAGE_CACHE", "1")
    return cache_dir


def _params_digest(host_tree):
    """Cheap content key for staging caches: shapes/dtypes of every leaf +
    a strided 4096-element subsample of its bytes (hashing 5 GB in full
    would cost ~10 s; the subsample is collision-proof against everything
    but adversarial edits)."""
    import hashlib
    h = hashlib.sha1()
    for leaf in jax.tree_util.tree_leaves(host_tree):
        a = np.asarray(leaf)
        h.update(str((a.shape, str(a.dtype))).encode())
        flat = a.reshape(-1)
        h.update(np.ascontiguousarray(
            flat[::max(1, flat.size // 4096)]).tobytes())
    return h.hexdigest()[:16]


_XFER_LOCK = threading.Lock()  # one bulk host->HBM transfer at a time


def _gated_device_put(tree, chunk_bytes=64 << 20):
    """host->HBM transfer in bounded chunks, each blocked-until-ready under
    a process-global lock. A single giant device_put enqueues gigabytes of
    buffer writes on the transport at once; over the axon tunnel the decode
    threads' dispatches then queue behind the whole backlog and both sides
    crawl (measured: 0.82 GB in 1.6 s idle vs 454.7 s while another level
    was decoding). Chunking keeps at most ~chunk_bytes in flight so decode
    dispatches slot in between chunks, and the lock keeps concurrent
    stagers (pre-staging, alignment to_device) from interleaving frames."""
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    out = []
    pending = []
    size = 0

    def flush():
        nonlocal size
        if not pending:
            return
        out.extend(jax.device_put(pending))
        pending.clear()
        size = 0

    # announce the transfer so dispatch loops pause issuing new segments
    # (tunnel_transfer), and serialize against other bulk transfers
    # (_XFER_LOCK) — together the chunks run at idle-tunnel bandwidth.
    # Sync ONCE at the end, not per chunk: the yield gate already pauses
    # every dispatch loop for the whole transfer, so nothing can use the
    # inter-chunk gaps — and each per-chunk block_until_ready costs a
    # tunnel RETURN-path round-trip, which with D2H degraded to ~1 MB/s
    # made the per-chunk syncs alone ~190 s (~40%) of the measured 501 s
    # r4 cascade (0.91 GB staged at 11 MB/s while the one-shot probe
    # measured H2D 570 MB/s the same minute; cascade_warmE_r4.log)
    with tunnel_transfer(), _XFER_LOCK:
        unsynced = 0
        for leaf in leaves:
            pending.append(leaf)
            size += getattr(leaf, "nbytes", 0)
            if size >= chunk_bytes:
                unsynced += size
                flush()
                if unsynced >= (2 << 30):
                    # bound in-flight bytes: the transport is only proven
                    # to 0.82 GB in a single enqueue; a 5.5 GB 5b stage
                    # pays 2 interim syncs, not 80
                    jax.block_until_ready(out)
                    unsynced = 0
        flush()
        jax.block_until_ready(out)
    return jax.tree_util.tree_unflatten(treedef, out)


def default_segment_tokens():
    """Decode-segment length for PriorRuntime.sample. The axon transport
    (remote-tunnelled TPU) faults on executions beyond ~1 minute, so decoding
    is bounded to short device calls there; other backends default to the
    monolithic single-call scan. Override with JUKEBOX_SEGMENT_TOKENS
    (0 = monolithic)."""
    env = os.environ.get("JUKEBOX_SEGMENT_TOKENS")
    if env is not None:
        v = int(env)
        return v if v > 0 else None
    # the axon plugin reports its devices as plain "tpu"; detect via env
    on_axon = "axon" in os.environ.get("JAX_PLATFORMS", "") \
        or os.environ.get("PALLAS_AXON_REMOTE_COMPILE")
    return 512 if on_axon else None


def _prefill_mb(n_samples):
    """Sample-axis prefill microbatch (None = whole batch in one pass).
    JUKEBOX_PREFILL_MB=<n> bounds the prefill transients to n samples at a
    time — hop windows at bs>=24 on a 16 GB chip need this (PERF.md
    serving mode); 0/unset keeps the single-pass prefill."""
    env = os.environ.get("JUKEBOX_PREFILL_MB")
    if not env or int(env) <= 0:
        return None
    mb = int(env)
    return mb if mb < n_samples else None


MODELS = {
    "5b": ("vqvae", "upsampler_level_0", "upsampler_level_1", "prior_5b"),
    "5b_lyrics": ("vqvae", "upsampler_level_0", "upsampler_level_1", "prior_5b_lyrics"),
    "1b_lyrics": ("vqvae", "upsampler_level_0", "upsampler_level_1", "prior_1b_lyrics"),
    # 'your_model': ("your_vqvae_here", "your_upsampler_here", ..., "your_top_prior_here")
}


# ---------------------------------------------------------------------------
# Restore helpers
# ---------------------------------------------------------------------------

def _resolve_restore(path):
    """Map a restore spec to a local file, mirroring the reference's
    ~/.cache layout for azure-hosted checkpoints (make_models.py:24-39).
    Returns None when nothing restorable exists (zero-egress: remote
    checkpoints must be pre-seeded into the cache)."""
    if not path:
        return None
    if path.startswith(REMOTE_PREFIX):
        local = os.path.join(os.path.expanduser("~/.cache"),
                             path[len(REMOTE_PREFIX):])
        if os.path.exists(local):
            return local
        print(f"[make_models] remote checkpoint {path} not cached at {local}; "
              f"using fresh init")
        return None
    if os.path.exists(path):
        return path
    print(f"[make_models] checkpoint {path} not found; using fresh init")
    return None


def _load_any(path, kind, model):
    """Load a native pickle checkpoint or convert a torch .pth.tar."""
    if path.endswith(".pth.tar"):
        from jukebox_tpu.utils.torch_convert import convert_checkpoint
        return convert_checkpoint(path, kind, model)
    return load_checkpoint(path)


def restore_model(runtime, checkpoint_path, kind):
    runtime.step = 0
    path = _resolve_restore(checkpoint_path)
    if path is None:
        return
    ckpt = _load_any(path, kind, runtime.model)
    runtime.params = jax.device_put(ckpt["params"])
    if "state" in ckpt and ckpt["state"] is not None and hasattr(runtime, "state"):
        runtime.state = jax.device_put(ckpt["state"])
    runtime.step = int(ckpt.get("step", 0))
    print(f"Restored from {path}")


def restore_opt(opt_state, checkpoint_path):
    path = _resolve_restore(checkpoint_path)
    if path is None:
        return opt_state, 0
    ckpt = _load_any(path, "opt", None)
    # converted torch .pth.tar checkpoints carry opt=None (key present, no
    # convertible optimizer state) — keep the freshly initialised state then
    opt = ckpt.get("opt")
    return (opt_state if opt is None else opt), int(ckpt.get("step", 0))


def save_model_checkpoint(logdir, name, runtime, opt_state, step, hps):
    save_hps = {k: v for k, v in dict(hps).items()
                if k not in ("metadata_v2", "metadata_v3", "alignments",
                             "lyric_processor", "midi_processor", "bandwidth")}
    payload = dict(hps=save_hps, params=runtime.params,
                   state=getattr(runtime, "state", None),
                   opt=opt_state, step=step)
    save_checkpoint(f"{logdir}/checkpoint_{name}.jkb", payload)


# ---------------------------------------------------------------------------
# Runtimes
# ---------------------------------------------------------------------------

class VQVAERuntime:
    """Owns VQVAE params + codebook state; mirrors the reference VQVAE public
    surface (encode/decode/sample with bs_chunks microbatching,
    vqvae.py:101-148)."""

    def __init__(self, model: VQVAE, params, state):
        self.model = model
        self.params = params
        self.state = state
        self.step = 0
        self._encode = jax.jit(model.encode, static_argnames=("start_level", "end_level"))
        self._decode = jax.jit(model.decode, static_argnames=("start_level", "end_level"))

    # mirrored attributes
    @property
    def sample_length(self):
        return self.model.sample_length

    @property
    def z_shapes(self):
        return self.model.z_shapes

    @property
    def levels(self):
        return self.model.levels

    @property
    def downs_t(self):
        return self.model.downs_t

    @property
    def strides_t(self):
        return self.model.strides_t

    @property
    def l_bins(self):
        return self.model.l_bins

    def encode(self, x, start_level=0, end_level=None, bs_chunks=1):
        x = jnp.asarray(x)
        chunks = np.array_split(np.arange(x.shape[0]), bs_chunks)
        zs_list = [self._encode(self.params, self.state, x[c],
                                start_level=start_level, end_level=end_level)
                   for c in chunks]
        return [jnp.concatenate(z, axis=0) for z in zip(*zs_list)]

    def decode(self, zs, start_level=0, end_level=None, bs_chunks=1):
        zs = [jnp.asarray(z) for z in zs]
        chunks = np.array_split(np.arange(zs[0].shape[0]), bs_chunks)
        outs = []
        for c in chunks:
            yield_to_transfers()  # bulk weight stages get the tunnel first
            outs.append(self._decode(self.params, self.state,
                                     [z[c] for z in zs],
                                     start_level=start_level,
                                     end_level=end_level))
        return jnp.concatenate(outs, axis=0)

    def sample(self, n_samples, rng=None):
        rng = rng if rng is not None else jax.random.key(0)
        zs = [jax.random.randint(jax.random.fold_in(rng, l), (n_samples, *shape),
                                 0, self.model.l_bins)
              for l, shape in enumerate(self.z_shapes)]
        return self.decode(zs[0:1], start_level=0, end_level=1)

    def forward(self, x, hps, loss_fn="l1", train=False, rng=None):
        x_out, loss, metrics, self.state = self.model.forward(
            self.params, self.state, jnp.asarray(x), hps, loss_fn=loss_fn,
            train=train, rng=rng)
        return x_out, loss, metrics


_JIT_SHARE = {}  # SimplePrior.jit_key -> jitted sampling/forward callables
# each entry pins its first SimplePrior (bound methods) + compiled
# executables for as long as it lives; bound so long-lived processes that
# build many distinct architectures (servers, test suites) don't
# accumulate dead compile caches. LRU on insertion order.
_JIT_SHARE_MAX = 8


def clear_jit_share():
    """Drop all shared compiled sampling graphs (tests/servers that build
    many model configs call this to release pinned models + executables)."""
    _JIT_SHARE.clear()


def _shared_jits(model):
    """One set of traced+compiled sampling callables per ARCHITECTURE, not
    per PriorRuntime instance. Params are explicit arguments to every
    jitted fn, and SimplePrior.jit_key covers everything that shapes the
    trace, so the two upsampler levels of a cascade — the same network at
    different levels — share each compiled graph instead of re-paying
    trace+compile per level (tens of seconds per window shape on the
    remote-compile TPU). Token identity is tested
    (tests/test_pipeline.py::test_jit_sharing_token_identity).
    JUKEBOX_SHARE_JIT=0 disables sharing."""
    key = getattr(model, "jit_key", None)
    share = key is not None and os.environ.get("JUKEBOX_SHARE_JIT", "1") != "0"
    if share and key in _JIT_SHARE:
        _JIT_SHARE[key] = _JIT_SHARE.pop(key)  # LRU touch
        return _JIT_SHARE[key]
    ent = dict(
        sample=jax.jit(
            model.sample,
            static_argnames=("n_samples", "fp16", "temp", "top_k", "top_p",
                             "chunk_size", "sample_tokens")),
        sample_init=jax.jit(
            model.sample_init, static_argnames=("n_samples", "fp16",
                                                "chunk_size", "prefill_mb",
                                                "cond_bs1")),
        # caches (arg 1) are donated: each segment consumes the previous
        # segment's caches in place
        sample_segment=jax.jit(
            model.sample_segment,
            static_argnames=("n_steps", "fp16", "temp", "top_k", "top_p"),
            donate_argnums=(1,)),
        z_forward=jax.jit(
            model.z_forward, static_argnames=("fp16", "get_preds")),
        # prime-swap staging: the lyric-encoder forward in its own jit so
        # the 0.7 GB (5b) prime weights never share the HBM peak with the
        # decode rings (reference swaps prime_prior per window the same
        # way, prior.py:285-301)
        encoder_kv_from_y=jax.jit(
            model.encoder_kv_from_y, static_argnames=("fp16",)),
        z_forward_attn={},  # jitted attn-recording fwd per layer-set
    )
    if share:
        _JIT_SHARE[key] = ent
        while len(_JIT_SHARE) > _JIT_SHARE_MAX:
            _JIT_SHARE.pop(next(iter(_JIT_SHARE)))
    return ent


class PriorRuntime:
    """Owns SimplePrior params; mirrors the reference SimplePrior public
    surface used by the sampling/training orchestration (prior.py:27-354).

    to_host()/to_device() are the TPU equivalents of the reference's
    prior.cpu()/prior.cuda() swapping during the cascade (sample.py:94-104):
    inactive priors' params live in host RAM so only one level's weights
    occupy HBM at a time."""

    def __init__(self, model: SimplePrior, params, vqvae: VQVAERuntime):
        self.model = model
        self.params = params
        self.vqvae = vqvae
        self.step = 0
        ent = _shared_jits(model)
        self._sample = ent["sample"]
        self._sample_init_jit = ent["sample_init"]
        self._sample_segment = ent["sample_segment"]
        self._z_forward = ent["z_forward"]
        self._encoder_kv_jit = ent["encoder_kv_from_y"]
        self._z_forward_attn = ent["z_forward_attn"]
        self._staged_light = self._staged_dec = None
        self._staged_prime_host = None
        self._staged_mode = None
        self._params_host = None
        # serializes param residency moves: the async cascade runs decode,
        # alignment and pre-staging on separate threads that all
        # read-modify-write self.params / the staged trees
        self._move_lock = threading.RLock()

    def to_host(self):
        with self._move_lock:
            if getattr(self, "_params_host", None) is not None:
                # sampling/alignment never mutates params, so the host tree
                # kept by to_device is still current: restoring the reference
                # avoids a full-raw-params D2H readback (2.6 GB at 1b scale —
                # measured 370+ s on a degraded axon tunnel)
                self.params = self._params_host
            else:
                self.params = jax.tree_util.tree_map(np.asarray, self.params)
            self._params_host = None
            self._staged_light = self._staged_dec = None
            self._staged_prime_host = None
            self._staged_mode = None

    def to_device(self):
        with self._move_lock:
            host = self.params
            self.params = _gated_device_put(host)
            # only a genuinely host-resident tree can serve as the to_host
            # restore point (double to_device must not pin device arrays)
            leaves = jax.tree_util.tree_leaves(host)
            self._params_host = host if (
                leaves and isinstance(leaves[0], np.ndarray)) else None

    def stage_decode(self, quantize=None, mesh=None):
        with self._move_lock:
            return self._stage_decode(quantize=quantize, mesh=mesh)

    def _stage_decode(self, quantize=None, mesh=None):
        """Stage the SAMPLING form on device: segment-stacked transformer
        params (stacked host-side with numpy) plus the remaining 'light'
        params. Zero-copy: the raw per-layer transformer weights never exist
        on device, so billion-param decode fits HBM without the transient
        duplicate (at 5B scale the duplicate alone exceeds a v5e chip).

        quantize: "int8" stores the transformer dense weights as weight-only
        int8 with per-out-channel scales (halves the per-token HBM weight
        stream AND the staged footprint; embeddings/LayerNorm stay full
        precision). Default from JUKEBOX_INT8_DECODE=1.

        mesh: a Mesh with an 'mp' axis enables tensor-parallel decode —
        transformer matmuls placed under Megatron splits
        (parallel/shardings.decode_param_specs), light params replicated.
        The jitted sample_init/sample_segment then run SPMD with XLA
        inserting the per-layer all-reduces on ICI; KV caches inherit the
        n_state split, so per-chip weight AND cache HBM divide by mp."""
        if quantize is None and os.environ.get("JUKEBOX_INT8_DECODE"):
            quantize = "int8"
        # int8 ring caches follow the weight quantization by default
        # (JUKEBOX_INT8_CACHE=1/0 overrides); part of the mode key so an
        # env flip re-stages instead of silently reusing the old form
        cache_int8 = os.environ.get("JUKEBOX_INT8_CACHE")
        mode_key = (quantize, mesh, cache_int8,
                    os.environ.get("JUKEBOX_SWAP_PRIME", "auto"))
        if (self._staged_dec is not None
                and getattr(self, "_staged_mode", None) == mode_key):
            return  # already staged in this form (e.g. re-entering _sample)
        self._staged_mode = mode_key
        t_prep = time.time()
        host = jax.tree_util.tree_map(np.asarray, self.params)
        if quantize not in (None, "int8"):
            raise ValueError(f"unknown decode quantization {quantize!r}")
        stack_default = "1" if jax.devices()[0].platform == "tpu" else "0"
        stack_on = (mesh is None
                    and os.environ.get("JUKEBOX_STACK_KERNEL",
                                       stack_default) != "0")

        # packed-weight disk cache: the host-side stacking + chunk-major
        # packing + int8 quantization of a 5B-param prior costs minutes of
        # numpy per process; repeated runs load the packed form instead
        # (JUKEBOX_STAGE_CACHE=0 disables). The tunnel host->HBM transfer
        # still happens once per process — that part is physics.
        cache_path = None
        dec = None
        if mesh is None and os.environ.get("JUKEBOX_STAGE_CACHE") == "1":
            import pickle
            key = _params_digest(host["prior"]["transformer"])
            mode = f"{quantize}_{int(stack_on)}_{cache_int8}"
            cdir = os.path.expanduser("~/.cache/jukebox_tpu")
            cache_path = os.path.join(cdir, f"stage_{key}_{mode}.pkl")
            if os.path.exists(cache_path):
                with open(cache_path, "rb") as f:
                    dec = pickle.load(f)
        if dec is None:
            tr = host["prior"]["transformer"]
            dec = self.model.prior.transformer.prepare_decode_params(
                tr, stack=np.stack)
            if stack_on:
                # [1,2,3]-cycle segments decode through the whole-stack
                # Pallas megakernel (ops/pallas/decode_stack): weights staged
                # in its chunk-major layout (+42% decode over the XLA scan
                # on-chip; int8 packing additionally halves the weight
                # stream)
                dec = self.model.prior.transformer.pack_stack_segments(
                    dec, quantize=quantize == "int8")
            if quantize == "int8":
                # remaining (non-packed) segments: weight-only int8 dense
                # form; quantize_dense_tree leaves the packed dicts untouched
                from jukebox_tpu.ops.core import quantize_dense_tree
                dec = quantize_dense_tree(dec)
            if cache_path is not None:
                import pickle
                try:
                    os.makedirs(os.path.dirname(cache_path), exist_ok=True)
                    with open(cache_path + ".tmp", "wb") as f:
                        pickle.dump(jax.tree_util.tree_map(np.asarray, dec),
                                    f, protocol=4)
                    os.replace(cache_path + ".tmp", cache_path)
                except OSError:
                    pass
        light = dict(host)
        light["prior"] = {k: v for k, v in host["prior"].items()
                          if k != "transformer"}
        # prime-swap staging (sep enc-dec only): keep the lyric encoder's
        # weights HOST-side and run encoder_kv_from_y in its own jit per
        # window init, so the prime encoder (0.7 GB fp16 at 5b) is off
        # device before the ring caches allocate — it never contributes to
        # the decode HBM peak. JUKEBOX_SWAP_PRIME=1/0 forces; default
        # "auto" = swap when the prime subtrees exceed 256 MB (5b yes,
        # test-scale no). Mirrors the reference's per-window
        # prime_prior.cuda() -> forward -> .cpu() (prior.py:285-301).
        swap_env = os.environ.get("JUKEBOX_SWAP_PRIME", "auto")
        self._staged_prime_host = None
        prime_keys = [k for k in ("prime_prior", "prime_state_proj",
                                  "prime_state_ln") if k in light]
        if mesh is None and swap_env != "0" and "prime_prior" in prime_keys:
            p_bytes = sum(x.nbytes for x in jax.tree_util.tree_leaves(
                [light[k] for k in prime_keys]))
            if swap_env == "1" or p_bytes > (256 << 20):
                self._staged_prime_host = {k: light.pop(k)
                                           for k in prime_keys}
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec
            from jukebox_tpu.parallel.shardings import decode_param_specs
            repl = NamedSharding(mesh, PartitionSpec())
            self._staged_light = jax.tree_util.tree_map(
                lambda x: jax.device_put(x, repl), light)
            self._staged_dec = jax.tree_util.tree_map(
                lambda x, s: jax.device_put(x, NamedSharding(mesh, s)),
                dec, decode_param_specs(dec))
        else:
            t_xfer = time.time()
            self._staged_light = _gated_device_put(light)
            self._staged_dec = _gated_device_put(dec)
            n_bytes = sum(x.nbytes for x in
                          jax.tree_util.tree_leaves(self._staged_dec))
            vlog(f"[stage_decode] prep {t_xfer - t_prep:.1f}s, host->HBM "
                 f"{n_bytes / 1e9:.2f} GB in {time.time() - t_xfer:.1f}s")
        self.params = host  # raw stays host-resident

    # mirrored attributes
    def __getattr__(self, name):
        # fall through to the model config for n_ctx, raw_to_tokens,
        # sample_length, labeller, n_tokens, levels, level, z_shapes, ...
        return getattr(self.model, name)

    def get_y(self, labels, start, get_indices=False):
        return self.model.get_y(labels, start, get_indices=get_indices)

    def get_z_conds(self, zs, start, end):
        return self.model.get_z_conds(zs, start, end)

    def encode(self, x, start_level=None, end_level=None, bs_chunks=1):
        start_level = self.model.level if start_level is None else start_level
        end_level = self.model.levels if end_level is None else end_level
        return self.vqvae.encode(x, start_level=start_level, end_level=end_level,
                                 bs_chunks=bs_chunks)

    def decode(self, zs, start_level=None, end_level=None, bs_chunks=1):
        start_level = self.model.level if start_level is None else start_level
        end_level = self.model.levels if end_level is None else end_level
        return self.vqvae.decode(zs, start_level=start_level, end_level=end_level,
                                 bs_chunks=bs_chunks)

    def sample(self, n_samples, z=None, z_conds=None, y=None, rng=None,
               fp16=False, temp=1.0, top_k=0, top_p=0.0, chunk_size=None,
               sample_tokens=None, segment_tokens="auto"):
        rng = rng if rng is not None else jax.random.key(np.random.randint(2**31))
        y_host = None
        if y is not None:
            # keep the host copy: _sample_init's cond_bs1 check needs the
            # values, and a device->host readback issued while a bulk weight
            # stage is in flight wedges the axon transport for minutes
            # (measured: the level-1 pre-stage crawled at ~2 MB/s behind a
            # blocked np.asarray(y) of this very array)
            y_host = np.asarray(y)
            y = jnp.asarray(y_host)
        if z is not None and z.shape[1] == 0:
            z = None
        if z_conds is not None:
            z_conds = [jnp.asarray(zc) for zc in z_conds]
        if segment_tokens == "auto":
            segment_tokens = default_segment_tokens()
        if segment_tokens:
            return self._sample_segmented(
                n_samples, z, z_conds, y, rng, fp16, temp, top_k, top_p,
                chunk_size, sample_tokens, segment_tokens, y_host=y_host)
        return self._sample(self.params, n_samples, rng, z=z, z_conds=z_conds,
                            y=y, fp16=fp16, temp=temp, top_k=top_k, top_p=top_p,
                            chunk_size=chunk_size, sample_tokens=sample_tokens)

    def _sample_init(self, params, n_samples, z=None, z_conds=None, y=None,
                     y_host=None, **kw):
        """Host wrapper over the jitted sample_init: detect the standard
        windowed-sampling case where every sample shares identical labels
        (same window -> same offset/length/artist/lyrics) and collapse the
        conditioning to batch 1 (static cond_bs1). Only non-x_cond (top)
        priors qualify — upsampler x_cond derives from per-sample z_conds.
        The check reads y_host (the host mirror kept by sample()) when
        available: a D2H readback of device y here can stall minutes behind
        a concurrent bulk weight stage on the axon transport."""
        cond_bs1 = False
        mesh = (self._staged_mode or (None, None))[1]
        if (not self.model.x_cond and y is not None and n_samples > 1
                and mesh is None):  # sharded sample axis needs full batch
            ya = y_host if y_host is not None else np.asarray(y)
            cond_bs1 = bool((ya == ya[:1]).all())
        if (self._staged_prime_host is not None and y is not None
                and params is self._staged_light):
            # prime-swap: stage the lyric encoder, run it in its own jit,
            # and drop it from HBM BEFORE sample_init allocates the rings —
            # prime weights and ring caches never coexist at the peak
            prime_dev = _gated_device_put(self._staged_prime_host)
            kv = self._encoder_kv_jit(prime_dev, y,
                                      fp16=kw.get("fp16", False))
            kv = jax.block_until_ready(kv)
            del prime_dev
            kw["encoder_kv"] = kv
        return self._sample_init_jit(params, n_samples, z=z, z_conds=z_conds,
                                     y=y, cond_bs1=cond_bs1, **kw)

    def _sample_segmented(self, n_samples, z, z_conds, y, rng, fp16, temp,
                          top_k, top_p, chunk_size, sample_tokens,
                          segment_tokens, y_host=None):
        """Windowed decode as a host loop over fixed-size token segments:
        each device call stays short (bounded transport latency, resumable
        progress) and the segment graph is compiled once and reused across
        the window and across windows. Token stream is identical to the
        monolithic path (rng folds on absolute positions)."""
        model = self.model
        if self._staged_dec is not None:
            call_params, dec = self._staged_light, self._staged_dec
        else:
            call_params, dec = self.params, None
        yield_to_transfers()  # don't dispatch the prefill into a bulk stage
        t_init = time.time()
        caches, x_tok, x_cond, y_cond, encoder_kv = self._sample_init(
            call_params, n_samples, z=z, z_conds=z_conds, y=y, y_host=y_host,
            fp16=fp16, chunk_size=chunk_size, dec_params=dec,
            prefill_mb=_prefill_mb(n_samples))
        # JUKEBOX_SEG_TIMING=1: block per stage for accurate walls (adds a
        # host-device round-trip per segment — diagnosis runs only)
        seg_timing = bool(os.environ.get("JUKEBOX_SEG_TIMING"))
        if seg_timing:
            jax.block_until_ready(x_tok)
            vlog(f"[segmented] init {time.time() - t_init:.1f}s "
                 f"(prefix {model.sample_prefix_len(z)})")
        t = model.sample_prefix_len(z)
        total = sample_tokens if sample_tokens is not None else model.n_ctx
        if model.single_enc_dec:
            total += model.n_tokens
        toks = []
        while t < total:
            yield_to_transfers()  # let a pending bulk weight stage drain
            n = min(segment_tokens, total - t)
            t_seg = time.time()
            seg, caches, x_tok = self._sample_segment(
                call_params, caches, x_tok, np.int32(t), n, rng,
                x_cond=x_cond, y_cond=y_cond, encoder_kv=encoder_kv,
                fp16=fp16, temp=temp, top_k=top_k, top_p=top_p,
                dec_params=dec)
            if seg_timing:
                jax.block_until_ready(x_tok)
                vlog(f"[segmented] seg @{t}+{n} {time.time() - t_seg:.1f}s")
            toks.append(seg)
            t += n
        z_out = model.sample_finish(jnp.concatenate(toks, axis=1), z=z)
        if sample_tokens is None:
            assert z_out.shape == (n_samples, *model.z_shape), \
                f"Expected {(n_samples, *model.z_shape)}, got {z_out.shape}"
        return z_out

    def z_forward(self, z, z_conds=(), y=None, fp16=False, get_preds=False,
                  get_attn_weights=False, attn_head=None):
        if get_attn_weights:
            layers = frozenset(get_attn_weights)
            key = (layers, fp16, attn_head)
            if key not in self._z_forward_attn:
                def fwd(params, z, z_conds, y, _layers=layers,
                        _fp16=fp16, _head=attn_head):
                    ws = self.model.z_forward(
                        params, z, z_conds=z_conds, y=y, fp16=_fp16,
                        get_attn_weights=_layers)
                    if _head is None:
                        return ws
                    # select the alignment head and cast in-jit: D2H of the
                    # full per-layer maps is heads x 2 larger (alignment
                    # reads ONE fp16-precision head; the axon tunnel pays
                    # ~0.5 GB per hop otherwise)
                    return [w[:, _head].astype(jnp.float16) for w in ws]
                self._z_forward_attn[key] = jax.jit(fwd)
            if y is not None:
                y = jnp.asarray(np.asarray(y))
            return self._z_forward_attn[key](self.params, z, list(z_conds), y)
        if y is not None:
            y = jnp.asarray(np.asarray(y))
        return self._z_forward(self.params, z, z_conds, y, fp16=fp16,
                               get_preds=get_preds)

    def forward(self, x, y=None, fp16=False, decode=False, get_preds=False):
        bs = x.shape[0]
        z, *z_conds = self.encode(x, bs_chunks=bs)
        loss, metrics = self.z_forward(z, z_conds=z_conds, y=y, fp16=fp16,
                                       get_preds=get_preds)
        x_out = self.decode([z, *z_conds]) if decode else None
        return x_out, loss, metrics


# ---------------------------------------------------------------------------
# Factories (reference make_models.py:73-196)
# ---------------------------------------------------------------------------

def make_vqvae(hps, device=None):
    block = BlockCfg(width=hps.width, depth=hps.depth, m_conv=hps.m_conv,
                     dilation_growth_rate=hps.dilation_growth_rate,
                     dilation_cycle=hps.dilation_cycle,
                     reverse_decoder_dilation=hps.vqvae_reverse_decoder_dilation)

    if not hps.sample_length:
        assert hps.sample_length_in_seconds != 0
        downsamples = calculate_strides(hps.strides_t, hps.downs_t)
        top_raw_to_tokens = int(np.prod(downsamples))
        hps.sample_length = ((hps.sample_length_in_seconds * hps.sr)
                             // top_raw_to_tokens) * top_raw_to_tokens
        print(f"Setting sample length to {hps.sample_length} "
              f"(i.e. {hps.sample_length / hps.sr} seconds) to be a multiple "
              f"of {top_raw_to_tokens}")

    model = VQVAE(input_shape=(hps.sample_length, 1), levels=hps.levels,
                  downs_t=tuple(hps.downs_t), strides_t=tuple(hps.strides_t),
                  emb_width=hps.emb_width, l_bins=hps.l_bins, mu=hps.l_mu,
                  commit=hps.commit, spectral=hps.spectral,
                  multispectral=hps.multispectral,
                  multipliers=tuple(hps.hvqvae_multipliers) if hps.hvqvae_multipliers else None,
                  use_bottleneck=hps.use_bottleneck, block=block)

    # init on host CPU (hundreds of small ops; on a remote-tunnel device each
    # eager op costs a network round-trip), then one bulk device_put
    with _host_device():
        seed = hps.get("seed", 0)
        params = _cached_init(model, jax.random.key(seed), seed)
        state = model.init_state()
    runtime = VQVAERuntime(model, jax.device_put(params), jax.device_put(state))
    restore_model(runtime, hps.restore_vqvae, "vqvae")

    if hps.get("train", False) and not hps.get("prior", False):
        if hps.restore_vqvae:
            # reset bottleneck EMA stats for finetuning (make_models.py:99-105)
            downsamples = calculate_strides(hps.strides_t, hps.downs_t)
            blocks = []
            for level, s in enumerate(runtime.state["level_blocks"]):
                raw_to_tokens = int(np.prod(downsamples[: level + 1]))
                # reference seeds with the GLOBAL per-step token count
                # (make_models.py:104: num_tokens * dist.get_world_size())
                num_tokens = (hps.sample_length // raw_to_tokens) * jax.device_count()
                blocks.append(model.bottleneck.block.restore_state(
                    s["k"], num_tokens=num_tokens,
                    threshold=hps.revival_threshold))
            runtime.state = {"level_blocks": blocks}
    return runtime


def make_prior(hps, vqvae: VQVAERuntime, device=None):
    train = hps.get("train", False)
    prior_kwargs = dict(
        input_shape=(hps.n_ctx,), bins=vqvae.l_bins,
        width=hps.prior_width, depth=hps.prior_depth, heads=hps.heads,
        attn_order=hps.attn_order, blocks=hps.blocks, spread=hps.spread,
        zero_out=hps.zero_out, res_scale=hps.res_scale, pos_init=hps.pos_init,
        init_scale=hps.init_scale, m_attn=hps.m_attn, m_mlp=hps.m_mlp,
        attn_dropout=hps.attn_dropout if train else 0.0,
        resid_dropout=hps.resid_dropout if train else 0.0,
        emb_dropout=hps.emb_dropout if train else 0.0,
        checkpoint_res=hps.c_res if train else 0,
        checkpoint_attn=hps.c_attn if train else 0,
        checkpoint_mlp=hps.c_mlp if train else 0)

    x_cond_kwargs = dict(
        out_width=hps.prior_width, init_scale=hps.init_scale,
        width=hps.cond_width, depth=hps.cond_depth, m_conv=hps.cond_m_conv,
        dilation_growth_rate=hps.cond_dilation_growth_rate,
        dilation_cycle=hps.cond_dilation_cycle,
        zero_out=hps.cond_zero_out, res_scale=hps.cond_res_scale,
        checkpoint_res=hps.cond_c_res)

    y_cond_kwargs = dict(
        out_width=hps.prior_width, init_scale=hps.init_scale,
        y_bins=hps.y_bins, t_bins=hps.t_bins, sr=hps.sr,
        min_duration=hps.min_duration, max_duration=hps.max_duration,
        max_bow_genre_size=hps.max_bow_genre_size)

    if hps.use_tokens and not hps.single_enc_dec:
        prime_kwargs = dict(
            use_tokens=hps.use_tokens, prime_loss_fraction=hps.prime_loss_fraction,
            n_tokens=hps.n_tokens, bins=hps.n_vocab,
            width=hps.prime_width, depth=hps.prime_depth, heads=hps.prime_heads,
            attn_order=hps.prime_attn_order, blocks=hps.prime_blocks,
            spread=hps.prime_spread, zero_out=hps.prime_zero_out,
            res_scale=hps.prime_res_scale, pos_init=hps.prime_pos_init,
            init_scale=hps.prime_init_scale, m_attn=hps.prime_m_attn,
            m_mlp=hps.prime_m_mlp,
            attn_dropout=hps.prime_attn_dropout if train else 0.0,
            resid_dropout=hps.prime_resid_dropout if train else 0.0,
            emb_dropout=hps.prime_emb_dropout if train else 0.0,
            checkpoint_res=hps.prime_c_res if train else 0,
            checkpoint_attn=hps.prime_c_attn if train else 0,
            checkpoint_mlp=hps.prime_c_mlp if train else 0)
    else:
        prime_kwargs = dict(use_tokens=hps.use_tokens,
                            prime_loss_fraction=hps.prime_loss_fraction,
                            n_tokens=hps.n_tokens, bins=hps.n_vocab)

    # z_shapes for other levels given this level gets n_ctx codes
    rescale = lambda z_shape: (z_shape[0] * hps.n_ctx // vqvae.z_shapes[hps.level][0],)
    z_shapes = [rescale(z_shape) for z_shape in vqvae.z_shapes]

    model = SimplePrior(z_shapes=z_shapes, l_bins=vqvae.l_bins, level=hps.level,
                        downs_t=vqvae.downs_t, strides_t=vqvae.strides_t,
                        labels=hps.labels, prior_kwargs=prior_kwargs,
                        x_cond_kwargs=x_cond_kwargs, y_cond_kwargs=y_cond_kwargs,
                        prime_kwargs=prime_kwargs, copy_input=hps.copy_input,
                        labels_v3=hps.labels_v3, merged_decoder=hps.merged_decoder,
                        single_enc_dec=hps.single_enc_dec)
    model.alignment_head = hps.get("alignment_head", None)
    model.alignment_layer = hps.get("alignment_layer", None)

    seed_key = jax.random.key(hps.get("seed", 0) + hps.level + 1)
    # init on host CPU (reference builds priors on CPU, make_models.py:195);
    # billion-param init as eager ops on a tunneled device takes minutes
    with _host_device():
        params = _cached_init(model, seed_key, hps.get("seed", 0) + hps.level + 1)
    if hps.get("train", False):
        params = jax.device_put(params)
    runtime = PriorRuntime(model, params, vqvae)
    restore_model(runtime, hps.restore_prior, "prior")
    if hps.get("fp16_params", False) and not hps.get("train", False):
        # the TPU analogue of fp16 weight storage (make_models.py:174-177):
        # bf16 params halve HBM reads in the bandwidth-bound decode loop
        with _host_device():
            runtime.params = convert_params_bf16(runtime.params)
    if not hps.get("train", False):
        # sampling: priors start host-resident; the cascade moves one level
        # at a time onto the chip (reference builds priors on CPU,
        # make_models.py:195)
        runtime.to_host()
    return runtime


def convert_params_bf16(params):
    """Cast weights to bf16 for sampling, keeping LayerNorm params fp32."""
    from jax.tree_util import tree_map_with_path

    def cast(path, leaf):
        keys = [getattr(p, "key", getattr(p, "idx", None)) for p in path]
        if any(k in ("ln", "ln_0", "ln_1", "prime_state_ln") for k in keys):
            return leaf
        if leaf.dtype == jnp.float32:
            return leaf.astype(jnp.bfloat16)
        return leaf

    return tree_map_with_path(cast, params)


def save_outputs(model, device, hps):
    """Golden-output dump for cross-implementation parity checking
    (reference make_models.py:198-242): seeded random audio + fixed labels
    through encode/decode and every prior with get_preds=True."""
    import pickle

    if hps.get("labels_v3", False):
        n_ctx, n_tokens, prime_bins = 6144, 384, 79
    else:
        n_ctx, n_tokens, prime_bins = 8192, 512, 80

    rng = np.random.RandomState(0)
    x = (2 * rng.rand(1, n_ctx * 8 * 4 * 4, 1) - 1.0).astype(np.float32)
    lyric_tokens = rng.randint(0, prime_bins, (n_tokens,))
    artist_id, genre_ids = 10, [1]
    total_length, offset = 2 * 2646000, 2646000

    vqvae, priors = make_model(model, device, hps)
    vq_prior = priors[-1]
    zs = vq_prior.encode(jnp.asarray(x), start_level=0)
    x_ds = [vq_prior.decode(zs[level:], start_level=level)
            for level in range(len(zs))]
    data = dict(zs=[np.asarray(z) for z in zs],
                x_ds=[np.asarray(d) for d in x_ds])
    for level, prior in enumerate(priors):
        if hps.get("labels_v3", False) and level != len(priors) - 1:
            continue
        print(f"Doing level {level}")
        x_in = x[:, : n_ctx * 8 * (4 ** level)]
        y_in = prior.labeller.get_y_from_ids(artist_id, genre_ids, lyric_tokens,
                                             total_length, offset)[None]
        x_out, _, metrics = prior.forward(jnp.asarray(x_in), y=y_in,
                                          fp16=hps.get("fp16", False),
                                          get_preds=True, decode=True)
        data[level] = dict(x=x_in, y=y_in, x_out=np.asarray(x_out),
                           preds=np.asarray(metrics["preds"]))
    with open("data.jkb", "wb") as f:
        pickle.dump(data, f)
    print("Saved data")


def run(model, port=29500, **kwargs):
    """CLI: dump golden outputs for parity checking
    (reference make_models.py:245-254)."""
    hps = Hyperparams(**kwargs)
    save_outputs(model, None, hps)


def make_model(model, device, hps, levels=None):
    vqvae_name, *prior_names = MODELS[model]
    vqvae = make_vqvae(setup_hparams(
        vqvae_name, dict(sample_length=hps.get("sample_length", 0),
                         sample_length_in_seconds=hps.get("sample_length_in_seconds", 0))),
        device)
    hps.sample_length = vqvae.sample_length
    if levels is None:
        levels = range(len(prior_names))
    priors = [make_prior(setup_hparams(prior_names[level], dict()), vqvae, device)
              for level in levels]
    return vqvae, priors


if __name__ == "__main__":
    from jukebox_tpu.utils.cli import fire
    fire(run)
