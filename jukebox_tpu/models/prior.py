"""Per-level prior over VQ codes, conditioned on timing/artist/genre/lyrics
and codes from the level above — TPU equivalent of jukebox/prior/prior.py.

Two lyric-conditioning modes, matching the reference:
  * single_enc_dec: merge the lyric and VQ vocabularies and sequences into
    one autoregressive stream (prior.py:81-101, prior_preprocess :168-185).
  * separate enc-dec: an autoregressive lyric encoder whose final activations
    are projected to encoder K/V that the music decoder cross-attends
    (prior.py:104-124, get_encoder_kv :285-301).

This class is a stateless module: all arrays live in the params pytree, and
every compute path (z_forward, sample) is a pure function suitable for jit.
Host-side label bookkeeping (get_y / get_z_conds) operates on numpy.
"""

import numpy as np

import jax
import jax.numpy as jnp

from jukebox_tpu.data.labels import EmptyLabeller, Labeller
from jukebox_tpu.models.autoregressive import (ConditionalAutoregressive2D,
                                               cross_entropy_bpd)
from jukebox_tpu.models.conditioners import Conditioner, LabelConditioner
from jukebox_tpu.models.encdec import BlockCfg
from jukebox_tpu.models.vqvae import calculate_strides
from jukebox_tpu.ops.core import dense, dense_init, layer_norm, layer_norm_init


class SimplePrior:
    def __init__(self, z_shapes, l_bins, level, downs_t, strides_t, labels,
                 prior_kwargs, x_cond_kwargs, y_cond_kwargs, prime_kwargs,
                 copy_input=False, labels_v3=False, merged_decoder=False,
                 single_enc_dec=False):
        # Architecture fingerprint for cross-instance jit sharing
        # (make_models.PriorRuntime): two priors with equal keys trace
        # identical sampling/forward graphs, so the second reuses the
        # first's compiled callables (params are explicit arguments). The
        # two upsampler levels of a cascade differ only in `level` and
        # `z_shapes` — both enter the TRACE only through the conditioner's
        # window shape (z_shapes[level+1], asserted in Conditioner.apply)
        # and, for top (time-signal) priors, through n_time's absolute
        # position ranges — so exactly those derived values are keyed.
        _is_top = level == len(z_shapes) - 1
        self.jit_key = repr((
            type(self).__name__, l_bins, bool(labels), labels_v3, copy_input,
            merged_decoder, single_enc_dec,
            sorted(prior_kwargs.items()),
            None if _is_top else (sorted(x_cond_kwargs.items()),
                                  tuple(z_shapes[level + 1]),
                                  downs_t[level + 1], strides_t[level + 1]),
            (sorted(y_cond_kwargs.items()),
             z_shapes[level][0] if _is_top else None) if labels else None,
            sorted(prime_kwargs.items()),
        ))
        prime_kwargs = dict(prime_kwargs)
        prior_kwargs = dict(prior_kwargs)
        self.use_tokens = prime_kwargs.pop("use_tokens")
        self.n_tokens = prime_kwargs.pop("n_tokens")
        self.prime_loss_fraction = prime_kwargs.pop("prime_loss_fraction")

        self.copy_input = copy_input
        if self.copy_input:
            prime_kwargs["bins"] = l_bins

        self.z_shapes = z_shapes
        self.levels = len(z_shapes)
        self.z_shape = z_shapes[level]
        self.level = level
        assert level < self.levels
        self.l_bins = l_bins

        self.x_cond = level != (self.levels - 1)
        self.cond_level = level + 1
        self.y_cond = labels
        self.single_enc_dec = single_enc_dec
        self.merged_decoder = merged_decoder

        prior_kwargs = dict(prior_kwargs)

        # X conditioning: upsampling convs over the level above
        if self.x_cond:
            xk = dict(x_cond_kwargs)
            self.conditioner_block = Conditioner(
                input_shape=z_shapes[self.cond_level],
                bins=l_bins,
                down_t=downs_t[self.cond_level],
                stride_t=strides_t[self.cond_level],
                out_width=xk.pop("out_width"),
                init_scale=xk.pop("init_scale"),
                block=BlockCfg(**xk),
            )
        else:
            self.conditioner_block = None

        # Y conditioning: labels -> start token + timing pos emb
        if self.y_cond:
            self.n_time = self.z_shape[0]
            self.y_emb = LabelConditioner(n_time=self.n_time,
                                          include_time_signal=not self.x_cond,
                                          **y_cond_kwargs)
        else:
            self.y_emb = None

        if single_enc_dec:
            # one merged stream: [shifted lyric tokens, vq tokens]
            self.prior_shapes = [(self.n_tokens,), prior_kwargs.pop("input_shape")]
            self.prior_bins = [prime_kwargs["bins"], prior_kwargs.pop("bins")]
            self.prior_dims = [int(np.prod(shape)) for shape in self.prior_shapes]
            self.prior_bins_shift = np.cumsum([0, *self.prior_bins])[:-1]
            self.prior_width = prior_kwargs["width"]
            self.prime_loss_dims, self.gen_loss_dims = self.prior_dims
            self.total_loss_dims = self.prime_loss_dims + self.gen_loss_dims
            self.prior = ConditionalAutoregressive2D(
                input_shape=(sum(self.prior_dims),), bins=sum(self.prior_bins),
                x_cond=(self.x_cond or self.y_cond), y_cond=True,
                prime_len=self.prime_loss_dims, **prior_kwargs)
            self.prime_prior = None
        else:
            if self.n_tokens != 0 and self.use_tokens:
                self.prime_loss_dims = self.n_tokens
                self.prime_acts_width = prime_kwargs["width"]
                self.prime_state_width = prior_kwargs["width"]
                self.prime_bins = prime_kwargs["bins"]
                self.prime_init_scale = prime_kwargs["init_scale"]
                self.prior_init_scale = prior_kwargs["init_scale"]
                self.prime_prior = ConditionalAutoregressive2D(
                    input_shape=(self.n_tokens,), x_cond=False, y_cond=False,
                    only_encode=True, **prime_kwargs)
            else:
                self.prime_loss_dims = 0
                self.prime_prior = None
            self.gen_loss_dims = int(np.prod(self.z_shape))
            self.total_loss_dims = self.prime_loss_dims + self.gen_loss_dims
            self.prior = ConditionalAutoregressive2D(
                x_cond=(self.x_cond or self.y_cond), y_cond=self.y_cond,
                encoder_dims=self.prime_loss_dims, merged_decoder=merged_decoder,
                **prior_kwargs)

        self.n_ctx = self.gen_loss_dims
        self.downsamples = calculate_strides(strides_t, downs_t)
        self.cond_downsample = (self.downsamples[level + 1]
                                if level != self.levels - 1 else None)
        self.raw_to_tokens = int(np.prod(self.downsamples[: level + 1]))
        self.sample_length = self.n_ctx * self.raw_to_tokens

        if labels:
            self.labels_v3 = labels_v3
            self.labeller = Labeller(self.y_emb.max_bow_genre_size, self.n_tokens,
                                     self.sample_length, v3=labels_v3)
        else:
            self.labeller = EmptyLabeller()

        self.alignment_layer = None
        self.alignment_head = None

    # -- params ---------------------------------------------------------------

    def init(self, rng):
        r_prior, r_cond, r_y, r_pp, r_proj, r_out = jax.random.split(rng, 6)
        params = {"prior": self.prior.init(r_prior)}
        if self.x_cond:
            params["conditioner_blocks"] = [self.conditioner_block.init(r_cond)]
        if self.y_cond:
            params["y_emb"] = self.y_emb.init(r_y)
        if self.prime_prior is not None:
            params["prime_prior"] = self.prime_prior.init(r_pp)
            params["prime_state_proj"] = dense_init(
                r_proj, self.prime_acts_width, self.prime_state_width,
                self.prime_init_scale)
            params["prime_state_ln"] = layer_norm_init(self.prime_state_width)
            params["prime_x_out"] = {"w": 0.02 * self.prior_init_scale *
                jax.random.normal(r_out, (self.prime_state_width, self.prime_bins),
                                  dtype=jnp.float32)}
        return params

    # -- host-side label / window math (prior.py:140-166) ---------------------

    def get_y(self, labels, start, get_indices=False):
        if isinstance(self.labeller, EmptyLabeller):
            return (None, None) if get_indices else None
        y = np.array(labels["y"], dtype=np.int64, copy=True)
        y[:, 2] = int(self.sample_length)
        y[:, 1:2] = y[:, 1:2] + int(start * self.raw_to_tokens)
        indices = self.labeller.set_y_lyric_tokens(y, labels)
        return (y, indices) if get_indices else y

    def get_z_conds(self, zs, start, end):
        if self.level != self.levels - 1:
            assert start % self.cond_downsample == end % self.cond_downsample == 0
            z_cond = zs[self.level + 1][:, start // self.cond_downsample:
                                        end // self.cond_downsample]
            assert z_cond.shape[1] == self.n_ctx // self.cond_downsample
            return [z_cond]
        return None

    # -- merged-stream token shifting (prior.py:168-203) ----------------------

    def prior_preprocess(self, xs, conds):
        N = xs[0].shape[0]
        out_x = []
        for i, x in enumerate(xs):
            bins_shift = int(self.prior_bins_shift[i])
            out_x.append((x + bins_shift).reshape(N, -1))
        out_c = []
        for i, cond in enumerate(conds):
            dims = self.prior_dims[i]
            if cond is None:
                cond = jnp.zeros((N, dims, self.prior_width), dtype=jnp.float32)
            out_c.append(cond)
        return jnp.concatenate(out_x, axis=1), jnp.concatenate(out_c, axis=1)

    def prior_postprocess(self, z):
        N = z.shape[0]
        dims = (self.prior_dims[0], z.shape[1] - self.prior_dims[0])
        xs = [z[:, :dims[0]], z[:, dims[0]:]]
        for i in range(len(xs)):
            shape = self.prior_shapes[i]
            bins_shift = int(self.prior_bins_shift[i])
            xs[i] = (xs[i] - bins_shift).reshape(N, -1, *shape[1:])
            # model may generate lyric tokens shifted below 0 (prior.py:200)
            xs[i] = jnp.clip(xs[i], 0, None)
        return xs[-1]

    # -- conditioning ----------------------------------------------------------

    def x_emb(self, params, z_conds):
        z_conds = z_conds[: self.cond_level - self.level]
        assert len(z_conds) == 1
        return self.conditioner_block.apply(params["conditioner_blocks"][0],
                                            z_conds[0])

    def get_cond(self, params, z_conds, y):
        """Split y into labels|lyrics; build x_cond / y_cond (prior.py:234-243)."""
        if y is not None:
            n_labels = y.shape[1] - self.n_tokens
            y_labels, prime = y[:, :n_labels], y[:, n_labels:]
        else:
            y_labels, prime = None, None
        if self.y_cond:
            y_cond, y_pos = self.y_emb.apply(params["y_emb"], y_labels)
        else:
            y_cond, y_pos = None, None
        x_cond = self.x_emb(params, z_conds) if self.x_cond else y_pos
        return x_cond, y_cond, prime

    # -- lyric encoder (sep enc-dec; prior.py:285-310) ------------------------

    def get_encoder_kv(self, params, prime, fp16=False, dropout_rng=None):
        if self.n_tokens != 0 and self.use_tokens:
            prime_acts = self.prime_prior.forward(params["prime_prior"], prime,
                                                  fp16=fp16,
                                                  dropout_rng=dropout_rng)
            encoder_kv = layer_norm(params["prime_state_ln"],
                                    dense(params["prime_state_proj"], prime_acts))
            if fp16:
                encoder_kv = encoder_kv.astype(jnp.bfloat16)
            return encoder_kv
        return None

    def get_prime_loss(self, params, encoder_kv, prime_t):
        if self.use_tokens:
            encoder_kv = encoder_kv.astype(jnp.float32)
            logits = jnp.dot(encoder_kv, params["prime_x_out"]["w"],
                             precision=jax.lax.Precision.HIGHEST)
            return cross_entropy_bpd(logits, prime_t)
        return jnp.zeros(())

    # -- training forward (prior.py:312-344) ----------------------------------

    def z_forward(self, params, z, z_conds=(), y=None, fp16=False,
                  get_preds=False, get_attn_weights=frozenset(),
                  dropout_rng=None):
        assert isinstance(get_attn_weights, (bool, set, frozenset))
        record_layers = (frozenset(get_attn_weights)
                         if not isinstance(get_attn_weights, bool) else frozenset())
        if dropout_rng is not None:
            dropout_rng, r_prime = jax.random.split(dropout_rng)
        else:
            r_prime = None
        x_cond, y_cond, prime = self.get_cond(params, z_conds, y)
        if self.copy_input:
            prime = z[:, : self.n_tokens]
        ws = []
        if self.single_enc_dec:
            z_all, x_cond_all = self.prior_preprocess([prime, z], [None, x_cond])
            out = self.prior.forward(params["prior"], z_all, x_cond=x_cond_all,
                                     y_cond=y_cond, fp16=fp16, get_sep_loss=True,
                                     get_preds=get_preds,
                                     record_layers=record_layers,
                                     dropout_rng=dropout_rng)
            if record_layers:
                (prime_loss, gen_loss), preds, ws = out
            else:
                (prime_loss, gen_loss), preds = out
        else:
            encoder_kv = self.get_encoder_kv(params, prime, fp16=fp16,
                                             dropout_rng=r_prime)
            prime_loss = self.get_prime_loss(params, encoder_kv, prime) \
                if prime is not None else jnp.zeros(())
            out = self.prior.forward(params["prior"], z, x_cond=x_cond,
                                     y_cond=y_cond, encoder_kv=encoder_kv,
                                     fp16=fp16, get_preds=get_preds,
                                     record_layers=record_layers,
                                     dropout_rng=dropout_rng)
            if record_layers:
                gen_loss, preds, ws = out
            else:
                gen_loss, preds = out
        loss = (self.prime_loss_fraction * prime_loss * self.prime_loss_dims
                / self.total_loss_dims) \
            + (gen_loss * self.gen_loss_dims / self.total_loss_dims)
        metrics = dict(bpd=jax.lax.stop_gradient(gen_loss),
                       prime_loss=jax.lax.stop_gradient(prime_loss),
                       gen_loss=jax.lax.stop_gradient(gen_loss))
        if get_preds:
            metrics["preds"] = jax.lax.stop_gradient(preds)
        if record_layers:
            return ws
        return loss, metrics

    # -- segmented sampling ----------------------------------------------------
    # Device-call-size-bounded sampling: sample_init builds conditioning +
    # caches + context prefill in one jitted call; sample_segment decodes a
    # fixed-size token segment (one compiled graph reused across the window
    # and across windows). fold_in(rng, absolute position) keeps the token
    # stream identical to the monolithic sample().

    def encoder_kv_from_y(self, params, y, fp16=False):
        """The lyric-encoder forward alone (sep enc-dec): lets the caller
        run the prime encoder in its OWN jit before the decode ring caches
        are allocated, so its weights (0.7 GB fp16 at 5b) never share the
        HBM peak with the rings. TPU equivalent of the reference's
        per-window prime_prior.cuda() -> forward -> .cpu() swap
        (prior.py:285-301). params needs only the prime subtrees
        (prime_prior / prime_state_proj / prime_state_ln)."""
        prime = y[:, y.shape[1] - self.n_tokens:]
        return self.get_encoder_kv(params, prime, fp16=fp16)

    def sample_init(self, params, n_samples, z=None, z_conds=None, y=None,
                    fp16=False, chunk_size=None, dec_params=None,
                    prefill_mb=None, cond_bs1=False, encoder_kv=None):
        """Returns (caches, x_tok, x_cond, y_cond, encoder_kv). The caller
        derives the start position from the context shapes (prefix_len).
        dec_params: pre-staged segment-shaped transformer params — when
        given, params may omit prior.transformer entirely (zero-copy
        staging for billion-param decode). prefill_mb: sample-axis prefill
        microbatch (see ConditionalAutoregressive2D.prefill).
        cond_bs1 (static, host-decided): every sample shares identical
        labels, so the returned x_cond collapses to batch 1 and broadcasts
        at each decode step — the full [N, n_ctx, width] conditioning
        buffer (1.2 GB for the 5b top at bs=16 bf16) is the largest decode
        -segment argument and its XLA layout copy was the bs=16 OOM."""
        no_past_context = z is None or z.shape[1] == 0
        x_cond, y_cond, prime = self.get_cond(params, z_conds, y)
        if self.single_enc_dec:
            encoder_kv = None
            xs = [prime] if no_past_context else [prime, z]
            z_in, x_cond = self.prior_preprocess(xs, [None, x_cond])
            prefill_tokens = z_in
        else:
            # encoder_kv may be precomputed by encoder_kv_from_y in its own
            # jit (prime-swap staging) — then params can omit the prime
            # encoder entirely and its weights are already off-device here
            if prime is not None and encoder_kv is None:
                encoder_kv = self.get_encoder_kv(params, prime, fp16=fp16)
            prefill_tokens = None if no_past_context else z
        prior = self.prior
        if fp16:
            # cast conditioning BEFORE the prefill: the decode loop reads
            # x_cond every token and computes in bf16, and the fp32 resident
            # copy (0.8-1.5 GiB at 1b serving batches) both doubles its HBM
            # footprint and capped hop-window batch size
            if x_cond is not None:
                x_cond = x_cond.astype(jnp.bfloat16)
            if encoder_kv is not None:
                encoder_kv = encoder_kv.astype(jnp.bfloat16)
        if cond_bs1 and x_cond is not None and x_cond.shape[0] > 1:
            # identical labels across the batch: keep one row (XLA DCEs the
            # rest); prefill + _emb_at broadcast it over the sample axis
            x_cond = x_cond[:1]
        caches = prior.init_decode_caches(params["prior"], n_samples,
                                          fp16=fp16, encoder_kv=encoder_kv,
                                          dec_params=dec_params)
        px_cond = x_cond if prior.x_cond else None
        if prefill_tokens is not None and prefill_tokens.shape[1] > 0:
            caches, x_tok = prior.prefill(
                params["prior"], caches, prefill_tokens.astype(jnp.int32),
                x_cond=px_cond, y_cond=y_cond, encoder_kv=encoder_kv,
                fp16=fp16, chunk_size=chunk_size, dec_params=dec_params,
                prefill_mb=prefill_mb)
        else:
            x_tok = jnp.zeros((n_samples, 1), jnp.int32)
        if (fp16 and dec_params is not None
                and prior.transformer.has_packed_segments(dec_params)):
            # prefill -> decode boundary: convert packed segments' caches
            # to the megakernel's slot-leading layout (once per window)
            caches = prior.transformer.pack_segment_caches(dec_params,
                                                           caches)
        return caches, x_tok, x_cond, y_cond, encoder_kv

    def sample_prefix_len(self, z=None):
        """Host-side start position matching sample_init's prefill."""
        z_len = 0 if z is None else z.shape[1]
        if self.single_enc_dec:
            return self.n_tokens + z_len
        return z_len

    def sample_segment(self, params, caches, x_tok, t0, n_steps, rng,
                       x_cond=None, y_cond=None, encoder_kv=None, fp16=False,
                       temp=1.0, top_k=0, top_p=0.0, dec_params=None):
        prior = self.prior
        px_cond = x_cond if prior.x_cond else None
        return prior.sample_segment(params["prior"], caches, x_tok, t0,
                                    n_steps, rng, x_cond=px_cond,
                                    y_cond=y_cond, encoder_kv=encoder_kv,
                                    fp16=fp16, temp=temp, top_k=top_k,
                                    top_p=top_p, dec_params=dec_params)

    def sample_finish(self, toks, z=None):
        """Assemble the final window tokens from the context + decoded
        segments, mirroring the monolithic sample()'s return contract."""
        if self.single_enc_dec:
            # decoded tokens live in the merged vocab; shift the unshifted z
            # context up like prior_preprocess did, and prepend a lyric-prefix
            # placeholder (prior_postprocess drops the first prime_loss_dims
            # tokens, so their values are irrelevant)
            parts = [] if z is None or z.shape[1] == 0 else \
                [(z + int(self.prior_bins_shift[1])).astype(toks.dtype)]
            pad = jnp.zeros((toks.shape[0], self.prime_loss_dims), toks.dtype)
            full = jnp.concatenate([pad, *parts, toks], axis=1)
            return self.prior_postprocess(full)
        parts = [] if z is None or z.shape[1] == 0 else [z.astype(toks.dtype)]
        return jnp.concatenate([*parts, toks], axis=1)

    # -- sampling (prior.py:245-283) ------------------------------------------

    def sample(self, params, n_samples, rng, z=None, z_conds=None, y=None,
               fp16=False, temp=1.0, top_k=0, top_p=0.0, chunk_size=None,
               sample_tokens=None):
        no_past_context = z is None or z.shape[1] == 0
        x_cond, y_cond, prime = self.get_cond(params, z_conds, y)
        if self.single_enc_dec:
            if no_past_context:
                z_in, x_cond = self.prior_preprocess([prime], [None, x_cond])
            else:
                z_in, x_cond = self.prior_preprocess([prime, z], [None, x_cond])
            st = sample_tokens + self.n_tokens if sample_tokens is not None else None
            z_out = self.prior.primed_sample(params["prior"], n_samples,
                                             z_in.astype(jnp.int32), rng,
                                             x_cond=x_cond, y_cond=y_cond,
                                             fp16=fp16, temp=temp, top_k=top_k,
                                             top_p=top_p, chunk_size=chunk_size,
                                             sample_tokens=st)
            z_out = self.prior_postprocess(z_out)
        else:
            encoder_kv = self.get_encoder_kv(params, prime, fp16=fp16) \
                if prime is not None else None
            if no_past_context:
                z_out = self.prior.sample(params["prior"], n_samples, rng,
                                          x_cond=x_cond, y_cond=y_cond,
                                          encoder_kv=encoder_kv, fp16=fp16,
                                          temp=temp, top_k=top_k, top_p=top_p,
                                          sample_tokens=sample_tokens)
            else:
                z_out = self.prior.primed_sample(params["prior"], n_samples,
                                                 z.astype(jnp.int32), rng,
                                                 x_cond=x_cond, y_cond=y_cond,
                                                 encoder_kv=encoder_kv, fp16=fp16,
                                                 temp=temp, top_k=top_k,
                                                 top_p=top_p, chunk_size=chunk_size,
                                                 sample_tokens=sample_tokens)
        if sample_tokens is None:
            assert z_out.shape == (n_samples, *self.z_shape), \
                f"Expected {(n_samples, *self.z_shape)}, got {z_out.shape}"
        return z_out
