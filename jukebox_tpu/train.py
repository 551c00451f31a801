"""Training entry point — TPU equivalent of jukebox/train.py.

One jitted SPMD train step per model kind (VQ-VAE or prior): forward, grads,
global-norm clipping folded into the gradient divisor, the reference's Adam
update semantics, all under a `jax.sharding` mesh with the batch sharded on
the data axis. The codebook EMA state threads through the step as an explicit
pytree; its cross-device reductions are inserted by XLA (replacing DDP +
manual collectives, reference train.py:203-292).
"""

import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from jukebox_tpu.hparams import setup_hparams
from jukebox_tpu.models.make_models import (make_prior, make_vqvae,
                                            restore_opt, save_model_checkpoint)
from jukebox_tpu.parallel.dist import make_mesh, replicate, shard_batch
from jukebox_tpu.utils.audio_utils import audio_preprocess
from jukebox_tpu.utils.cli import fire
from jukebox_tpu.utils.logger import init_logging
from jukebox_tpu.utils.profiler import StepTimer
from jukebox_tpu.utils.train_utils import (LossScalar, adam_init, adam_update,
                                           clipped_grad_scale, get_ema,
                                           global_grad_norm, make_lr_schedule)


def _tree_where(ok, a, b):
    return jax.tree_util.tree_map(lambda x, y: jnp.where(ok, x, y), a, b)


def _apply_update(params, grads, opt_state, hps, lr_fn, it, loss_scale):
    """Shared tail of both train steps: the reference's scaled-gradient Adam
    with clipping folded into the divisor and the all-ranks overflow/spike
    step skip (train.py:236-243, fp16.py:39-65). `loss_scale` is the dynamic
    loss scale the gradients already carry (1.0 when scaling is off)."""
    gn_scaled = global_grad_norm(grads)
    gn = gn_scaled / loss_scale
    scale = clipped_grad_scale(gn, hps.clip, scale=loss_scale)
    lr = lr_fn(it)
    new_params, new_opt = adam_update(params, grads, opt_state, lr,
                                      hps.beta1, hps.beta2, hps.eps,
                                      hps.weight_decay, scale)
    ok = jnp.isfinite(gn_scaled)
    if hps.ignore_grad_norm > 0:
        ok = ok & (gn <= hps.ignore_grad_norm)
    new_params = _tree_where(ok, new_params, params)
    new_opt = _tree_where(ok, new_opt, opt_state)
    return new_params, new_opt, gn, lr, ok


def make_vqvae_train_step(runtime, hps, lr_fn):
    model = runtime.model

    def step(params, opt_state, vq_state, x, rng, it, loss_scale=1.0):
        def loss_fn(params):
            _, loss, metrics, new_state = model.forward(
                params, vq_state, x, hps, loss_fn=hps.loss_fn, train=True, rng=rng)
            return loss * loss_scale, (loss, metrics, new_state)

        (_, (loss, metrics, new_state)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        new_params, new_opt, gn, lr, ok = _apply_update(
            params, grads, opt_state, hps, lr_fn, it, loss_scale)
        metrics = dict(metrics, gn=gn, lr=lr, step_ok=ok)
        return new_params, new_opt, new_state, loss, metrics

    return jax.jit(step, donate_argnums=(0, 1, 2))


def make_prior_train_step(runtime, hps, lr_fn):
    prior = runtime.model
    vq_model = runtime.vqvae.model
    vq_params = runtime.vqvae.params
    vq_state = runtime.vqvae.state

    def step(params, opt_state, _, batch, rng, it, loss_scale=1.0):
        x, y = batch

        def loss_fn(params):
            zs = vq_model.encode(jax.lax.stop_gradient(vq_params), vq_state,
                                 x, start_level=prior.level)
            z, z_conds = zs[0], zs[1:]
            loss, metrics = prior.z_forward(params, z, z_conds=z_conds, y=y,
                                            fp16=hps.fp16, dropout_rng=rng)
            return loss * loss_scale, (loss, metrics)

        (_, (loss, metrics)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        new_params, new_opt, gn, lr, ok = _apply_update(
            params, grads, opt_state, hps, lr_fn, it, loss_scale)
        metrics = dict(metrics, gn=gn, lr=lr, step_ok=ok)
        return new_params, new_opt, None, loss, metrics

    return jax.jit(step, donate_argnums=(0, 1))


def log_aud(logger, tag, x, hps):
    logger.add_audios(tag, np.asarray(x), hps.sr, max_len=hps.max_len,
                      max_log=hps.max_log)
    logger.flush()


def log_labels(logger, labeller, tag, y, hps):
    y = np.asarray(y)
    txt = ""
    for item in range(y.shape[0]):
        d = labeller.describe_label(y[item])
        txt += f"{item} artist:{d['artist']}, genre:{d['genre']}, lyrics:{d['lyrics']}\n"
    logger.add_text(tag, txt)
    logger.flush()


def log_inputs(runtime, logger, x_in, y, x_out, hps, tag="train"):
    print(f"Logging {tag} inputs/outputs")
    log_aud(logger, f"{tag}_x_in", x_in, hps)
    if x_out is not None:
        log_aud(logger, f"{tag}_x_out", x_out, hps)
    if hps.prior and hps.labels and y is not None:
        log_labels(logger, runtime.labeller, f"{tag}_y_in", y, hps)
    logger.flush()


def sample_prior(runtime, ema, logger, x_in, y, hps):
    """Periodic in-training sampling at temp 1.0 (train.py:118-151)."""
    params_backup = None
    if ema is not None:
        runtime.params, params_backup = ema.swap(runtime.params)
    try:
        x_in = x_in[: hps.bs_sample]
        bs = x_in.shape[0]
        if not hps.labels:
            y = None
        elif y is not None:
            y = y[: hps.bs_sample]
        zs = runtime.encode(x_in, start_level=runtime.level, bs_chunks=bs)
        z_conds = zs[1:] if len(zs) > 1 else None
        z = runtime.sample(bs, z_conds=z_conds, y=y, fp16=False, temp=1.0)
        x_sample = runtime.decode([z] + (list(z_conds) if z_conds else []),
                                  bs_chunks=bs)
        log_aud(logger, "sample_x_T1", x_sample, hps)
        if hps.labels and y is not None:
            log_labels(logger, runtime.labeller, "sample_x_T1", y, hps)
    finally:
        if params_backup is not None:
            runtime.params = params_backup
    logger.flush()


def evaluate(step_fns, runtime, logger, metrics, data_processor, hps, mesh):
    """Eval epoch (train.py:153-201) — forward only."""
    if hps.prior:
        _print_keys = dict(l="loss", bpd="bpd")
    else:
        _print_keys = dict(l="loss", rl="recons_loss", sl="spectral_loss")
    eval_fn = step_fns["eval"]
    _metrics = {}
    for i, batch in logger.get_range(data_processor.test_loader):
        x, y = batch if isinstance(batch, tuple) else (batch, None)
        x = audio_preprocess(x, hps)
        loss, _metrics = eval_fn(runtime.params, x, y)
        _metrics = {k: float(v) for k, v in _metrics.items()}
        _metrics["loss"] = float(loss)
        for key, val in _metrics.items():
            _metrics[key] = metrics.update(f"test_{key}", val, x.shape[0])
        logger.set_postfix(**{pk: _metrics[k] for pk, k in _print_keys.items()
                              if k in _metrics})
    for key in _metrics:
        logger.add_scalar(f"test_{key}", metrics.avg(f"test_{key}"))
    logger.close_range()
    return {key: metrics.avg(f"test_{key}") for key in _metrics}


def make_eval_step(runtime, hps):
    if hps.prior:
        prior = runtime.model
        vq_model = runtime.vqvae.model
        vq_params, vq_state = runtime.vqvae.params, runtime.vqvae.state

        def eval_fn(params, x, y):
            zs = vq_model.encode(vq_params, vq_state, x, start_level=prior.level)
            loss, metrics = prior.z_forward(params, zs[0], z_conds=zs[1:], y=y,
                                            fp16=hps.fp16)
            return loss, metrics
    else:
        model = runtime.model

        def eval_fn(params, x, y):
            _, loss, metrics, _ = model.forward(params, runtime.state, x, hps,
                                                loss_fn=hps.loss_fn, train=False)
            return loss, metrics
    return jax.jit(eval_fn)


def train(step_fns, runtime, opt_state, ema, logger, metrics, data_processor,
          hps, mesh, rng, scalar=None):
    if hps.prior:
        _print_keys = dict(l="loss", bpd="bpd", gn="gn", g_l="gen_loss",
                           p_l="prime_loss")
    else:
        _print_keys = dict(l="loss", sl="spectral_loss", rl="recons_loss",
                           e="entropy", u="usage", uc="used_curr", gn="gn",
                           pn="pn", dk="dk")
    train_step = step_fns["train"]
    timer = StepTimer(skip_first=1)
    tracing = False
    # machine-readable loss-curve artifact (JUKEBOX_TRAIN_JSONL=path appends
    # one line per log_steps with the running-averaged metrics + wall time)
    jsonl = os.environ.get("JUKEBOX_TRAIN_JSONL")
    t_start = time.time()
    t_last = t_start

    for i, batch in logger.get_range(data_processor.train_loader):
        x, y = batch if isinstance(batch, tuple) else (batch, None)
        rng, r_aug, r_step = jax.random.split(rng, 3)
        x_in = x = audio_preprocess(x, hps, rng=r_aug)
        x = shard_batch(mesh, x)
        if y is not None:
            y = shard_batch(mesh, jnp.asarray(np.asarray(y)))
        log_input_output = (logger.iters % hps.save_iters == 0)

        # jax.profiler trace of a few steady-state steps (SURVEY §5)
        if hps.debug_speed and logger.iters == 2 and not tracing:
            jax.profiler.start_trace(f"{logger.logdir}/trace")
            tracing = True
        if tracing and logger.iters >= 2 + min(8, hps.debug_iters):
            jax.profiler.stop_trace()
            tracing = False
            print(f"Saved profiler trace to {logger.logdir}/trace")

        logger.step()
        vq_state = runtime.state if not hps.prior else None
        batch_in = (x, y) if hps.prior else x
        loss_scale = jnp.asarray(scalar.get_scale() if scalar else 1.0,
                                 jnp.float32)
        with timer:
            runtime.params, opt_state, new_state, loss, _metrics = train_step(
                runtime.params, opt_state, vq_state, batch_in, r_step,
                jnp.asarray(logger.iters, jnp.int32), loss_scale)
            loss = jax.block_until_ready(loss)
        if new_state is not None:
            runtime.state = new_state
        if ema is not None:
            ema.step(runtime.params)

        _metrics = {k: float(v) for k, v in _metrics.items()}
        _metrics["loss"] = float(loss)
        if scalar is not None:
            # dynamic loss scaling: halve on overflow, grow per window
            # (reference fp16.py:50-65 + LossScalar)
            scalar.update_scale(not bool(_metrics.pop("step_ok")))
            _metrics["lg_loss_scale"] = float(np.log2(scalar.get_scale()))
        else:
            _metrics.pop("step_ok", None)
        for key, val in _metrics.items():
            avg = metrics.update(key, val, int(x.shape[0]))
            _metrics[key] = avg
            if logger.iters % hps.log_steps == 0:
                logger.add_scalar(key, avg)
        if jsonl and logger.iters % hps.log_steps == 0:
            now = time.time()
            rec = dict(it=logger.iters,
                       wall_s=round(now - t_start, 2),
                       window_s=round(now - t_last, 2),
                       **{k: round(float(v), 6) for k, v in _metrics.items()})
            t_last = now
            try:
                with open(jsonl, "a") as f:
                    f.write(json.dumps(rec) + "\n")
            except OSError:
                pass

        # Checkpoint (train.py:266-274)
        if hps.save and logger.iters % hps.save_iters == 1:
            params_backup = None
            if ema is not None:
                runtime.params, params_backup = ema.swap(runtime.params)
            name = "latest" if hps.prior else f"step_{logger.iters}"
            if jax.process_index() == 0:
                save_model_checkpoint(logger.logdir, name, runtime, opt_state,
                                      logger.iters, hps)
            if params_backup is not None:
                runtime.params = params_backup

        # Periodic sampling (train.py:276-280)
        if hps.prior and logger.iters % 12000 == 1:
            sample_prior(runtime, ema, logger, x_in, y, hps)

        if log_input_output:
            log_inputs(runtime, logger, x_in, y, None, hps)

        logger.set_postfix(**{pk: _metrics[k] for pk, k in _print_keys.items()
                              if k in _metrics})
        if hps.max_steps and logger.iters >= hps.max_steps:
            break
    if tracing:
        jax.profiler.stop_trace()
    logger.close_range()
    print(f"Step timing: {timer.summary()}")
    return {key: metrics.avg(key) for key in metrics.sum}, opt_state


def run(hps="teeny", port=29500, **kwargs):
    from jukebox_tpu.data.data_processor import DataProcessor
    from jukebox_tpu.models.make_models import enable_warm_start
    from jukebox_tpu.parallel.dist import setup_dist

    # hang diagnosis: `kill -USR1 <pid>` dumps every thread's stack to
    # stderr WITHOUT killing the run — unregistered, SIGUSR1's default
    # action terminated a 17-minute-compile train run (r5)
    try:
        import faulthandler
        import signal as _signal
        faulthandler.register(_signal.SIGUSR1, all_threads=True)
    except Exception:  # noqa: BLE001 — best-effort (pytest capture, win)
        pass

    enable_warm_start()  # persistent compile + init caches across runs
    rank, world = setup_dist()
    hps = setup_hparams(hps, kwargs)
    hps.ngpus = len(jax.devices())
    hps.argv = " ".join(sys.argv)
    hps.bs_sample = hps.nworkers = hps.bs

    mesh = make_mesh(hps.mesh_dp, hps.mesh_mp)

    data_processor = DataProcessor(hps)

    vqvae = make_vqvae(hps)
    if hps.prior:
        prior = make_prior(hps, vqvae)
        runtime = prior
    else:
        runtime = vqvae

    lr_fn = make_lr_schedule(hps)
    opt_state = adam_init(runtime.params, fp16_state=hps.fp16_opt)
    restore_path = hps.restore_prior if hps.prior else hps.restore_vqvae
    opt_state, _ = restore_opt(opt_state, restore_path)
    ema = get_ema(runtime.params, hps)
    # dynamic loss scaling for true-fp16 numerics-parity runs (fp16.py:68-99);
    # the TPU default (bf16 compute, fp32 grads) runs with scale 1.0
    scalar = LossScalar(hps.fp16_loss_scale,
                        scale_factor=2.0 ** (1.0 / hps.fp16_scale_window)) \
        if hps.fp16 else None

    if hps.prior and (hps.mesh_mp > 1 or hps.fsdp):
        # tensor-parallel placement over 'mp' and/or fully-sharded (ZeRO-3)
        # placement over 'dp'; XLA inserts the gathers/reduce-scatters
        from jukebox_tpu.parallel.shardings import (fsdp_param_specs,
                                                    prior_param_specs,
                                                    shard_params)
        specs = prior_param_specs(runtime.params) if hps.mesh_mp > 1 else None
        if hps.fsdp:
            specs = fsdp_param_specs(runtime.params, mesh.shape["dp"],
                                     base_specs=specs)
        runtime.params = shard_params(mesh, runtime.params, specs)
        # moments follow the param placement; per-tensor scale factors
        # (fp16_opt) and the step counter replicate
        opt_state = {k: (shard_params(mesh, v, specs) if k in ("m", "v")
                         else replicate(mesh, v))
                     for k, v in opt_state.items()}
    else:
        runtime.params = replicate(mesh, runtime.params)
        opt_state = replicate(mesh, opt_state)
    if hasattr(runtime, "state"):
        runtime.state = replicate(mesh, runtime.state)

    if hps.prior:
        step_fns = {"train": make_prior_train_step(runtime, hps, lr_fn)}
    else:
        step_fns = {"train": make_vqvae_train_step(runtime, hps, lr_fn)}
    step_fns["eval"] = make_eval_step(runtime, hps)

    logger, metrics = init_logging(hps, rank, rank)
    logger.iters = runtime.step

    rng = jax.random.key(hps.get("seed", 0))
    for epoch in range(max(0, hps.curr_epoch), hps.epochs):
        metrics.reset()
        data_processor.set_epoch(epoch)
        if hps.train:
            train_metrics, opt_state = train(step_fns, runtime, opt_state, ema,
                                             logger, metrics, data_processor,
                                             hps, mesh,
                                             jax.random.fold_in(rng, epoch),
                                             scalar=scalar)
            train_metrics["epoch"] = epoch
            if rank == 0:
                print("Train", " ".join(f"{k}: {v:0.4f}"
                                        for k, v in train_metrics.items()))
        if hps.test:
            params_backup = None
            if ema is not None:
                runtime.params, params_backup = ema.swap(runtime.params)
            test_metrics = evaluate(step_fns, runtime, logger, metrics,
                                    data_processor, hps, mesh)
            test_metrics["epoch"] = epoch
            if rank == 0:
                print("Ema", " ".join(f"{k}: {v:0.4f}"
                                      for k, v in test_metrics.items()))
            if params_backup is not None:
                runtime.params = params_backup
        if hps.max_steps and logger.iters >= hps.max_steps:
            break


if __name__ == "__main__":
    fire(run)
