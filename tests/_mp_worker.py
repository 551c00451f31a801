"""Multi-process training worker, launched by tests/test_multiprocess.py.

Runs the REAL train-step machinery (make_vqvae + make_vqvae_train_step —
including the codebook-EMA collectives inside the forward) over the global
mesh assembled from every process's devices, on this process's slice of a
deterministic global batch. Writes losses + a parameter digest for the
parent to compare across world sizes (the TPU equivalent of proving the
reference's mpiexec DDP path, jukebox/utils/dist_utils.py:59-101).

Usage: python _mp_worker.py <pid> <nproc> <outdir>
Env (set by the parent): JAX_COORDINATOR_ADDRESS, JAX_NUM_PROCESSES,
JAX_PROCESS_ID, XLA_FLAGS (local virtual device count), JAX_PLATFORMS=cpu.
"""

import os
import sys

import jax

# the image's sitecustomize imports jax and pins the axon backend; override
# to local CPU before any backend client is created
jax.config.update("jax_platforms", "cpu")


def main():
    pid, nproc, outdir = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]

    import jax.numpy as jnp
    import numpy as np

    from jukebox_tpu.hparams import setup_hparams
    from jukebox_tpu.models.make_models import make_vqvae
    from jukebox_tpu.parallel.dist import (make_mesh, replicate, setup_dist,
                                           shard_batch)
    from jukebox_tpu.train import make_vqvae_train_step
    from jukebox_tpu.utils.train_utils import adam_init, make_lr_schedule

    rank, world = setup_dist()
    assert (rank, world) == (pid, nproc), (rank, world, pid, nproc)

    hps = setup_hparams("teeny", dict(
        sample_length=512, sr=8000, levels=2, downs_t=(2, 1), strides_t=(2, 2),
        emb_width=16, l_bins=32, l_mu=0.99, commit=0.02, width=8, depth=2,
        m_conv=1.0, dilation_growth_rate=1, loss_fn="l2", lr=1e-3, train=True))
    hps.bandwidth = {"l1": 1.0, "l2": 1.0, "spec": 1.0}
    vqvae = make_vqvae(hps)
    step = make_vqvae_train_step(vqvae, hps, make_lr_schedule(hps))
    opt = adam_init(vqvae.params)

    mesh = make_mesh()  # all processes' devices on the dp axis
    params = replicate(mesh, vqvae.params)
    opt = replicate(mesh, opt)
    state = replicate(mesh, vqvae.state)

    # deterministic global batch; this process owns a contiguous slice (the
    # same device layout a single process over the same mesh would see)
    global_bs = 8
    assert global_bs % nproc == 0
    gx = np.random.RandomState(0).uniform(
        -1, 1, (global_bs, 512, 1)).astype(np.float32)
    per = global_bs // nproc
    local = gx[pid * per:(pid + 1) * per]

    losses, gns = [], []
    for i in range(3):
        x = shard_batch(mesh, local)
        params, opt, state, loss, metrics = step(
            params, opt, state, x, jax.random.key(i), jnp.asarray(i + 1))
        losses.append(float(loss))
        gns.append(float(metrics["gn"]))

    leaves = jax.tree_util.tree_leaves(params)
    digest = np.array([np.asarray(l, np.float64).sum() for l in leaves])
    st_leaves = jax.tree_util.tree_leaves(state)
    st_digest = np.array([np.asarray(l, np.float64).sum() for l in st_leaves])
    np.savez(os.path.join(outdir, f"proc{pid}_of_{nproc}.npz"),
             losses=np.array(losses), gns=np.array(gns), digest=digest,
             state_digest=st_digest, n_devices=len(jax.devices()))
    print(f"worker {pid}/{nproc} done: losses={losses}", flush=True)


if __name__ == "__main__":
    main()
