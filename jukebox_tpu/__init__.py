"""jukebox_tpu: a TPU-native (JAX/XLA/Pallas) framework with the capability
set of openai/jukebox — hierarchical VQ-VAE audio codecs, autoregressive
sparse-transformer priors with artist/genre/timing/lyric conditioning, and a
windowed ancestral sampling cascade.

This is a ground-up functional re-design, not a port: parameter pytrees +
pure jitted apply functions, `jax.sharding` meshes instead of DDP/MPI,
static-shape ring KV caches instead of dynamic cache dicts.
"""

__version__ = "0.1.0"
