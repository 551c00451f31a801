"""Parameter partition specs for tensor parallelism over the 'mp' mesh axis.

The reference has no tensor parallelism (its 5B was trained with GPipe,
removed from the release — SURVEY §2.3); on TPU the idiomatic equivalent is
Megatron-style sharding expressed as PartitionSpecs: attention/MLP input
projections split over their output features, output projections over their
input features. With params placed under these NamedShardings, pjit inserts
the all-reduces on ICI automatically.
"""

import jax
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P
from jax.tree_util import tree_map_with_path


# param-path fragments whose weights split over the feature axis
_COL_SPLIT = ("c_attn", "c_fc", "c_enc_kv")   # w: (in, out) -> P(None, 'mp')
_ROW_SPLIT = ("c_proj",)                      # w: (in, out) -> P('mp', None)


def _path_keys(path):
    return [str(getattr(p, "key", getattr(p, "idx", ""))) for p in path]


def prior_param_specs(params):
    """PartitionSpec pytree for a prior's params: transformer matmuls split
    over 'mp', everything else replicated."""

    def spec(path, leaf):
        keys = _path_keys(path)
        if any(k in _COL_SPLIT for k in keys):
            if keys[-1] == "w":
                return P(None, "mp")
            if keys[-1] == "b":
                return P("mp")
        if any(k in _ROW_SPLIT for k in keys):
            if keys[-1] == "w":
                return P("mp", None)
            return P()  # c_proj bias added after the all-reduce
        return P()

    return tree_map_with_path(spec, params)


def shard_params(mesh, params, specs=None):
    specs = specs if specs is not None else prior_param_specs(params)
    return jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), params, specs)


def fsdp_param_specs(params, dp_size, base_specs=None, min_size=1 << 14):
    """ZeRO-3-style fully-sharded parameter placement over the 'dp' axis
    (SURVEY §2.3 model-state parallelism; the reference's only recourse was
    fp16 params + CPU EMA). Each large leaf shards its biggest free axis
    over 'dp' (composing with any Megatron 'mp' split from base_specs);
    XLA/GSPMD then all-gathers weights where layers need them and keeps
    params + Adam moments resident at 1/dp per chip — which is what lets a
    5B-param train step fit a 16 GB-chip mesh. Leaves below min_size (LN
    gains, biases) stay on their base placement: sharding them would cost
    more collective latency than the bytes are worth."""
    if base_specs is None:
        base_specs = jax.tree_util.tree_map(lambda _: P(), params)

    def spec(path, leaf, base):
        dims = list(base) + [None] * (leaf.ndim - len(base))
        if leaf.size < min_size:
            return base
        free = [(d, i) for i, d in enumerate(leaf.shape)
                if dims[i] is None and d % dp_size == 0]
        if not free:
            return base
        _, ax = max(free)
        dims[ax] = "dp"
        return P(*dims)

    return jax.tree_util.tree_map_with_path(spec, params, base_specs)


def per_device_fraction(params, specs, dp_size, mp_size=1):
    """Per-device share of total parameter elements under `specs`:
    1/(dp*mp) when everything shards (perfect ZeRO-3 scaling), 1.0 when
    replicated. Works on jax.eval_shape trees (no materialisation)."""
    total = held = 0
    for leaf, s in zip(jax.tree_util.tree_leaves(params),
                       jax.tree_util.tree_leaves(specs, is_leaf=lambda x: isinstance(x, P))):
        n = int(np.prod(leaf.shape)) if leaf.shape else 1
        total += n
        div = 1
        for axis in s:
            if axis == "dp":
                div *= dp_size
            elif axis == "mp":
                div *= mp_size
        held += n // div
    return held / max(total, 1)


def decode_param_specs(dec_params):
    """PartitionSpec pytree for segment-shaped decode params (from
    Transformer.prepare_decode_params): same Megatron splits as
    prior_param_specs, but leaves inside scan segments carry a leading group
    axis, and int8-staged layers carry a per-out-channel scale 's' that
    follows its weight's out-feature sharding. With staged decode params
    placed under these shardings, the jitted sample_init/sample_segment run
    tensor-parallel: the KV caches inherit the n_state split from the
    column-split c_attn, so per-chip cache HBM also divides by mp."""

    def spec(path, leaf):
        keys = _path_keys(path)
        name = keys[-1]
        extra = (None,) * (leaf.ndim - 2)  # leading group axis, if any
        if any(k in _COL_SPLIT for k in keys):
            if name in ("w", "w_q"):
                return P(*extra, None, "mp")
            if name == "s":
                return P(*extra, None, "mp")
            if name == "b":
                return P(*(None,) * (leaf.ndim - 1), "mp")
        if any(k in _ROW_SPLIT for k in keys):
            if name in ("w", "w_q"):
                return P(*extra, "mp", None)
            return P()  # c_proj bias/scale applied after the all-reduce
        return P()

    return tree_map_with_path(spec, dec_params)
