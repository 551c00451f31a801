"""Convert reference torch checkpoints (.pth.tar state_dicts) into
jukebox_tpu parameter pytrees.

Weight-layout mapping (reference module -> ours, feature-last):
  torch Conv1d      weight (out, in, k)  -> conv (k, in, out)   [transpose 2,1,0]
  torch ConvTransp. weight (in, out, k)  -> conv (k, in, out)   [transpose 2,0,1]
  reference Conv1D  w (n_in, n_out)      -> dense w             [as-is]
  torch Linear      weight (out, in)     -> dense w (in, out)   [transpose]
  torch LayerNorm   weight/bias          -> g/b                 [as-is]
  Embedding         weight               -> weight              [as-is]

Reference state_dict key shapes are documented at:
  VQ-VAE      jukebox/vqvae/{vqvae,encdec,resnet,bottleneck}.py
  priors      jukebox/prior/{prior,autoregressive,conditioners}.py
  transformer jukebox/transformer/{transformer,factored_attention}.py
"""

import numpy as np


def _t(x):
    return np.ascontiguousarray(np.asarray(x, dtype=np.float32))


def _conv(sd, key):
    return {"w": _t(sd[f"{key}.weight"]).transpose(2, 1, 0),
            "b": _t(sd[f"{key}.bias"])}


def _convT(sd, key):
    return {"w": _t(sd[f"{key}.weight"]).transpose(2, 0, 1),
            "b": _t(sd[f"{key}.bias"])}


def _dense(sd, key):
    return {"w": _t(sd[f"{key}.w"]), "b": _t(sd[f"{key}.b"])}


def _linear(sd, key):
    return {"w": _t(sd[f"{key}.weight"]).T}


def _ln(sd, key):
    return {"g": _t(sd[f"{key}.weight"]), "b": _t(sd[f"{key}.bias"])}


def _emb(sd, key):
    return {"weight": _t(sd[f"{key}.weight"])}


def _resnet(sd, key, n_depth):
    """Resnet1D: `{key}.model.{j}` (or `{key}.blocks.{j}` when trained with
    per-block checkpointing, resnet.py:61-67); each block is
    Sequential(ReLU, Conv1d(3), ReLU, Conv1d(1))."""
    prefix = f"{key}.model" if f"{key}.model.0.model.1.weight" in sd else f"{key}.blocks"
    blocks = []
    for j in range(n_depth):
        blocks.append({
            "conv_dil": _conv(sd, f"{prefix}.{j}.model.1"),
            "conv_1x1": _conv(sd, f"{prefix}.{j}.model.3"),
        })
    return {"blocks": blocks}


def _encoder_conv_block(sd, key, down_t, depth):
    """EncoderConvBlock: model.{i} = Sequential(Conv1d, Resnet1D) for
    i<down_t, then model.{down_t} = Conv1d (encdec.py:6-26)."""
    downs = []
    for i in range(down_t):
        downs.append({
            "conv_down": _conv(sd, f"{key}.model.{i}.0"),
            "resnet": _resnet(sd, f"{key}.model.{i}.1", depth),
        })
    proj = _conv(sd, f"{key}.model.{down_t}") if down_t > 0 else None
    return {"downs": downs, "proj": proj}


def _decoder_conv_block(sd, key, down_t, depth):
    """DecoderConvBock: model.0 = Conv1d, model.{1+i} =
    Sequential(Resnet1D, ConvTranspose1d) (encdec.py:28-46)."""
    if down_t == 0:
        return {"proj": None, "ups": []}
    proj = _conv(sd, f"{key}.model.0")
    ups = []
    for i in range(down_t):
        ups.append({
            "resnet": _resnet(sd, f"{key}.model.{1 + i}.0", depth),
            "conv_up": _convT(sd, f"{key}.model.{1 + i}.1"),
        })
    return {"proj": proj, "ups": ups}


def convert_vqvae_state_dict(sd, model):
    """model: jukebox_tpu.models.vqvae.VQVAE. Returns (params, state)."""
    params = {"encoders": [], "decoders": []}
    for level in range(model.levels):
        depth = model._block_cfg(level).depth
        enc_blocks = []
        for l in range(level + 1):
            enc_blocks.append(_encoder_conv_block(
                sd, f"encoders.{level}.level_blocks.{l}", model.downs_t[l], depth))
        params["encoders"].append({"level_blocks": enc_blocks})

        dec_blocks = []
        for l in range(level + 1):
            dec_blocks.append(_decoder_conv_block(
                sd, f"decoders.{level}.level_blocks.{l}", model.downs_t[l], depth))
        params["decoders"].append({
            "level_blocks": dec_blocks,
            "out": _conv(sd, f"decoders.{level}.out"),
        })

    blocks = []
    for level in range(model.levels):
        k = _t(sd[f"bottleneck.level_blocks.{level}.k"])
        blocks.append(model.bottleneck.block.restore_state(k))
    state = {"level_blocks": blocks}
    return params, state


def _transformer(sd, key, cfg):
    """cfg: jukebox_tpu.models.transformer.Transformer."""
    blocks = []
    for d in range(cfg.n_depth):
        bk = f"{key}._attn_mods.{d}"
        attn_func = cfg.attn_func(d)
        attn = {"c_attn": _dense(sd, f"{bk}.attn.c_attn"),
                "c_proj": _dense(sd, f"{bk}.attn.c_proj")}
        if attn_func == 6:
            attn["c_enc_kv"] = _dense(sd, f"{bk}.attn.c_enc_kv")
        blocks.append({
            "attn": attn,
            "ln_0": _ln(sd, f"{bk}.ln_0"),
            "mlp": {"c_fc": _dense(sd, f"{bk}.mlp.c_fc"),
                    "c_proj": _dense(sd, f"{bk}.mlp.c_proj")},
            "ln_1": _ln(sd, f"{bk}.ln_1"),
        })
    return {"blocks": blocks}


def _autoregressive(sd, key, cfg):
    """cfg: ConditionalAutoregressive2D."""
    prefix = f"{key}." if key else ""
    params = {
        "x_emb": _emb(sd, f"{prefix}x_emb"),
        "pos_emb": {"pos_emb": _t(sd[f"{prefix}pos_emb.pos_emb"])},
        "transformer": _transformer(sd, f"{prefix}transformer", cfg.transformer),
    }
    if not cfg.y_cond:
        params["start_token"] = _t(sd[f"{prefix}start_token"])
    if not cfg.only_encode and not cfg.share_x_emb_x_out:
        params["x_out"] = _linear(sd, f"{prefix}x_out")
    return params


def convert_prior_state_dict(sd, model):
    """model: jukebox_tpu.models.prior.SimplePrior. Returns params."""
    params = {"prior": _autoregressive(sd, "prior", model.prior)}
    if model.x_cond:
        cb = model.conditioner_block
        params["conditioner_blocks"] = [{
            "x_emb": _emb(sd, "conditioner_blocks.0.x_emb"),
            "cond": _decoder_conv_block(sd, "conditioner_blocks.0.cond",
                                        cb.down_t, cb.block.depth),
            "ln": _ln(sd, "conditioner_blocks.0.ln"),
        }]
    if model.y_cond:
        y = {"bow_genre_emb": {"emb": _emb(sd, "y_emb.bow_genre_emb.emb")},
             "artist_emb": {"emb": _emb(sd, "y_emb.artist_emb.emb")}}
        if model.y_emb.include_time_signal:
            for name in ("total_length_emb", "absolute_pos_emb", "relative_pos_emb"):
                y[name] = {"emb": _emb(sd, f"y_emb.{name}.emb")}
        params["y_emb"] = y
    if model.prime_prior is not None:
        params["prime_prior"] = _autoregressive(sd, "prime_prior", model.prime_prior)
        params["prime_state_proj"] = _dense(sd, "prime_state_proj")
        params["prime_state_ln"] = _ln(sd, "prime_state_ln")
        params["prime_x_out"] = _linear(sd, "prime_x_out")
    return params


def convert_checkpoint(path, kind, model):
    """Load a reference .pth.tar and convert. kind: 'vqvae'|'prior'|'opt'."""
    import torch
    ckpt = torch.load(path, map_location="cpu")
    sd = ckpt.get("model", ckpt)
    sd = {(k[7:] if k.startswith("module.") else k): v.numpy() if hasattr(v, "numpy") else v
          for k, v in sd.items()}
    out = {"step": ckpt.get("step", 0), "hps": ckpt.get("hps", {})}
    if kind == "vqvae":
        params, state = convert_vqvae_state_dict(sd, model.model
                                                 if hasattr(model, "model") else model)
        out.update(params=params, state=state)
    elif kind == "prior":
        out.update(params=convert_prior_state_dict(
            sd, model.model if hasattr(model, "model") else model), state=None)
    else:
        out.update(opt=None)
    return out
