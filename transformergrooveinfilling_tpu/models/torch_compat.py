"""Legacy ``.Model`` checkpoint interop.

The reference saves torch checkpoints ``{epoch, model_state_dict,
optimizer_state_dict, loss}`` named ``transformer_run_{run}_Epoch_{ep}.Model``
(SURVEY.md §5.4; verified by loading /root/reference/demo/
transformer_run_171tyqit_Epoch_1.Model). This module converts those state dicts
to/from the flax parameter tree of :mod:`.transformer`, so reference-trained
weights load bit-for-bit into the TPU model (golden parity test:
tests/test_torch_parity.py) and TPU-trained weights export back for reference
tooling.

torch is imported lazily — only these interop paths require it.
"""

from __future__ import annotations

import os
import re

import numpy as np

from .transformer import GrooveTransformerConfig


def _t(a) -> np.ndarray:
    # explicit copy: np.asarray on a torch-backed array shares storage, so a
    # later optimizer step would silently mutate the "converted" parameters
    return np.array(a, dtype=np.float32, copy=True)


def state_dict_to_params(state_dict, config: GrooveTransformerConfig) -> dict:
    """Convert a reference ``model_state_dict`` to a flax ``params`` tree.

    Key map (torch → flax):
      InputLayerEncoder.Linear            → input/embed           (kernel = Wᵀ)
      Encoder.Encoder.layers.{i}.self_attn.in_proj_*  → encoder_layer_{i}/self_attn/qkv
      ...self_attn.out_proj               → .../self_attn/out
      ...linear1, linear2                 → .../linear1, linear2
      ...norm1, norm2                     → .../norm1, norm2     (scale = weight)
      Encoder.Encoder.norm                → encoder_norm
      OutputLayer.Linear                  → output/proj
    The sinusoidal PE buffer is recomputed, not loaded.
    """
    sd = {k: _t(v) for k, v in state_dict.items()}
    params: dict = {}

    params["input"] = {
        "embed": {
            "kernel": sd["InputLayerEncoder.Linear.weight"].T,
            "bias": sd["InputLayerEncoder.Linear.bias"],
        }
    }

    layer_ids = sorted(
        {
            int(m.group(1))
            for k in sd
            if (m := re.match(r"Encoder\.Encoder\.layers\.(\d+)\.", k))
        }
    )
    assert len(layer_ids) == config.num_encoder_layers, (
        f"checkpoint has {len(layer_ids)} encoder layers, "
        f"config expects {config.num_encoder_layers}"
    )
    for i in layer_ids:
        p = f"Encoder.Encoder.layers.{i}."
        params[f"encoder_layer_{i}"] = {
            "self_attn": {
                # torch packs in_proj rows as [q; k; v]; transposing yields the
                # (d, 3d) kernel whose column blocks split back into q, k, v.
                "qkv": {
                    "kernel": sd[p + "self_attn.in_proj_weight"].T,
                    "bias": sd[p + "self_attn.in_proj_bias"],
                },
                "out": {
                    "kernel": sd[p + "self_attn.out_proj.weight"].T,
                    "bias": sd[p + "self_attn.out_proj.bias"],
                },
            },
            "linear1": {
                "kernel": sd[p + "linear1.weight"].T,
                "bias": sd[p + "linear1.bias"],
            },
            "linear2": {
                "kernel": sd[p + "linear2.weight"].T,
                "bias": sd[p + "linear2.bias"],
            },
            "norm1": {
                "scale": sd[p + "norm1.weight"],
                "bias": sd[p + "norm1.bias"],
            },
            "norm2": {
                "scale": sd[p + "norm2.weight"],
                "bias": sd[p + "norm2.bias"],
            },
        }

    params["encoder_norm"] = {
        "scale": sd["Encoder.Encoder.norm.weight"],
        "bias": sd["Encoder.Encoder.norm.bias"],
    }
    params["output"] = {
        "proj": {
            "kernel": sd["OutputLayer.Linear.weight"].T,
            "bias": sd["OutputLayer.Linear.bias"],
        }
    }

    if config.num_decoder_layers > 0:
        # encoder-decoder family (reference train.py:125-127): torch
        # TransformerDecoderLayer keys → decoder_layer_{i}. Cross-attention's
        # in_proj rows [q; k; v] split into the flax q (first d rows) and
        # packed kv (remaining 2d rows) projections.
        d = config.d_model
        params["input_tgt"] = {
            "embed": {
                "kernel": sd["InputLayerDecoder.Linear.weight"].T,
                "bias": sd["InputLayerDecoder.Linear.bias"],
            }
        }
        dec_ids = sorted(
            {
                int(m.group(1))
                for k in sd
                if (m := re.match(r"Decoder\.Decoder\.layers\.(\d+)\.", k))
            }
        )
        assert len(dec_ids) == config.num_decoder_layers, (
            f"checkpoint has {len(dec_ids)} decoder layers, "
            f"config expects {config.num_decoder_layers}"
        )
        for i in dec_ids:
            p = f"Decoder.Decoder.layers.{i}."
            in_proj_w = sd[p + "multihead_attn.in_proj_weight"]
            in_proj_b = sd[p + "multihead_attn.in_proj_bias"]
            params[f"decoder_layer_{i}"] = {
                "self_attn": {
                    "qkv": {
                        "kernel": sd[p + "self_attn.in_proj_weight"].T,
                        "bias": sd[p + "self_attn.in_proj_bias"],
                    },
                    "out": {
                        "kernel": sd[p + "self_attn.out_proj.weight"].T,
                        "bias": sd[p + "self_attn.out_proj.bias"],
                    },
                },
                "cross_attn": {
                    "q": {"kernel": in_proj_w[:d].T, "bias": in_proj_b[:d]},
                    "kv": {"kernel": in_proj_w[d:].T, "bias": in_proj_b[d:]},
                    "out": {
                        "kernel": sd[p + "multihead_attn.out_proj.weight"].T,
                        "bias": sd[p + "multihead_attn.out_proj.bias"],
                    },
                },
                "linear1": {
                    "kernel": sd[p + "linear1.weight"].T,
                    "bias": sd[p + "linear1.bias"],
                },
                "linear2": {
                    "kernel": sd[p + "linear2.weight"].T,
                    "bias": sd[p + "linear2.bias"],
                },
                "norm1": {
                    "scale": sd[p + "norm1.weight"],
                    "bias": sd[p + "norm1.bias"],
                },
                "norm2": {
                    "scale": sd[p + "norm2.weight"],
                    "bias": sd[p + "norm2.bias"],
                },
                "norm3": {
                    "scale": sd[p + "norm3.weight"],
                    "bias": sd[p + "norm3.bias"],
                },
            }
        params["decoder_norm"] = {
            "scale": sd["Decoder.Decoder.norm.weight"],
            "bias": sd["Decoder.Decoder.norm.bias"],
        }
    return params


def params_to_state_dict(params, config: GrooveTransformerConfig) -> dict:
    """Inverse of :func:`state_dict_to_params` (numpy arrays, reference names)."""
    from .transformer import sinusoidal_positional_encoding

    p = params
    sd = {
        "InputLayerEncoder.Linear.weight": _t(p["input"]["embed"]["kernel"]).T,
        "InputLayerEncoder.Linear.bias": _t(p["input"]["embed"]["bias"]),
        "InputLayerEncoder.PositionalEncoding.pe": np.asarray(
            sinusoidal_positional_encoding(config.max_len, config.d_model)
        ),
    }
    for i in range(config.num_encoder_layers):
        lp = p[f"encoder_layer_{i}"]
        pre = f"Encoder.Encoder.layers.{i}."
        sd[pre + "self_attn.in_proj_weight"] = _t(lp["self_attn"]["qkv"]["kernel"]).T
        sd[pre + "self_attn.in_proj_bias"] = _t(lp["self_attn"]["qkv"]["bias"])
        sd[pre + "self_attn.out_proj.weight"] = _t(lp["self_attn"]["out"]["kernel"]).T
        sd[pre + "self_attn.out_proj.bias"] = _t(lp["self_attn"]["out"]["bias"])
        sd[pre + "linear1.weight"] = _t(lp["linear1"]["kernel"]).T
        sd[pre + "linear1.bias"] = _t(lp["linear1"]["bias"])
        sd[pre + "linear2.weight"] = _t(lp["linear2"]["kernel"]).T
        sd[pre + "linear2.bias"] = _t(lp["linear2"]["bias"])
        sd[pre + "norm1.weight"] = _t(lp["norm1"]["scale"])
        sd[pre + "norm1.bias"] = _t(lp["norm1"]["bias"])
        sd[pre + "norm2.weight"] = _t(lp["norm2"]["scale"])
        sd[pre + "norm2.bias"] = _t(lp["norm2"]["bias"])
    sd["Encoder.Encoder.norm.weight"] = _t(p["encoder_norm"]["scale"])
    sd["Encoder.Encoder.norm.bias"] = _t(p["encoder_norm"]["bias"])
    sd["OutputLayer.Linear.weight"] = _t(p["output"]["proj"]["kernel"]).T
    sd["OutputLayer.Linear.bias"] = _t(p["output"]["proj"]["bias"])

    if config.num_decoder_layers > 0:
        sd["InputLayerDecoder.Linear.weight"] = _t(
            p["input_tgt"]["embed"]["kernel"]).T
        sd["InputLayerDecoder.Linear.bias"] = _t(p["input_tgt"]["embed"]["bias"])
        sd["InputLayerDecoder.PositionalEncoding.pe"] = np.asarray(
            sinusoidal_positional_encoding(config.max_len, config.d_model))
        for i in range(config.num_decoder_layers):
            lp = p[f"decoder_layer_{i}"]
            pre = f"Decoder.Decoder.layers.{i}."
            sd[pre + "self_attn.in_proj_weight"] = _t(
                lp["self_attn"]["qkv"]["kernel"]).T
            sd[pre + "self_attn.in_proj_bias"] = _t(lp["self_attn"]["qkv"]["bias"])
            sd[pre + "self_attn.out_proj.weight"] = _t(
                lp["self_attn"]["out"]["kernel"]).T
            sd[pre + "self_attn.out_proj.bias"] = _t(lp["self_attn"]["out"]["bias"])
            sd[pre + "multihead_attn.in_proj_weight"] = np.concatenate(
                [_t(lp["cross_attn"]["q"]["kernel"]).T,
                 _t(lp["cross_attn"]["kv"]["kernel"]).T], axis=0)
            sd[pre + "multihead_attn.in_proj_bias"] = np.concatenate(
                [_t(lp["cross_attn"]["q"]["bias"]),
                 _t(lp["cross_attn"]["kv"]["bias"])], axis=0)
            sd[pre + "multihead_attn.out_proj.weight"] = _t(
                lp["cross_attn"]["out"]["kernel"]).T
            sd[pre + "multihead_attn.out_proj.bias"] = _t(
                lp["cross_attn"]["out"]["bias"])
            sd[pre + "linear1.weight"] = _t(lp["linear1"]["kernel"]).T
            sd[pre + "linear1.bias"] = _t(lp["linear1"]["bias"])
            sd[pre + "linear2.weight"] = _t(lp["linear2"]["kernel"]).T
            sd[pre + "linear2.bias"] = _t(lp["linear2"]["bias"])
            for n in ("norm1", "norm2", "norm3"):
                sd[pre + n + ".weight"] = _t(lp[n]["scale"])
                sd[pre + n + ".bias"] = _t(lp[n]["bias"])
        sd["Decoder.Decoder.norm.weight"] = _t(p["decoder_norm"]["scale"])
        sd["Decoder.Decoder.norm.bias"] = _t(p["decoder_norm"]["bias"])
    return sd


def load_legacy_checkpoint(path: str, config: GrooveTransformerConfig):
    """Load a reference ``.Model`` file → ``(params, epoch, loss)``."""
    import torch

    ckpt = torch.load(path, map_location="cpu")
    params = state_dict_to_params(
        {k: v.numpy() for k, v in ckpt["model_state_dict"].items()}, config
    )
    return params, int(ckpt["epoch"]), float(ckpt["loss"])


def save_legacy_checkpoint(
    path: str, params, config: GrooveTransformerConfig, epoch: int, loss: float
):
    """Write a reference-format ``.Model`` checkpoint (torch.save dict)."""
    import torch

    sd = {k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in
          params_to_state_dict(params, config).items()}
    torch.save(
        {
            "epoch": epoch,
            "model_state_dict": sd,
            "optimizer_state_dict": {"param_groups": []},
            "loss": loss,
        },
        path,
    )


def find_latest_checkpoint(model_dir: str, file_pattern: str = "transformer_run_{}_Epoch_{}.Model"):
    """Locate the newest-epoch ``.Model`` in a directory.

    Mirrors the reference's local-restore contract (tutorial.py:36-68): the
    pattern has ``{run}`` and ``{epoch}`` holes; the highest epoch wins.
    """
    regex = re.compile(
        re.escape(file_pattern).replace(r"\{\}", "(.+?)", 1).replace(r"\{\}", r"(\d+)", 1)
        + "$"
    )
    best = None
    for fname in os.listdir(model_dir):
        m = regex.match(fname)
        if m:
            epoch = int(m.group(2))
            if best is None or epoch > best[0]:
                best = (epoch, os.path.join(model_dir, fname))
    if best is None:
        raise FileNotFoundError(f"no checkpoint matching {file_pattern!r} in {model_dir}")
    return best[1], best[0]
