"""Checkpoint I/O: torch -> JAX weight conversion plus native orbax save/load.

The converter maps the reference checkpoint naming (``Tone`` module tree,
tone/nn/model.py; HF ``ToneForCTC`` adds a ``tone.`` prefix,
tone/training/model_wrapper.py:134) onto the tone_tpu parameter pytree.

Weight-layout conventions (see tone_tpu/core/layers.py):
  * torch ``nn.Linear``  (out, in)         -> ours (in, out)       [transpose]
  * torch 1x1 ``Conv1d`` (out, in, 1)      -> ours (in, out)       [squeeze+T]
  * torch depthwise conv (out, in/g, k)    -> ours identical        [copy]
  * torch ``Conv2d``     (O, I, H, W)      -> ours identical        [copy]
  * LayerNorm weight/bias                  -> scale/bias
  * BatchNorm weight/bias                  -> params scale/bias;
    running_mean/var                       -> batch_stats mean/var
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Any, Mapping

import jax
import jax.numpy as jnp
import numpy as np

from tone_tpu.config import ToneConfig

Params = dict[str, Any]


# ---------------------------------------------------------------------------
# torch -> jax conversion.
# ---------------------------------------------------------------------------


def _t(x: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(x.T)


def _lin(sd: Mapping[str, np.ndarray], name: str, bias: bool = True) -> Params:
    p = {"w": _t(sd[f"{name}.weight"])}
    if bias and f"{name}.bias" in sd:
        p["b"] = sd[f"{name}.bias"]
    return p


def _pw_conv1d(sd: Mapping[str, np.ndarray], name: str) -> Params:
    """1x1 conv1d as a linear: (out, in, 1) -> (in, out)."""
    p = {"w": _t(sd[f"{name}.weight"][:, :, 0])}
    if f"{name}.bias" in sd:
        p["b"] = sd[f"{name}.bias"]
    return p


def _conv(sd: Mapping[str, np.ndarray], name: str) -> Params:
    p = {"w": sd[f"{name}.weight"]}
    if f"{name}.bias" in sd:
        p["b"] = sd[f"{name}.bias"]
    return p


def _ln(sd: Mapping[str, np.ndarray], name: str) -> Params:
    return {"scale": sd[f"{name}.weight"], "bias": sd[f"{name}.bias"]}


def _rms(sd: Mapping[str, np.ndarray], name: str) -> Params:
    return {"weight": sd[f"{name}.weight"]}


def _bn(sd: Mapping[str, np.ndarray], name: str) -> tuple[Params, Params]:
    params = {"scale": sd[f"{name}.weight"], "bias": sd[f"{name}.bias"]}
    stats = {"mean": sd[f"{name}.running_mean"], "var": sd[f"{name}.running_var"]}
    return params, stats


def convert_torch_state_dict(
    state_dict: Mapping[str, Any],
    config: ToneConfig | None = None,
) -> dict[str, Params]:
    """Convert a reference torch ``state_dict`` to tone_tpu variables.

    Accepts either a bare ``Tone`` state_dict or an HF ``ToneForCTC`` one
    (keys prefixed with ``tone.``).  Values may be torch tensors or numpy
    arrays.

    Returns:
        ``{"params": ..., "batch_stats": ...}`` with fp32 jnp arrays.
    """
    if config is None:
        config = ToneConfig()

    sd: dict[str, np.ndarray] = {}
    for k, v in state_dict.items():
        if k.startswith("tone."):
            k = k[len("tone."):]
        if hasattr(v, "detach"):  # torch tensor without importing torch
            v = v.detach().cpu().numpy()
        sd[k] = np.asarray(v, dtype=np.float32)

    bn1_p, bn1_s = _bn(sd, "encoder.pre_encode.conv.0.1")
    bn2_p, bn2_s = _bn(sd, "encoder.pre_encode.conv.1.1")
    pre_encode = {
        "pre_norm": _rms(sd, "encoder.pre_encode.pre_norm"),
        "conv1": _conv(sd, "encoder.pre_encode.conv.0.0"),
        "bn1": bn1_p,
        "conv2": _conv(sd, "encoder.pre_encode.conv.1.0"),
        "bn2": bn2_p,
        "out": _lin(sd, "encoder.pre_encode.out"),
        "out_norm": _rms(sd, "encoder.pre_encode.out_norm"),
    }

    layers = []
    layer_stats = []
    for i in range(config.encoder.n_layers):
        pfx = f"encoder.layers.{i}"
        att = {
            "linear_v": _lin(sd, f"{pfx}.self_attn.linear_v"),
            "linear_out": _lin(sd, f"{pfx}.self_attn.linear_out"),
        }
        if config.encoder.should_recompute_att_scores[i]:
            att["linear_q"] = _lin(sd, f"{pfx}.self_attn.linear_q")
            att["linear_k"] = _lin(sd, f"{pfx}.self_attn.linear_k")
            att["q_ln"] = _ln(sd, f"{pfx}.self_attn.q_ln")
            att["k_ln"] = _ln(sd, f"{pfx}.self_attn.k_ln")
        cbn_p, cbn_s = _bn(sd, f"{pfx}.conv.batch_norm")
        layers.append({
            "norm_ff1": _rms(sd, f"{pfx}.norm_feed_forward1"),
            "ff1": {
                "lin1": _lin(sd, f"{pfx}.feed_forward1.linear1"),
                "linv": _lin(sd, f"{pfx}.feed_forward1.linearv"),
                "lin2": _lin(sd, f"{pfx}.feed_forward1.linear2"),
            },
            "norm_att": _rms(sd, f"{pfx}.norm_self_att"),
            "att": att,
            "norm_conv": _rms(sd, f"{pfx}.norm_conv"),
            "conv": {
                "pw1": _pw_conv1d(sd, f"{pfx}.conv.pointwise_conv1"),
                "dw": _conv(sd, f"{pfx}.conv.depthwise_conv.conv"),
                "bn": cbn_p,
                "pw2": _pw_conv1d(sd, f"{pfx}.conv.pointwise_conv2"),
            },
            "norm_ff2": _rms(sd, f"{pfx}.norm_feed_forward2"),
            "ff2": {
                "lin1": _lin(sd, f"{pfx}.feed_forward2.linear1"),
                "linv": _lin(sd, f"{pfx}.feed_forward2.linearv"),
                "lin2": _lin(sd, f"{pfx}.feed_forward2.linear2"),
            },
            "norm_out": _rms(sd, f"{pfx}.norm_out"),
        })
        layer_stats.append({"conv_bn": cbn_s})

    reduction = {
        "dw": _conv(sd, "encoder.temportal_reduction.conv"),
        "pw": _pw_conv1d(sd, "encoder.temportal_reduction.conv_pw"),
    }
    head = _pw_conv1d(sd, "decoder.decoder_layers.0")

    variables = {
        "params": {
            "encoder": {
                "pre_encode": pre_encode,
                "layers": tuple(layers),
                "reduction": reduction,
            },
            "head": head,
        },
        "batch_stats": {
            "pre_encode": {"bn1": bn1_s, "bn2": bn2_s},
            "layers": tuple(layer_stats),
        },
    }
    return jax.tree.map(jnp.asarray, variables)


def load_torch_checkpoint(path: str | Path, config: ToneConfig | None = None) -> dict[str, Params]:
    """Load a reference checkpoint file (.safetensors, .bin/.pt) and convert."""
    path = Path(path)
    if path.suffix == ".safetensors":
        from safetensors.numpy import load_file

        sd = load_file(str(path))
    else:
        import torch

        sd = torch.load(str(path), map_location="cpu", weights_only=True)
    return convert_torch_state_dict(sd, config)


# ---------------------------------------------------------------------------
# Native checkpoint format (orbax; exceeds the reference, which has none).
# ---------------------------------------------------------------------------


def save_checkpoint(path: str | Path, variables: dict[str, Params],
                    config: ToneConfig | None = None) -> None:
    """Save variables (and config) with orbax to a directory."""
    import orbax.checkpoint as ocp

    path = Path(path).absolute()
    path.mkdir(parents=True, exist_ok=True)
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path / "variables", jax.tree.map(np.asarray, variables), force=True)
    if config is not None:
        (path / "config.json").write_text(json.dumps(config.to_dict(), indent=2))


def load_checkpoint(path: str | Path) -> tuple[dict[str, Params], ToneConfig | None]:
    """Load an orbax checkpoint directory saved by :func:`save_checkpoint`."""
    import orbax.checkpoint as ocp

    path = Path(path).absolute()
    config = None
    cfg_file = path / "config.json"
    if cfg_file.exists():
        config = ToneConfig.from_dict(json.loads(cfg_file.read_text()))
    with ocp.StandardCheckpointer() as ckptr:
        variables = ckptr.restore(path / "variables")
    # orbax restores dicts; re-tuple the per-layer lists for our pytree shape.
    def fix(tree):
        if isinstance(tree, dict) and set(tree) and all(k.isdigit() for k in tree):
            return tuple(fix(tree[k]) for k in sorted(tree, key=int))
        if isinstance(tree, dict):
            return {k: fix(v) for k, v in tree.items()}
        if isinstance(tree, (list, tuple)):
            return tuple(fix(v) for v in tree)
        return tree

    return fix(variables), config
