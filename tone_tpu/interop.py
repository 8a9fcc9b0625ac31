"""Interoperability with the reference torch ecosystem.

The reverse of ``tone_tpu.checkpoint.convert_torch_state_dict``: export a
tone_tpu variables pytree as a torch-style state_dict using the reference's
module naming (``Tone``; optionally prefixed ``tone.`` for HF ``ToneForCTC``).
A model fine-tuned on TPU can then be loaded by the reference code and pushed
through its ONNX/TensorRT/NeMo export paths — the capability the reference's
``nemo_wrapper``/``export`` scripts provide, met at the artifact boundary.

Round-trip is exact: convert_torch_state_dict(to_torch_state_dict(v)) == v.
"""

from __future__ import annotations

from typing import Any, Mapping

import numpy as np

from tone_tpu.config import ToneConfig


def _t(x) -> np.ndarray:
    return np.ascontiguousarray(np.asarray(x).T)


def _put_lin(out: dict, name: str, p: Mapping) -> None:
    out[f"{name}.weight"] = _t(p["w"])
    if "b" in p:
        out[f"{name}.bias"] = np.asarray(p["b"])


def _put_pw_conv1d(out: dict, name: str, p: Mapping) -> None:
    out[f"{name}.weight"] = _t(p["w"])[:, :, None]
    if "b" in p:
        out[f"{name}.bias"] = np.asarray(p["b"])


def _put_conv(out: dict, name: str, p: Mapping) -> None:
    out[f"{name}.weight"] = np.asarray(p["w"])
    if "b" in p:
        out[f"{name}.bias"] = np.asarray(p["b"])


def _put_ln(out: dict, name: str, p: Mapping) -> None:
    out[f"{name}.weight"] = np.asarray(p["scale"])
    out[f"{name}.bias"] = np.asarray(p["bias"])


def _put_rms(out: dict, name: str, p: Mapping) -> None:
    out[f"{name}.weight"] = np.asarray(p["weight"])


def _put_bn(out: dict, name: str, p: Mapping, stats: Mapping) -> None:
    out[f"{name}.weight"] = np.asarray(p["scale"])
    out[f"{name}.bias"] = np.asarray(p["bias"])
    out[f"{name}.running_mean"] = np.asarray(stats["mean"])
    out[f"{name}.running_var"] = np.asarray(stats["var"])
    out[f"{name}.num_batches_tracked"] = np.asarray(0, dtype=np.int64)


def to_torch_state_dict(
    variables: Mapping[str, Any],
    config: ToneConfig | None = None,
    prefix: str = "",
) -> dict[str, np.ndarray]:
    """Export variables as a reference-named state_dict of numpy arrays.

    Args:
        prefix: "" for a bare ``Tone`` state_dict, "tone." for ``ToneForCTC``.
    """
    if config is None:
        config = ToneConfig()
    params = variables["params"]
    stats = variables["batch_stats"]
    enc = params["encoder"]
    out: dict[str, np.ndarray] = {}

    pre = enc["pre_encode"]
    _put_rms(out, "encoder.pre_encode.pre_norm", pre["pre_norm"])
    _put_conv(out, "encoder.pre_encode.conv.0.0", pre["conv1"])
    _put_bn(out, "encoder.pre_encode.conv.0.1", pre["bn1"], stats["pre_encode"]["bn1"])
    _put_conv(out, "encoder.pre_encode.conv.1.0", pre["conv2"])
    _put_bn(out, "encoder.pre_encode.conv.1.1", pre["bn2"], stats["pre_encode"]["bn2"])
    _put_lin(out, "encoder.pre_encode.out", pre["out"])
    _put_rms(out, "encoder.pre_encode.out_norm", pre["out_norm"])

    for i, (layer, lstats) in enumerate(zip(enc["layers"], stats["layers"])):
        pfx = f"encoder.layers.{i}"
        _put_rms(out, f"{pfx}.norm_feed_forward1", layer["norm_ff1"])
        _put_lin(out, f"{pfx}.feed_forward1.linear1", layer["ff1"]["lin1"])
        _put_lin(out, f"{pfx}.feed_forward1.linearv", layer["ff1"]["linv"])
        _put_lin(out, f"{pfx}.feed_forward1.linear2", layer["ff1"]["lin2"])
        _put_rms(out, f"{pfx}.norm_self_att", layer["norm_att"])
        att = layer["att"]
        _put_lin(out, f"{pfx}.self_attn.linear_v", att["linear_v"])
        _put_lin(out, f"{pfx}.self_attn.linear_out", att["linear_out"])
        if "linear_q" in att:
            _put_lin(out, f"{pfx}.self_attn.linear_q", att["linear_q"])
            _put_lin(out, f"{pfx}.self_attn.linear_k", att["linear_k"])
            _put_ln(out, f"{pfx}.self_attn.q_ln", att["q_ln"])
            _put_ln(out, f"{pfx}.self_attn.k_ln", att["k_ln"])
        _put_rms(out, f"{pfx}.norm_conv", layer["norm_conv"])
        _put_pw_conv1d(out, f"{pfx}.conv.pointwise_conv1", layer["conv"]["pw1"])
        _put_conv(out, f"{pfx}.conv.depthwise_conv.conv", layer["conv"]["dw"])
        _put_bn(out, f"{pfx}.conv.batch_norm", layer["conv"]["bn"], lstats["conv_bn"])
        _put_pw_conv1d(out, f"{pfx}.conv.pointwise_conv2", layer["conv"]["pw2"])
        _put_rms(out, f"{pfx}.norm_feed_forward2", layer["norm_ff2"])
        _put_lin(out, f"{pfx}.feed_forward2.linear1", layer["ff2"]["lin1"])
        _put_lin(out, f"{pfx}.feed_forward2.linearv", layer["ff2"]["linv"])
        _put_lin(out, f"{pfx}.feed_forward2.linear2", layer["ff2"]["lin2"])
        _put_rms(out, f"{pfx}.norm_out", layer["norm_out"])

    _put_conv(out, "encoder.temportal_reduction.conv", enc["reduction"]["dw"])
    _put_pw_conv1d(out, "encoder.temportal_reduction.conv_pw", enc["reduction"]["pw"])
    _put_pw_conv1d(out, "decoder.decoder_layers.0", params["head"])

    if prefix:
        out = {prefix + k: v for k, v in out.items()}
    return out


def save_torch_checkpoint(path, variables, config: ToneConfig | None = None,
                          prefix: str = "") -> None:
    """Write the state_dict as .safetensors (readable by the reference with
    ``load_file`` + ``load_state_dict``)."""
    from safetensors.numpy import save_file

    sd = to_torch_state_dict(variables, config, prefix)
    save_file({k: np.ascontiguousarray(v) for k, v in sd.items()}, str(path))
