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


def _split_ff(ff: Mapping) -> Mapping:
    """Undo the serving-time GLU merge (acoustic.cast_params_for_inference):
    lin12 (D, 2F) -> lin1/linv, so inference-cast variables also export."""
    if "lin12" not in ff:
        return ff
    w = np.asarray(ff["lin12"]["w"], np.float32)
    b = np.asarray(ff["lin12"]["b"], np.float32)
    f = w.shape[1] // 2
    return {
        "lin1": {"w": w[:, :f], "b": b[:f]},
        "linv": {"w": w[:, f:], "b": b[f:]},
        "lin2": ff["lin2"],
    }


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
        ff1 = _split_ff(layer["ff1"])
        _put_lin(out, f"{pfx}.feed_forward1.linear1", ff1["lin1"])
        _put_lin(out, f"{pfx}.feed_forward1.linearv", ff1["linv"])
        _put_lin(out, f"{pfx}.feed_forward1.linear2", ff1["lin2"])
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
        ff2 = _split_ff(layer["ff2"])
        _put_lin(out, f"{pfx}.feed_forward2.linear1", ff2["lin1"])
        _put_lin(out, f"{pfx}.feed_forward2.linearv", ff2["linv"])
        _put_lin(out, f"{pfx}.feed_forward2.linear2", ff2["lin2"])
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


# ---------------------------------------------------------------------------
# Reference-config and .nemo archive interop.
# ---------------------------------------------------------------------------


def to_reference_config(config: ToneConfig | None = None) -> dict:
    """Our typed config as the reference's HF ``ToneConfig`` dict
    (tone/training/model_wrapper.py:27-121) — the shape stored in
    ``config.json`` / ``model_config.yaml`` artifacts."""
    config = config or ToneConfig()
    fe, enc = config.frontend, config.encoder
    return {
        "feature_extraction_params": {
            "sample_rate": fe.sample_rate,
            "window_size": fe.window_size,
            "window_stride": fe.window_stride,
            "n_fft": fe.n_fft,
            "n_mels": fe.n_mels,
            "preemphasis_coefficient": fe.preemphasis_coefficient,
        },
        "encoder_params": {
            "feat_in": enc.feat_in,
            "n_layers": enc.n_layers,
            "subsampling_conv_channels": list(enc.subsampling_conv_channels),
            "subsampling_kernel_size": [list(k) for k in enc.subsampling_kernel_size],
            "subsampling_strides": [list(s) for s in enc.subsampling_strides],
            "ff_expansion_factor": enc.ff_expansion_factor,
            "n_heads": enc.n_heads,
            "conv_kernel_size": enc.conv_kernel_size,
            "dropout": enc.dropout,
            "dropout_att": enc.dropout_att,
            "mhsa_stateless_layers": enc.mhsa_stateless_layers,
            "rope_dim": enc.rope_dim,
            "should_recompute_att_scores": list(enc.should_recompute_att_scores),
            "mhsa_state_size": enc.mhsa_state_size,
            "chunk_size": enc.chunk_size,
            "d_model": enc.d_model,
            "reduction_factor": enc.reduction_factor,
            "reduction_kernel_size": enc.reduction_kernel_size,
            "reduction_position": enc.reduction_position,
            "upsample_position": enc.upsample_position,
        },
        "decoder_params": {
            "feat_in": enc.d_model,
            "vocabulary": list(config.labels),
        },
        "pad_token_id": len(config.labels),
        "ctc_loss_reduction": "mean",
        "ctc_zero_infinity": True,
    }


def from_reference_config(ref: Mapping[str, Any]) -> ToneConfig:
    """Inverse of :func:`to_reference_config`."""
    import dataclasses

    from tone_tpu.config import EncoderConfig, FrontendConfig

    fe = dict(ref.get("feature_extraction_params") or {})
    enc = dict(ref.get("encoder_params") or {})
    fe.pop("log_zero_guard_value", None)
    frontend = FrontendConfig(**{k: v for k, v in fe.items()
                                 if k in {f.name for f in dataclasses.fields(FrontendConfig)}})
    enc_fields = {f.name for f in dataclasses.fields(EncoderConfig)}
    enc = {k: v for k, v in enc.items() if k in enc_fields}
    for key in ("subsampling_conv_channels", "should_recompute_att_scores"):
        if key in enc:
            enc[key] = tuple(enc[key])
    for key in ("subsampling_kernel_size", "subsampling_strides"):
        if key in enc:
            enc[key] = tuple(tuple(x) for x in enc[key])
    labels = "".join((ref.get("decoder_params") or {}).get("vocabulary") or []) or None
    kwargs = {"frontend": frontend, "encoder": EncoderConfig(**enc)}
    if labels:
        kwargs["labels"] = labels
    return ToneConfig(**kwargs)


_NEMO_PREFIX = "tone_for_ctc.tone."


def save_nemo_archive(path, variables, config: ToneConfig | None = None) -> None:
    """Write a ``.nemo`` archive (reference tone/scripts/export.py:528-549,
    tone/nemo_wrapper.py:15): a gzipped tar with ``./model_config.yaml``
    (the ``ToneCTCNemoModel`` cfg) and ``./model_weights.ckpt`` (torch-saved
    state_dict under the ``tone_for_ctc.tone.`` prefix) — restorable by
    NeMo's ``ModelPT.restore_from`` with the reference's wrapper class."""
    import io
    import tarfile
    import time

    import torch
    import yaml

    config = config or ToneConfig()
    cfg = {
        "tone_config": to_reference_config(config),
        "decoding": {"strategy": "greedy"},
        "target": "tone.nemo_wrapper.ToneCTCNemoModel",
    }
    config_bytes = yaml.safe_dump(cfg, sort_keys=False).encode()

    sd = to_torch_state_dict(variables, config, prefix=_NEMO_PREFIX)
    weights = io.BytesIO()
    torch.save({k: torch.from_numpy(np.ascontiguousarray(v))
                for k, v in sd.items()}, weights)

    def add(tar, name, data):
        info = tarfile.TarInfo(name)
        info.size = len(data)
        info.mtime = int(time.time())
        tar.addfile(info, io.BytesIO(data))

    with tarfile.open(str(path), "w:gz") as tar:
        add(tar, "./model_config.yaml", config_bytes)
        add(tar, "./model_weights.ckpt", weights.getvalue())


def load_nemo_archive(path) -> tuple[dict, ToneConfig]:
    """Load a ``.nemo`` archive into (variables, ToneConfig)."""
    import io
    import tarfile

    import torch
    import yaml

    from tone_tpu.checkpoint import convert_torch_state_dict

    with tarfile.open(str(path), "r:*") as tar:
        members = {m.name.lstrip("./"): m for m in tar.getmembers()}
        cfg_name = next(n for n in members if n.endswith("model_config.yaml"))
        wts_name = next(n for n in members if n.endswith("model_weights.ckpt"))
        cfg = yaml.safe_load(tar.extractfile(members[cfg_name]).read())
        raw = tar.extractfile(members[wts_name]).read()
    sd = torch.load(io.BytesIO(raw), map_location="cpu", weights_only=True)
    sd = {(k[len(_NEMO_PREFIX):] if k.startswith(_NEMO_PREFIX) else k): v
          for k, v in sd.items()}
    config = from_reference_config(cfg.get("tone_config") or {})
    return convert_torch_state_dict(sd, config), config
