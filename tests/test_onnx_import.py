"""ONNX acoustic-artifact importer tests.

The reference's deployed artifact is ``model.onnx`` (reference
tone/onnx_wrapper.py:60-77).  These tests export the actual reference torch
``Tone`` (tiny config) with torch.onnx.export — the same machinery the
reference's tone/scripts/export.py:460-525 uses — then import the weights
from the ONNX graph and assert forward parity, proving the deployed artifact
loads into tone_tpu without a torch checkpoint.
"""

import numpy as np
import pytest

from _reference_compat import install_reference

if not install_reference():
    pytest.skip("torch reference not available", allow_module_level=True)

import torch  # noqa: E402

import jax.numpy as jnp  # noqa: E402

from tone_tpu.config import EncoderConfig, ToneConfig  # noqa: E402
from tone_tpu.onnx_import import (  # noqa: E402
    load_onnx_checkpoint,
    load_onnx_state_dict,
    parse_onnx_graph,
)

_N_LAYERS = 4
_D_MODEL = 64
_SCORES = (True, False, True, True)



pytestmark = pytest.mark.slow  # full-model jit compiles dominate

def _tiny_cfg() -> ToneConfig:
    enc = EncoderConfig(
        n_layers=_N_LAYERS, d_model=_D_MODEL, n_heads=4, rope_dim=16,
        ff_expansion_factor=2, conv_kernel_size=15,
        subsampling_conv_channels=(8, 16),
        mhsa_stateless_layers=_N_LAYERS - 1,
        reduction_position=1, upsample_position=2,
        should_recompute_att_scores=_SCORES,
        dropout=0.0, dropout_att=0.0,
    )
    return ToneConfig(encoder=enc, compute_dtype="float32")


def _tiny_ref_model():
    from tone.training.model_wrapper import ToneConfig as RefConfig, ToneForCTC

    ref_cfg = RefConfig()
    enc = dict(ref_cfg.encoder_params)
    enc.update(
        n_layers=_N_LAYERS, d_model=_D_MODEL, n_heads=4, rope_dim=16,
        ff_expansion_factor=2, conv_kernel_size=15,
        subsampling_conv_channels=[8, 16],
        mhsa_stateless_layers=_N_LAYERS - 1,
        reduction_position=1, upsample_position=2,
        should_recompute_att_scores=list(_SCORES),
        dropout=0.0, dropout_att=0.0,
    )
    dec = dict(ref_cfg.decoder_params)
    dec["feat_in"] = _D_MODEL
    torch.manual_seed(0)
    model = ToneForCTC(RefConfig(encoder_params=enc, decoder_params=dec)).eval()
    # Non-trivial BN stats so conv+BN fusion in the export is actually
    # exercised (fresh BNs are identity and would hide fusion bugs).
    with torch.no_grad():
        for m in model.modules():
            if isinstance(m, (torch.nn.BatchNorm1d, torch.nn.BatchNorm2d)):
                m.running_mean.uniform_(-0.5, 0.5)
                m.running_var.uniform_(0.5, 2.0)
    return model


@pytest.fixture(scope="module")
def exported(tmp_path_factory):
    """Export the tiny reference model's streaming graph to ONNX."""
    from torch.onnx._internal.torchscript_exporter import onnx_proto_utils

    model = _tiny_ref_model()
    tone = model.tone

    class Export(torch.nn.Module):
        def __init__(self, m):
            super().__init__()
            self.model = m

        def forward(self, signal, *state):
            return self.model.forward_for_export(signal, None, *state)

    path = tmp_path_factory.mktemp("onnx") / "model.onnx"
    sig = torch.randint(-25000, 25000, (1, 2400, 1), dtype=torch.int32)
    state = tone.get_initial_state(1)
    # torch's exporter needs the `onnx` package only for the final
    # onnxscript-function injection step, a no-op for this graph.
    orig = onnx_proto_utils._add_onnxscript_fn
    onnx_proto_utils._add_onnxscript_fn = lambda mb, co: mb
    try:
        import io

        buf = io.BytesIO()
        with torch.no_grad():
            torch.onnx.export(Export(tone).eval(), (sig, *state), buf,
                              opset_version=17, dynamo=False)
        path.write_bytes(buf.getvalue())
    finally:
        onnx_proto_utils._add_onnxscript_fn = orig
    return model, path


def test_graph_parses(exported):
    _, path = exported
    initializers, nodes = parse_onnx_graph(path)
    assert len(initializers) > 20
    assert any(n["op"] == "Conv" for n in nodes)


def test_state_dict_recovered(exported):
    """Every parameter is recovered exactly, except BNs (folded into the
    preceding conv by the exporter) and the fused conv weights themselves."""
    model, path = exported
    sd = load_onnx_state_dict(path)
    ref = {k: v.numpy() for k, v in model.tone.state_dict().items()}
    fused = ("conv.depthwise_conv.conv", "pre_encode.conv.0.0",
             "pre_encode.conv.1.0")
    bn = (".batch_norm.", "conv.0.1.", "conv.1.1.")
    for k, v in ref.items():
        if k.endswith("num_batches_tracked") or any(s in k for s in bn):
            continue
        assert k in sd, f"missing {k}"
        assert sd[k].shape == v.shape, k
        if not any(s in k for s in fused):
            np.testing.assert_allclose(sd[k], v, atol=2e-5, err_msg=k)


def test_onnx_import_forward_parity(exported):
    """Offline logprobs from the ONNX-imported pytree match the torch
    reference (fused conv + identity BN == original conv + real BN).

    The baseline is a FRESH torch model (same seed): running
    torch.onnx.export mutates the reference module in-process — its RoPE
    cos/sin cache is keyed by length only (reference submodules.py:129),
    so the streaming-trace offsets poison later offline forwards by ~0.06.
    (A mutable-state hazard the pure-functional rebuild is immune to.)
    """
    from tone_tpu.core.model import apply_offline

    _, path = exported
    model = _tiny_ref_model()
    cfg = _tiny_cfg()
    variables = load_onnx_checkpoint(path, cfg)

    rng = np.random.default_rng(1)
    audio = rng.integers(-25000, 25000, (2, 2400 * 3)).astype(np.int32)
    lens = np.array([2400 * 3, 2400 * 2], dtype=np.int64)
    with torch.no_grad():
        lp_ref, _ = model.tone(
            torch.from_numpy(audio).float() / 32767.0, torch.from_numpy(lens))
    lp_jax, _, _ = apply_offline(variables, cfg, jnp.asarray(audio),
                                 jnp.asarray(lens))
    np.testing.assert_allclose(
        np.asarray(lp_jax)[:, :lp_ref.shape[1]], lp_ref.numpy(), atol=1e-4)


def test_model_from_local_onnx(exported):
    """StreamingCTCModel.from_local accepts the deployed .onnx artifact
    (reference onnx_wrapper.py:68-78 parity)."""
    from tone_tpu.acoustic import StreamingCTCModel

    _, path = exported
    model = StreamingCTCModel.from_local(path, config=_tiny_cfg())
    chunk = np.zeros((1, 2400, 1), np.int32)
    logprobs, state = model.forward(chunk)
    assert logprobs.shape == (1, 10, 35)
    assert np.isfinite(logprobs).all()
