"""Model export and ahead-of-time compilation — the TensorRT-build equivalent.

The reference's deployment artifact chain is torch -> ONNX -> TensorRT plan
(tone/scripts/export.py, scripts/trt_build.sh).  On TPU the compiler is XLA
and the portable artifact is serialized StableHLO via ``jax.export``:

* :func:`export_streaming` — serialize the streaming step (weights as a
  runtime argument, so one artifact serves any checkpoint with the same
  architecture) for a set of batch sizes;
* :func:`load_exported` — run a serialized artifact without the model code;
* :func:`enable_compilation_cache` — persistent XLA compile cache so the
  8-40 s jit compile is paid once per machine, not once per process
  (the moral equivalent of shipping a TensorRT engine);
* :func:`aot_warmup` — precompile the streaming step for the serving batch
  sizes before traffic arrives.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Any, Sequence

import jax
import jax.numpy as jnp

from tone_tpu.config import ToneConfig
from tone_tpu.core.encoder import EncoderStreamState
from tone_tpu.core.model import StreamingState, apply_streaming, init_streaming_state

# jax.export must know how to serialize our state pytree node types.  Their
# flax.struct auxdata is always the empty tuple (all fields are pytree leaves).
for _cls in (StreamingState, EncoderStreamState):
    try:
        jax.export.register_pytree_node_serialization(
            _cls,
            serialized_name=f"tone_tpu.{_cls.__name__}",
            serialize_auxdata=lambda aux: b"",
            deserialize_auxdata=lambda data: (),
        )
    except ValueError:
        pass  # already registered (module reload)


def _abstractify(tree: Any):
    return jax.tree.map(lambda x: jax.ShapeDtypeStruct(jnp.shape(x), jnp.asarray(x).dtype), tree)


def _streaming_fn(config: ToneConfig):
    def step(variables, chunk, state):
        return apply_streaming(variables, config, chunk, state)

    return step


def export_streaming(
    variables: Any,
    config: ToneConfig,
    batch_sizes: Sequence[int],
    out_dir: str | Path,
    platforms: Sequence[str] | None = None,
) -> list[Path]:
    """Serialize the streaming step to StableHLO artifacts.

    Weights stay an argument (like ONNX initializers supplied at session
    load), so artifacts are architecture-specific but checkpoint-agnostic.

    Args:
        batch_sizes: one artifact per batch size (static shapes on TPU).
        platforms: lowering platforms, e.g. ("tpu",); defaults to current.

    Returns:
        list of written artifact paths.
    """
    out_dir = Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    step = _streaming_fn(config)
    var_spec = _abstractify(variables)
    written = []
    for b in batch_sizes:
        chunk_spec = jax.ShapeDtypeStruct((b, config.audio_chunk_samples), jnp.int32)
        state_spec = _abstractify(init_streaming_state(config, b))
        kwargs = {}
        if platforms is not None:
            kwargs["platforms"] = tuple(platforms)
        exported = jax.export.export(jax.jit(step), **kwargs)(
            var_spec, chunk_spec, state_spec)
        path = out_dir / f"streaming_b{b}.stablehlo"
        path.write_bytes(exported.serialize())
        written.append(path)
    (out_dir / "export_config.json").write_text(json.dumps({
        "config": config.to_dict(),
        "batch_sizes": list(batch_sizes),
        "platforms": list(exported.platforms),
        "jax_version": jax.__version__,
    }, indent=2))
    return written


def load_exported(path: str | Path):
    """Load a serialized streaming-step artifact.

    Returns a callable ``fn(variables, chunk, state) -> (logprobs, state)``
    that runs the precompiled computation (no tone_tpu model code needed).
    """
    exported = jax.export.deserialize(Path(path).read_bytes())
    return exported.call


def enable_compilation_cache(cache_dir: str | Path) -> bool:
    """Turn on XLA's persistent compilation cache; returns True on success.

    An unusable directory (the Docker image always sets
    TONE_TPU_COMPILE_CACHE=/cache/xla, and a host bind mount there may be
    root-owned) must not abort startup — the cache is an optimization, so
    degrade to a logged warning and run without it.
    """
    cache_dir = Path(cache_dir)
    try:
        cache_dir.mkdir(parents=True, exist_ok=True)
        probe = cache_dir / ".tone_tpu_writable"
        probe.touch()
        probe.unlink()
    except OSError as e:
        import logging

        logging.getLogger("tone_tpu.export").warning(
            "persistent compile cache disabled (%s unusable: %s)",
            cache_dir, e)
        return False
    jax.config.update("jax_compilation_cache_dir", str(cache_dir))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    return True


def aot_warmup(model, batch_sizes: Sequence[int]) -> None:
    """Precompile the streaming step for the given batch sizes
    (the serving-startup equivalent of Triton model_warmup)."""
    import numpy as np

    for b in batch_sizes:
        chunk = jnp.zeros((b, model.config.audio_chunk_samples), jnp.int32)
        state = model.init_state(b)
        logprobs, _ = model.forward_native(chunk, state)
        np.asarray(logprobs)
