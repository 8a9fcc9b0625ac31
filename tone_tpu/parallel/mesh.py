"""Device-mesh construction and sharding rules.

The parallelism design (SURVEY.md §2.3): everything in the reference is
batch parallelism, and we implement batch parallelism natively on TPU meshes —
``data`` axis for training batches and serving stream-slots, plus an optional
``model`` axis (tensor parallelism over heads / FF hidden) that XLA's SPMD
partitioner turns into ICI collectives automatically.  No hand-written
collectives: shardings in, XLA inserts psum/all-gather where needed.
"""

from __future__ import annotations

from typing import Any

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(n_data: int | None = None, n_model: int = 1,
              devices=None) -> Mesh:
    """Create a ('data', 'model') mesh over the available devices."""
    if devices is None:
        devices = jax.devices()
    if n_data is None:
        n_data = len(devices) // n_model
    if n_data * n_model != len(devices):
        devices = devices[: n_data * n_model]
    grid = np.asarray(devices).reshape(n_data, n_model)
    return Mesh(grid, (DATA_AXIS, MODEL_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch / stream-slot) axis over 'data'."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


# ---------------------------------------------------------------------------
# Parameter partition specs (tensor parallelism over the 'model' axis).
# ---------------------------------------------------------------------------
#
# Megatron-style column/row split of each Conformer layer:
#   * FF lin1/linv: (d_model, d_ff)  -> split d_ff      (column)
#   * FF lin2:      (d_ff, d_model)  -> split d_ff      (row; psum after)
#   * attention q/k/v: (d, d)        -> split heads dim (column)
#   * attention out:   (d, d)        -> split input dim (row; psum after)
#   * conv pw1: (d, 2d) column (GLU halves stay local pairs? no — GLU pairs
#     a[i] with b[i] across the half boundary, so a plain column split would
#     separate gates from values; keep pointwise convs replicated instead)
# Everything else (norms, depthwise convs, subsampling, head) is replicated —
# it is a tiny fraction of FLOPs and parameters.


def _param_spec(path: tuple, leaf) -> P:
    keys = [getattr(p, "key", getattr(p, "idx", None)) for p in path]
    spec = P()
    if "ff1" in keys or "ff2" in keys:
        if "lin1" in keys or "linv" in keys:
            spec = P(None, MODEL_AXIS) if keys[-1] == "w" else P(MODEL_AXIS)
        elif "lin2" in keys:
            spec = P(MODEL_AXIS, None) if keys[-1] == "w" else P()
    elif "att" in keys:
        if any(k in keys for k in ("linear_q", "linear_k", "linear_v")):
            spec = P(None, MODEL_AXIS) if keys[-1] == "w" else P(MODEL_AXIS)
        elif "linear_out" in keys:
            spec = P(MODEL_AXIS, None) if keys[-1] == "w" else P()
    if len(spec) > getattr(leaf, "ndim", 0):
        spec = P()
    return spec


def param_shardings(mesh: Mesh, params: Any) -> Any:
    """NamedSharding pytree for the model parameters (TP over 'model').

    Raises if the mesh has a non-trivial 'model' axis but the name-matching
    rules sharded (almost) nothing — e.g. after a parameter-tree rename —
    instead of silently replicating every weight.
    """
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    specs = {path: _param_spec(path, leaf) for path, leaf in flat}

    def uses_model_axis(spec: P) -> bool:
        return any(e == MODEL_AXIS or (isinstance(e, tuple) and MODEL_AXIS in e)
                   for e in spec)

    if mesh.shape.get(MODEL_AXIS, 1) > 1:
        total = sum(getattr(leaf, "size", 0) for _, leaf in flat)
        sharded = sum(getattr(leaf, "size", 0) for path, leaf in flat
                      if uses_model_axis(specs[path]))
        if total and sharded / total < 0.25:
            raise ValueError(
                f"tensor-parallel mesh (model={mesh.shape[MODEL_AXIS]}) but "
                f"only {sharded / total:.1%} of parameter bytes matched the "
                "TP sharding rules — the parameter tree no longer matches "
                "_param_spec's naming (ff1/ff2 lin1/linv/lin2, att "
                "linear_q/k/v/out)")
    treedef = jax.tree_util.tree_structure(params)
    return jax.tree_util.tree_unflatten(
        treedef, [NamedSharding(mesh, specs[p]) for p, _ in flat])


def replicated_shardings(mesh: Mesh, tree: Any) -> Any:
    return jax.tree.map(lambda _: replicated(mesh), tree)


def batch_shardings(mesh: Mesh, tree: Any) -> Any:
    return jax.tree.map(lambda _: batch_sharding(mesh), tree)


def arena_shardings(mesh: Mesh, config: Any, n_slots: int) -> Any:
    """Stream-state shardings for an ``n_slots`` serving arena — derived
    via ``jax.eval_shape`` so no state is materialized just to read its
    tree structure (an arena-sized allocation at production slot counts).

    Validates the slot count up front: an uneven split would otherwise
    surface as an opaque ``device_put`` error after the model load.
    """
    n_data = mesh.shape[DATA_AXIS]
    if n_slots % n_data:
        raise ValueError(
            f"n_slots ({n_slots}) must be a multiple of the mesh '{DATA_AXIS}' "
            f"axis size ({n_data}) to shard the stream arena evenly")
    from tone_tpu.core.model import init_streaming_state

    shapes = jax.eval_shape(lambda: init_streaming_state(config, n_slots))
    return stream_state_shardings(mesh, shapes)


def stream_state_shardings(mesh: Mesh, state: Any, batch_size: int = 0) -> Any:
    """Shardings for a ``StreamingState`` pytree: the stream-slot (batch)
    axis — wherever it is in each leaf — is sharded over 'data'.

    The batch axis per leaf is discovered by shape-diffing two batch sizes
    (see runtime.arena.batch_axes_tree), not by guessing from sizes.
    """
    del batch_size  # retained for API compatibility

    # Leaves laid out (n_layers, B, ...) are exactly the stacked per-layer
    # caches (mhsa / conv) of EncoderStreamState; everything else is
    # batch-leading.
    def leaf_sharding(path, x):
        names = [getattr(p, "name", getattr(p, "key", "")) for p in path]
        axis = 1 if any(n in ("mhsa", "conv") for n in names) and x.ndim == 4 else 0
        spec = [None] * x.ndim
        spec[axis] = DATA_AXIS
        return NamedSharding(mesh, P(*spec))

    return jax.tree_util.tree_map_with_path(leaf_sharding, state)
