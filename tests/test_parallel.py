"""Tensor-parallel sharding rules: the Megatron-style column/row splits in
parallel/mesh.py must actually land on parameters (SURVEY.md §2.3) — a
renamed tree must fail loudly, never silently replicate."""

import jax
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from tone_tpu.config import EncoderConfig, ToneConfig
from tone_tpu.core.model import init_model_params
from tone_tpu.parallel.mesh import (
    MODEL_AXIS,
    make_mesh,
    param_shardings,
    stream_state_shardings,
)


@pytest.fixture(scope="module")
def tiny_variables():
    enc = EncoderConfig(
        n_layers=2, d_model=64, n_heads=4, rope_dim=16, ff_expansion_factor=2,
        conv_kernel_size=7, subsampling_conv_channels=(4, 8),
        mhsa_stateless_layers=1, reduction_position=0, upsample_position=1,
        should_recompute_att_scores=(True, True))
    cfg = ToneConfig(encoder=enc, compute_dtype="float32")
    return cfg, init_model_params(jax.random.PRNGKey(0), cfg)


@pytest.fixture(scope="module")
def mesh():
    return make_mesh(n_data=4, n_model=2)


def test_ff_and_attention_params_are_tensor_parallel(tiny_variables, mesh):
    _, variables = tiny_variables
    shardings = param_shardings(mesh, variables["params"])
    layer = shardings["encoder"]["layers"][0]
    # column split of GLU in-projections, row split of the out-projection
    assert layer["ff1"]["lin1"]["w"].spec == P(None, MODEL_AXIS)
    assert layer["ff1"]["linv"]["w"].spec == P(None, MODEL_AXIS)
    assert layer["ff1"]["lin2"]["w"].spec == P(MODEL_AXIS, None)
    assert layer["ff2"]["lin1"]["w"].spec == P(None, MODEL_AXIS)
    att = layer["att"]
    assert att["linear_q"]["w"].spec == P(None, MODEL_AXIS)
    assert att["linear_k"]["w"].spec == P(None, MODEL_AXIS)
    assert att["linear_v"]["w"].spec == P(None, MODEL_AXIS)
    assert att["linear_out"]["w"].spec == P(MODEL_AXIS, None)
    # biases of column-split layers follow the split
    assert layer["ff1"]["lin1"]["b"].spec == P(MODEL_AXIS)
    # norms stay replicated
    assert layer["norm_ff1"]["weight"].spec == P()


def test_majority_of_param_bytes_sharded(tiny_variables, mesh):
    _, variables = tiny_variables
    shardings = param_shardings(mesh, variables["params"])
    flat_p = jax.tree_util.tree_leaves(variables["params"])
    flat_s = jax.tree_util.tree_leaves(
        shardings, is_leaf=lambda x: hasattr(x, "spec"))
    total = sum(x.size for x in flat_p)
    sharded = sum(p.size for p, s in zip(flat_p, flat_s)
                  if any(e == MODEL_AXIS for e in s.spec))
    assert sharded / total > 0.5, f"only {sharded/total:.1%} of bytes TP-sharded"


def test_renamed_tree_fails_loudly(tiny_variables, mesh):
    """A renamed parameter tree must raise, not silently de-shard
    (the round-1 silent-P() hazard)."""
    _, variables = tiny_variables
    renamed = jax.tree_util.tree_map(lambda x: x, variables["params"])
    layers = tuple(
        {("blk_" + k if k in ("ff1", "ff2", "att") else k): v
         for k, v in layer.items()}
        for layer in renamed["encoder"]["layers"])
    renamed["encoder"]["layers"] = layers
    with pytest.raises(ValueError, match="TP sharding rules"):
        param_shardings(mesh, renamed)


def test_stream_state_sharded_on_slots(tiny_variables, mesh):
    from tone_tpu.core.model import init_streaming_state

    cfg, _ = tiny_variables
    state = init_streaming_state(cfg, 8)
    shardings = stream_state_shardings(mesh, state)
    leaves_state = jax.tree_util.tree_leaves(state)
    leaves_shard = jax.tree_util.tree_leaves(
        shardings, is_leaf=lambda x: hasattr(x, "spec"))
    for x, s in zip(leaves_state, leaves_shard):
        axis = s.spec.index("data")
        assert x.shape[axis] == 8, (x.shape, s.spec)


def test_arena_shardings_matches_materialized(tiny_variables, mesh):
    """arena_shardings (serve --data-parallel) must produce the same specs
    as sharding a materialized state — it only swaps in jax.eval_shape to
    avoid allocating an arena-sized buffer — and reject uneven slot counts
    before any device work."""
    from tone_tpu.core.model import init_streaming_state
    from tone_tpu.parallel.mesh import arena_shardings

    cfg, _ = tiny_variables
    via_eval = arena_shardings(mesh, cfg, 8)
    via_state = stream_state_shardings(mesh, init_streaming_state(cfg, 8))
    assert jax.tree_util.tree_structure(via_eval) == \
        jax.tree_util.tree_structure(via_state)
    for a, b in zip(
            jax.tree_util.tree_leaves(via_eval, is_leaf=lambda x: hasattr(x, "spec")),
            jax.tree_util.tree_leaves(via_state, is_leaf=lambda x: hasattr(x, "spec"))):
        assert a.spec == b.spec

    with pytest.raises(ValueError, match="multiple"):
        arena_shardings(mesh, cfg, 9)


def test_tp_matmul_actually_partitions(tiny_variables, mesh):
    """End to end: jit a sharded FF matmul under the mesh and check the
    compiled output sharding is the TP layout, not replicated."""
    import jax.numpy as jnp
    from jax.sharding import NamedSharding

    _, variables = tiny_variables
    shardings = param_shardings(mesh, variables["params"])
    p = variables["params"]["encoder"]["layers"][0]["ff1"]["lin1"]
    s = shardings["encoder"]["layers"][0]["ff1"]["lin1"]
    w = jax.device_put(p["w"], s["w"])
    x = jax.device_put(
        np.ones((8, p["w"].shape[0]), np.float32),
        NamedSharding(mesh, P("data", None)))

    y = jax.jit(lambda x, w: x @ w)(x, w)
    assert y.sharding.spec == P("data", MODEL_AXIS)


def test_arena_ticks_on_sharded_mesh(tiny_variables):
    """Multi-chip serving: the stream arena executes with its slot axis
    sharded over all 8 virtual devices, and slots behave independently
    (SURVEY.md §2.3 batch-sharded serving; Triton config.pbtxt:30-37)."""
    import numpy as np

    from tone_tpu.parallel.mesh import make_mesh, stream_state_shardings
    from tone_tpu.core.model import init_streaming_state
    from tone_tpu.runtime.arena import StreamArena

    cfg, variables = tiny_variables
    mesh = make_mesh(n_data=8, n_model=1)
    n_slots = 16
    sharding = stream_state_shardings(mesh, init_streaming_state(cfg, n_slots))
    arena = StreamArena(variables, cfg, n_slots, sharding=sharding)

    rng = np.random.default_rng(0)
    chunk = rng.integers(-20000, 20000, (n_slots, cfg.audio_chunk_samples)).astype(np.int16)
    active = np.ones(n_slots, bool)
    reset = np.ones(n_slots, bool)
    lp1 = arena.tick(chunk, active, reset)
    assert lp1.shape == (n_slots, cfg.encoder.chunk_size, 35)
    assert np.isfinite(lp1).all()
    # identical inputs on every slot -> identical outputs across devices
    same = np.broadcast_to(chunk[:1], chunk.shape).copy()
    arena2 = StreamArena(variables, cfg, n_slots, sharding=sharding)
    lp2 = arena2.tick(same, active, np.ones(n_slots, bool))
    np.testing.assert_allclose(lp2, np.broadcast_to(lp2[:1], lp2.shape), atol=1e-5)
    # state actually lives sharded on the mesh
    leaf = jax.tree_util.tree_leaves(arena.state)[0]
    assert len(leaf.sharding.device_set) == 8


def test_tp_loss_equals_single_device(tiny_variables):
    """The TP correctness oracle VERDICT-r2 asked for: the same batch on a
    tp=2 mesh and a tp=1 mesh must produce the same loss (Megatron-style
    splits are a pure layout change; XLA collectives must reconstruct the
    exact math)."""
    from tone_tpu.training import DataCollatorCTCWithPadding, Trainer, TrainerConfig

    cfg, variables = tiny_variables
    rng = np.random.default_rng(0)
    features = [
        {"input_values": rng.normal(0, 0.1, 2400 + 160 * i).astype(np.float32),
         "labels": "да нет да"}
        for i in range(4)
    ]
    batch = DataCollatorCTCWithPadding()(features)

    losses = {}
    for n_data, n_model in ((2, 1), (1, 2), (2, 2)):
        mesh = make_mesh(n_data=n_data, n_model=n_model)
        trainer = Trainer(cfg, TrainerConfig(total_steps=4), mesh=mesh)
        state = trainer.create_state(jax.tree.map(np.copy, variables))
        state, loss = trainer.train_step(state, batch)
        _, loss2 = trainer.train_step(state, batch)
        losses[(n_data, n_model)] = (float(loss), float(loss2))

    base = losses[(2, 1)]
    assert np.isfinite(base).all()
    for key, pair in losses.items():
        np.testing.assert_allclose(pair, base, rtol=2e-5, err_msg=str(key))
    # second step differs from the first (the optimizer actually stepped)
    assert abs(base[1] - base[0]) > 1e-7


@pytest.mark.slow
def test_full_config_multichip():
    """The production 71M config compiles AND executes dp x tp training +
    stream-sharded serving on the 8-device mesh (VERDICT-r2 #3: topology
    was previously proven only on a reduced 8-layer model).  Several
    minutes of XLA:CPU SPMD compile — slow tier."""
    import __graft_entry__

    __graft_entry__.dryrun_multichip(8, full=True)


@pytest.mark.slow
def test_engine_finals_identical_on_sharded_mesh(tiny_variables):
    """Multi-chip serving end to end at the ENGINE level (not just the raw
    arena): a MultiStreamEngine whose slot arena is sharded over all 8
    virtual devices must produce exactly the finals of an unsharded engine
    for the same streams — and its state must really live on the mesh.
    This is what `tone_tpu serve --data-parallel` constructs."""
    from tone_tpu.core.model import init_streaming_state
    from tone_tpu.runtime.engine import MultiStreamEngine

    cfg, variables = tiny_variables
    n_slots = 8
    mesh = make_mesh(n_data=8, n_model=1)
    sharding = stream_state_shardings(mesh, init_streaming_state(cfg, n_slots))

    rng = np.random.default_rng(7)
    clips = [rng.integers(-20000, 20000, 2400 * 3).astype(np.int32)
             for _ in range(3)]

    def run(engine):
        sids = [engine.open_stream() for _ in clips]
        for sid, clip in zip(sids, clips):
            for i in range(len(clip) // 2400):
                engine.feed(sid, clip[i * 2400:(i + 1) * 2400])
            engine.close_stream(sid)
        finals = {sid: [] for sid in sids}
        for _ in range(len(clips[0]) // 2400 + 2):
            for sid, futures in engine.tick().items():
                finals[sid].extend(
                    (p.text, p.start_time, p.end_time)
                    for p in (f.result() for f in futures))
        return [finals[sid] for sid in sids]

    sharded = MultiStreamEngine(variables, cfg, n_slots=n_slots,
                                sharding=sharding)
    plain = MultiStreamEngine(variables, cfg, n_slots=n_slots)
    got = run(sharded)
    want = run(plain)
    assert got == want
    leaf = jax.tree_util.tree_leaves(sharded.arena.state)[0]
    assert len(leaf.sharding.device_set) == 8
