"""Training tests: CTC loss vs torch, collator, trainer on a DPxTP mesh, WER."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tone_tpu.config import ToneConfig
from tone_tpu.core.model import init_model_params
from tone_tpu.training import (
    DataCollatorCTCWithPadding,
    Trainer,
    TrainerConfig,
    ctc_loss,
    tokenize_text,
    word_error_rate,
)
from tone_tpu.parallel.mesh import make_mesh


def test_wer():
    assert word_error_rate(["привет мир"], ["привет мир"]) == 0.0
    assert word_error_rate(["привет мир"], ["привет мой мир"]) == pytest.approx(1 / 3)
    # corpus-level: total errors / total ref words
    assert word_error_rate(["а б", "в"], ["а б", "г"]) == pytest.approx(1 / 3)
    # normalization: ё -> е, case
    assert word_error_rate(["ЕЩЁ"], ["ещё"]) == 0.0


def test_tokenize_roundtrip():
    from tone_tpu.config import LABELS

    ids = tokenize_text("привет мир")
    assert "".join(LABELS[i] for i in ids) == "привет мир"
    # out-of-vocabulary chars are dropped, text is normalized
    assert tokenize_text("Ёж!") == tokenize_text("еж")


def test_collator_shapes():
    rng = np.random.default_rng(0)
    feats = [
        {"input_values": rng.normal(size=5000).astype(np.float32), "labels": "да"},
        {"input_values": rng.normal(size=2500).astype(np.float32), "labels": "нет нет"},
    ]
    batch = DataCollatorCTCWithPadding()(feats)
    assert batch["input_values"].shape == (2, 7200)  # padded to 2400 multiple
    assert batch["labels"].shape[1] % 16 == 0
    assert (batch["labels"][0] == -100).sum() == batch["labels"].shape[1] - 2
    np.testing.assert_array_equal(batch["input_lengths"], [5000, 2500])


def test_ctc_loss_matches_torch():
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(0)
    logits = rng.normal(0, 2, (3, 25, 35)).astype(np.float32)
    logprobs = jax.nn.log_softmax(jnp.asarray(logits), -1)
    lens = np.array([25, 20, 15], np.int32)
    labels = np.full((3, 8), -100, np.int32)
    labels[0, :5] = [1, 2, 3, 4, 5]
    labels[1, :3] = [6, 7, 8]
    labels[2, :2] = [9, 10]

    ours = float(ctc_loss(logprobs, jnp.asarray(lens), jnp.asarray(labels), blank_id=34))

    t_lp = torch.log_softmax(torch.from_numpy(logits), -1).transpose(0, 1)
    flat = torch.tensor([1, 2, 3, 4, 5, 6, 7, 8, 9, 10])
    t_loss = torch.nn.functional.ctc_loss(
        t_lp, flat, torch.from_numpy(lens.astype(np.int64)),
        torch.tensor([5, 3, 2]), blank=34, reduction="mean", zero_infinity=True)
    assert ours == pytest.approx(float(t_loss), rel=1e-4)


def test_ctc_loss_zero_infinity():
    # target longer than output frames -> infinite loss -> zeroed
    logprobs = jax.nn.log_softmax(jnp.zeros((1, 3, 35)), -1)
    labels = jnp.asarray([[1, 2, 3, 4, 5, 6, 7, 8]], jnp.int32)
    loss = ctc_loss(logprobs, jnp.asarray([3]), labels, blank_id=34)
    assert float(loss) == 0.0


def _tiny_cfg():
    """Small config: full architecture shape (reduction, score sharing,
    stateful layers) at a fraction of the compile time."""
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "examples"))
    from train_tiny_e2e import tiny_config

    return tiny_config()


@pytest.mark.slow
def test_trainer_overfits_tiny_batch():
    """Full train step on a 4x2 DPxTP mesh: loss must drop fast on a
    repeated tiny batch (learning + grad sync + TP sharding all work)."""
    cfg = _tiny_cfg()
    variables = init_model_params(jax.random.PRNGKey(0), cfg)
    mesh = make_mesh(n_data=4, n_model=2)
    trainer = Trainer(cfg, TrainerConfig(total_steps=20, learning_rate=3e-4), mesh=mesh)
    state = trainer.create_state(variables)

    rng = np.random.default_rng(0)
    feats = [{"input_values": rng.normal(0, 0.1, 4000 + 500 * i).astype(np.float32),
              "labels": l}
             for i, l in enumerate(["привет мир", "да нет", "тест", "ещё тест"])]
    batch = DataCollatorCTCWithPadding()(feats)

    first = None
    for _ in range(6):
        state, loss = trainer.train_step(state, batch)
        if first is None:
            first = float(loss)
    assert float(loss) < first * 0.7, (first, float(loss))
    assert int(state.step) == 6


@pytest.mark.slow
def test_trainer_checkpoint_resume(tmp_path):
    cfg = _tiny_cfg()
    variables = init_model_params(jax.random.PRNGKey(0), cfg)
    mesh = make_mesh(n_data=8, n_model=1)
    trainer = Trainer(cfg, TrainerConfig(total_steps=10), mesh=mesh)
    state = trainer.create_state(variables)

    rng = np.random.default_rng(1)
    batch = DataCollatorCTCWithPadding()(
        [{"input_values": rng.normal(0, 0.1, 3000).astype(np.float32), "labels": "да"}
         for _ in range(8)])
    state, _ = trainer.train_step(state, batch)
    trainer.save(tmp_path / "ckpt", state)

    template = trainer.create_state(init_model_params(jax.random.PRNGKey(1), cfg))
    restored = trainer.restore(tmp_path / "ckpt", template)
    assert int(restored.step) == 1
    a = jax.tree.leaves(state.params)[0]
    b = jax.tree.leaves(restored.params)[0]
    np.testing.assert_allclose(np.asarray(a), np.asarray(b))


@pytest.mark.slow
def test_grad_accumulation_equals_macro_batch():
    """grad_accum_steps=2 over two half-batches updates params the same as
    one step over the full batch (HF gradient_accumulation_steps parity)."""
    cfg = _tiny_cfg()
    # host copies: the donated train step consumes the device buffers, and
    # both trainers must start from identical params
    variables = jax.tree.map(
        np.asarray, init_model_params(jax.random.PRNGKey(0), cfg))
    mesh = make_mesh(n_data=2, n_model=1)

    rng = np.random.default_rng(3)
    feats = [{"input_values": rng.normal(0, 0.1, 4000).astype(np.float32),
              "labels": l}
             for l in ["привет мир", "да нет", "тест раз", "ещё тест"]]
    collate = DataCollatorCTCWithPadding()
    full = collate(feats)
    halves = [collate(feats[:2]), collate(feats[2:])]

    t_macro = Trainer(cfg, TrainerConfig(total_steps=4, learning_rate=3e-4),
                      mesh=mesh)
    s_macro = t_macro.create_state(jax.tree.map(jnp.asarray, variables))
    s_macro, _ = t_macro.train_step(s_macro, full)

    t_accum = Trainer(cfg, TrainerConfig(total_steps=4, learning_rate=3e-4,
                                         grad_accum_steps=2), mesh=mesh)
    s_accum = t_accum.create_state(jax.tree.map(jnp.asarray, variables))
    for half in halves:
        s_accum, _ = t_accum.train_step(s_accum, half)

    flat_m = jax.tree_util.tree_leaves(s_macro.params)
    flat_a = jax.tree_util.tree_leaves(s_accum.params)
    for m, a in zip(flat_m, flat_a):
        np.testing.assert_allclose(np.asarray(m), np.asarray(a),
                                   rtol=2e-4, atol=2e-5)


def test_remat_policies_match_no_remat():
    """remat='dots'/'full' recompute the forward during backward — the loss
    and the updated params must match the default (no-remat) step."""
    cfg = _tiny_cfg()
    rng = np.random.default_rng(3)
    batch = DataCollatorCTCWithPadding()(
        [{"input_values": rng.normal(0, 0.1, 3000).astype(np.float32),
          "labels": t} for t in ("да", "нет")])
    mesh = make_mesh(n_data=2, n_model=1)

    def one_step(remat):
        variables = init_model_params(jax.random.PRNGKey(0), cfg)
        trainer = Trainer(cfg, TrainerConfig(total_steps=4, remat=remat),
                          mesh=mesh)
        state = trainer.create_state(variables)
        state, loss = trainer.train_step(state, batch)
        return float(loss), jax.tree.leaves(state.params)[0]

    loss0, p0 = one_step(None)
    for remat in ("dots", "full"):
        loss1, p1 = one_step(remat)
        assert np.isclose(loss0, loss1, rtol=1e-5), (remat, loss0, loss1)
        np.testing.assert_allclose(np.asarray(p0), np.asarray(p1),
                                   rtol=2e-4, atol=1e-6, err_msg=remat)
