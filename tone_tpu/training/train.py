"""Fine-tuning on TPU meshes: jit-compiled train step with DP (x optional TP).

TPU-native replacement for the reference's HF Trainer + accelerate recipe
(examples/finetune_example.ipynb): AdamW, linear warmup (5%) + linear decay
to zero, lr 5e-5, bf16 compute with fp32 params/optimizer state, greedy-WER
evaluation.  Data parallelism comes from sharding the batch over the mesh's
``data`` axis; gradients are synchronized by XLA's SPMD partitioner over ICI
(no hand-written collectives).  Exceeds the reference with orbax
checkpoint/resume of the full train state.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import Any, Callable, Iterable

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np
import optax

from tone_tpu.config import ToneConfig
from tone_tpu.core.model import apply_offline
from tone_tpu.parallel.mesh import (
    batch_sharding,
    make_mesh,
    param_shardings,
    replicated_shardings,
)
from tone_tpu.training.ctc import ctc_loss


@dataclass(frozen=True)
class TrainerConfig:
    """Hyperparameters (defaults = the reference fine-tune recipe)."""

    learning_rate: float = 5e-5
    warmup_ratio: float = 0.05
    total_steps: int = 1000
    weight_decay: float = 0.0
    max_grad_norm: float = 1.0
    # >1 averages gradients over that many train_step calls before one
    # optimizer update (HF Trainer's gradient_accumulation_steps) — the
    # reference recipe's effective batch 64 under tighter HBM.
    grad_accum_steps: int = 1
    # Rematerialization of the forward pass during backward: None lets XLA
    # keep every activation (bandwidth-heavy at large batch), "dots" saves
    # only matmul outputs (jax.checkpoint dots_with_no_batch_dims policy),
    # "full" recomputes everything.  Measured trade-offs in
    # docs/performance.md "Training throughput".
    remat: str | None = None
    # Chunk-blocked offline attention (layers.mhsa_blocked): O(T·window)
    # score traffic instead of masked (T, T) — 1.25-1.3× the train step at
    # 10 s clips, more at longer T (docs/performance.md).  Off = the
    # reference-shaped full-mask path.
    blocked_attention: bool = True
    seed: int = 0


@flax.struct.dataclass
class TrainState:
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any
    rng: jnp.ndarray


def make_lr_schedule(cfg: TrainerConfig) -> optax.Schedule:
    """Linear warmup then linear decay to zero (HF Trainer 'linear')."""
    warmup = max(int(cfg.total_steps * cfg.warmup_ratio), 1)
    return optax.join_schedules(
        [
            optax.linear_schedule(0.0, cfg.learning_rate, warmup),
            optax.linear_schedule(cfg.learning_rate, 0.0, cfg.total_steps - warmup),
        ],
        boundaries=[warmup],
    )


def make_optimizer(cfg: TrainerConfig) -> optax.GradientTransformation:
    base = optax.chain(
        optax.clip_by_global_norm(cfg.max_grad_norm),
        optax.adamw(make_lr_schedule(cfg), weight_decay=cfg.weight_decay),
    )
    if cfg.grad_accum_steps > 1:
        # Clipping happens on the *accumulated* gradient (MultiSteps wraps
        # the whole chain), matching HF Trainer semantics.
        return optax.MultiSteps(base, every_k_schedule=cfg.grad_accum_steps)
    return base


class Trainer:
    """Orchestrates jitted, mesh-sharded fine-tuning steps."""

    def __init__(
        self,
        model_config: ToneConfig,
        trainer_config: TrainerConfig | None = None,
        mesh=None,
    ) -> None:
        self.model_config = model_config
        self.config = trainer_config or TrainerConfig()
        self.mesh = mesh if mesh is not None else make_mesh()
        self.optimizer = make_optimizer(self.config)
        self._train_step = None
        self._eval_step = None

    # -- state -------------------------------------------------------------

    def create_state(self, variables: dict[str, Any]) -> TrainState:
        params = variables["params"]
        state = TrainState(
            step=jnp.zeros((), jnp.int32),
            params=params,
            batch_stats=variables["batch_stats"],
            opt_state=self.optimizer.init(params),
            rng=jax.random.PRNGKey(self.config.seed),
        )
        return jax.device_put(state, self.state_shardings(state))

    def state_shardings(self, state: TrainState) -> TrainState:
        """Params (and the Adam moments mirroring them) follow the TP rules;
        everything else is replicated across the mesh."""
        p_sh = param_shardings(self.mesh, state.params)

        def opt_shardings(s):
            # optax.adamw state is a tuple of transform states; the Adam
            # moments (mu/nu) mirror the params pytree exactly.
            if hasattr(s, "mu") and hasattr(s, "nu"):
                return s._replace(
                    count=replicated_shardings(self.mesh, s.count),
                    mu=p_sh, nu=p_sh)
            if hasattr(s, "inner_opt_state") and hasattr(s, "acc_grads"):
                # optax.MultiSteps: the gradient accumulator mirrors params.
                return s._replace(
                    mini_step=replicated_shardings(self.mesh, s.mini_step),
                    gradient_step=replicated_shardings(self.mesh,
                                                       s.gradient_step),
                    inner_opt_state=opt_shardings(s.inner_opt_state),
                    acc_grads=p_sh)
            if isinstance(s, tuple) and not hasattr(s, "_fields"):
                return tuple(opt_shardings(x) for x in s)
            return replicated_shardings(self.mesh, s)

        return TrainState(
            step=replicated_shardings(self.mesh, state.step),
            params=p_sh,
            batch_stats=replicated_shardings(self.mesh, state.batch_stats),
            opt_state=opt_shardings(state.opt_state),
            rng=replicated_shardings(self.mesh, state.rng),
        )

    # -- steps -------------------------------------------------------------

    def _build_train_step(self):
        model_config = self.model_config
        optimizer = self.optimizer
        mesh = self.mesh
        b_sh = batch_sharding(mesh)

        blocked = self.config.blocked_attention

        def forward(params, batch_stats, rng, input_values, input_lengths):
            return apply_offline(
                {"params": params, "batch_stats": batch_stats},
                model_config,
                input_values,
                input_lengths,
                rng=rng,
                training=True,
                blocked_attention=blocked,
            )

        if self.config.remat is not None:
            policy = {
                "dots": jax.checkpoint_policies.dots_with_no_batch_dims_saveable,
                "full": None,
            }[self.config.remat]
            forward = jax.checkpoint(forward, policy=policy)

        def loss_fn(params, batch_stats, rng, batch):
            logprobs, out_lens, new_stats = forward(
                params, batch_stats, rng,
                batch["input_values"], batch["input_lengths"])
            loss = ctc_loss(
                logprobs, out_lens, batch["labels"],
                blank_id=model_config.blank_id,
            )
            return loss, new_stats

        def step(state: TrainState, batch) -> tuple[TrainState, jnp.ndarray]:
            rng, step_rng = jax.random.split(state.rng)
            (loss, new_stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                state.params, state.batch_stats, step_rng, batch)
            updates, new_opt = optimizer.update(grads, state.opt_state, state.params)
            new_params = optax.apply_updates(state.params, updates)
            return TrainState(
                step=state.step + 1,
                params=new_params,
                batch_stats=new_stats,
                opt_state=new_opt,
                rng=rng,
            ), loss

        batch_shardings = {
            "input_values": b_sh, "input_lengths": b_sh, "labels": b_sh,
        }
        return jax.jit(
            step,
            in_shardings=(None, batch_shardings),
            donate_argnums=(0,),
        )

    def train_step(self, state: TrainState, batch: dict[str, np.ndarray]):
        """One optimization step.  ``state`` is donated."""
        if self._train_step is None:
            self._train_step = self._build_train_step()
        batch = {k: jnp.asarray(v) for k, v in batch.items()}
        return self._train_step(state, batch)

    # -- evaluation --------------------------------------------------------

    def _build_eval_step(self):
        model_config = self.model_config

        def step(params, batch_stats, batch):
            logprobs, out_lens, _ = apply_offline(
                {"params": params, "batch_stats": batch_stats},
                model_config,
                batch["input_values"],
                batch["input_lengths"],
                training=False,
            )
            tokens = jnp.argmax(logprobs, axis=-1)
            return tokens, out_lens

        return jax.jit(step)

    def eval_wer(self, state: TrainState, batches: Iterable[dict], references: list[str]) -> float:
        """Greedy-decode batches and compute corpus WER vs references."""
        from itertools import groupby

        from tone_tpu.config import LABELS
        from tone_tpu.training.wer import word_error_rate

        if self._eval_step is None:
            self._eval_step = self._build_eval_step()
        hyps: list[str] = []
        for batch in batches:
            batch = {k: jnp.asarray(v) for k, v in batch.items()}
            tokens, out_lens = self._eval_step(state.params, state.batch_stats, batch)
            tokens, out_lens = np.asarray(tokens), np.asarray(out_lens)
            for row, n in zip(tokens, out_lens):
                collapsed = (t for t, _ in groupby(row[:n].tolist()))
                hyps.append("".join(LABELS[t] for t in collapsed if t < len(LABELS)).strip())
        return word_error_rate(hyps, references)

    # -- checkpoint/resume (exceeds the reference, which has none) ---------

    def save(self, path, state: TrainState) -> None:
        import orbax.checkpoint as ocp
        from pathlib import Path

        path = Path(path).absolute()
        path.mkdir(parents=True, exist_ok=True)
        with ocp.StandardCheckpointer() as ckptr:
            ckptr.save(path / "train_state",
                       jax.tree.map(np.asarray, flax.serialization.to_state_dict(state)),
                       force=True)

    def restore(self, path, template: TrainState) -> TrainState:
        import orbax.checkpoint as ocp
        from pathlib import Path

        path = Path(path).absolute()
        with ocp.StandardCheckpointer() as ckptr:
            restored = ckptr.restore(path / "train_state")
        state = flax.serialization.from_state_dict(template, restored)
        return jax.device_put(state, self.state_shardings(template))
