"""Fine-tuning: CTC loss, collator, mesh-sharded trainer, WER."""

from tone_tpu.training.collator import DataCollatorCTCWithPadding, tokenize_text
from tone_tpu.training.ctc import ctc_loss
from tone_tpu.training.train import Trainer, TrainerConfig, TrainState
from tone_tpu.training.wer import normalize_text, word_error_rate

__all__ = [
    "DataCollatorCTCWithPadding",
    "Trainer",
    "TrainerConfig",
    "TrainState",
    "ctc_loss",
    "normalize_text",
    "tokenize_text",
    "word_error_rate",
]
