"""Experiment runtime: optimizer, jitted steps, train/eval loops, checkpoints."""

from vqa_tpu.training.optim import make_optimizer, steplr_factor
from vqa_tpu.training.state import TrainState, create_train_state
from vqa_tpu.training.checkpoint import save_checkpoint, load_checkpoint

__all__ = [
    "make_optimizer", "steplr_factor", "TrainState", "create_train_state",
    "save_checkpoint", "load_checkpoint",
]
