"""UNet fine-tuning (sharded epsilon-prediction training step)."""

from .trainer import TrainConfig, UNetTrainer

__all__ = ["TrainConfig", "UNetTrainer"]
