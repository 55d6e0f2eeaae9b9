"""Fine-tuning: full-UNet (sharded denoising objective) and LoRA adapters."""

from .lora import LoRATrainer, init_lora_params, merge_lora
from .trainer import TrainConfig, UNetTrainer

__all__ = ["TrainConfig", "UNetTrainer", "LoRATrainer", "init_lora_params",
           "merge_lora"]
