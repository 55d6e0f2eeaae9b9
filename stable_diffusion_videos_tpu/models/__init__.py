"""TPU-native Flax implementations of the SD model family.

The reference imports all of these from diffusers/transformers (SURVEY.md
§2.2); here they are owned, NHWC, config-driven (full SD v1.x geometry and
tiny CPU-testable variants share every code path).
"""

from .clip_text import CLIPTextConfig, CLIPTextEncoder
from .controlnet import ControlNet, ControlNetBundle
from .safety import (CLIPVisionConfig, SafetyChecker, SafetyConfig,
                     preprocess_for_safety)
from .tokenizer import (BaseTokenizer, CLIPBPETokenizer, HFTokenizerAdapter,
                        HashTokenizer)
from .unet import UNet2DCondition, UNetConfig
from .vae import SD_LATENT_SCALE, AutoencoderKL, VAEConfig

__all__ = [
    "CLIPTextConfig", "CLIPTextEncoder", "ControlNet", "ControlNetBundle", "CLIPVisionConfig", "SafetyChecker",
    "SafetyConfig", "preprocess_for_safety", "BaseTokenizer",
    "CLIPBPETokenizer", "HFTokenizerAdapter", "HashTokenizer",
    "UNet2DCondition", "UNetConfig", "AutoencoderKL", "VAEConfig",
    "SD_LATENT_SCALE",
]
