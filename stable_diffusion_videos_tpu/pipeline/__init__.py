"""Product orchestration: walk videos, batch images, upsampling."""

from .image_generation import generate_images, generate_images_flax
from .upsampling import RealESRGANModel
from .walk import StableDiffusionWalkPipeline

__all__ = ["StableDiffusionWalkPipeline", "generate_images",
           "generate_images_flax", "RealESRGANModel"]
