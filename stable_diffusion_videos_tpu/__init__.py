"""stable_diffusion_videos_tpu — TPU-native latent-space-walk video framework.

Re-designed from scratch for TPU (jax/XLA/pallas/pjit) with the capabilities
of the reference ``stable_diffusion_videos`` package, exporting the same
8-symbol public API (reference ``__init__.py:99-119``) plus the TPU-native
internals (models, engine, mesh).

Imports are lazy (PEP 562) so ``import stable_diffusion_videos_tpu`` stays
instant; set ``EAGER_IMPORT=1`` to force eager loading (reference
``__init__.py:92-94``).
"""

from __future__ import annotations

import importlib
import os

__version__ = "0.3.0"

# public name -> "module:attr"
_EXPORTS = {
    # reference-compatible 8-symbol surface (reference __init__.py:99-119)
    "Interface": "app:Interface",
    "generate_images": "pipeline.image_generation:generate_images",
    "generate_images_flax": "pipeline.image_generation:generate_images_flax",
    "upload_folder_chunked": "hub:upload_folder_chunked",
    "StableDiffusionWalkPipeline": "pipeline.walk:StableDiffusionWalkPipeline",
    "make_video_pyav": "media.video:make_video_pyav",
    "get_timesteps_arr": "audio.analysis:get_timesteps_arr",
    "FlaxStableDiffusionWalkPipeline":
        "pipeline.walk:StableDiffusionWalkPipeline",  # single-backend alias
    "RealESRGANModel": "pipeline.upsampling:RealESRGANModel",
    # TPU-native surface
    "make_video": "media.video:make_video",
    "SDModels": "models.bundle:SDModels",
    "Engine": "runtime.engine:Engine",
    "Server": "runtime.server:Server",
    "UNetTrainer": "training.trainer:UNetTrainer",
    "make_mesh": "parallel.mesh:make_mesh",
    "slerp": "core.interp:slerp",
    "compare_frame_dirs": "utils.metrics:compare_frame_dirs",
}

__all__ = sorted(_EXPORTS)


def __getattr__(name: str):
    try:
        target = _EXPORTS[name]
    except KeyError:
        raise AttributeError(
            f"module {__name__!r} has no attribute {name!r}") from None
    mod_name, attr = target.split(":")
    mod = importlib.import_module(f".{mod_name}", __name__)
    value = getattr(mod, attr)
    globals()[name] = value  # cache
    return value


def __dir__():
    return __all__ + ["__version__"]


if os.environ.get("EAGER_IMPORT", ""):
    for _name in list(_EXPORTS):
        __getattr__(_name)
