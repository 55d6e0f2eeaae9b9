"""Batch image generation — fixed prompt, many seeds (the UI "Images" tab).

Rebuild of the reference ``generate_images`` / ``generate_images_flax``
(``image_generation.py:108-215, 221-363``) on the shared engine.  Fixes the
reference's bugs rather than replicating them: the hardcoded
``torch.cuda.HalfTensor`` cast (``image_generation.py:101``) and the dead
``push_to_hub`` code after ``return`` (``:215-218, 363-366``) — here the
upload actually runs.
"""

from __future__ import annotations

import json
import logging
import random
import time
from pathlib import Path
from typing import Optional

import jax
import numpy as np

logger = logging.getLogger("sdv_tpu")


def generate_images(pipeline, prompt: str, batch_size: Optional[int] = 1,
                    num_batches: int = 1, seeds=None,
                    num_inference_steps: int = 50,
                    guidance_scale: float = 7.5, eta: float = 0.0,
                    output_dir: str = "./images", name: Optional[str] = None,
                    image_file_ext: str = ".jpg",
                    upsample: bool = False, height: Optional[int] = None,
                    width: Optional[int] = None,
                    negative_prompt: Optional[str] = None,
                    push_to_hub: bool = False,
                    repo_id: Optional[str] = None, private: bool = False,
                    create_pr: bool = False,
                    upsample_weights: Optional[str] = None,
                    control_image=None, controlnet_scale: float = 1.0):
    """Generate ``batch_size * num_batches`` images of one prompt, one seed
    each; write ``{seed}{ext}`` files + ``prompt_config.json``; optionally
    upload the folder to the HF hub.  Returns the list of file paths."""
    height = height or pipeline.models.default_size
    width = width or pipeline.models.default_size
    batch_size = batch_size or pipeline.models.default_batch_size
    name = name or time.strftime("%Y%m%d-%H%M%S")
    save_path = Path(output_dir) / name
    save_path.mkdir(exist_ok=False, parents=True)

    n_total = batch_size * num_batches
    if seeds is None:
        seeds = random.sample(range(2 ** 32 - 1), n_total)
    if len(seeds) != n_total:
        raise ValueError("len(seeds) must equal batch_size * num_batches")

    cfg_path = save_path / "prompt_config.json"
    cfg_path.write_text(json.dumps(dict(
        prompt=prompt, batch_size=batch_size, num_batches=num_batches,
        seeds=seeds, num_inference_steps=num_inference_steps,
        guidance_scale=guidance_scale, eta=eta, upsample=upsample,
        height=height, width=width, negative_prompt=negative_prompt,
        scheduler=pipeline.engine.scheduler_name,
        tiled=pipeline.models.tiled,
        device=str(jax.devices()[0]),
        framework="stable_diffusion_videos_tpu",
    ), indent=2, sort_keys=True))

    if upsample:
        pipeline._ensure_upsampler(upsample_weights)

    ctrl_kw = {}
    if control_image is not None:
        from .walk import load_control_image
        ctrl_kw = dict(control=load_control_image(control_image, height,
                                                  width),
                       control_scale=controlnet_scale)

    if getattr(pipeline, "prompt_weighting", False):
        from ..core.prompt_weighting import chunks_needed
        tok = pipeline.models.tokenizer
        n = max(chunks_needed(tok, t)
                for t in (prompt, negative_prompt or ""))
        embed = pipeline.engine.embed_text_weighted(prompt, n)
        uncond = pipeline.engine.embed_text_weighted(negative_prompt or "",
                                                     n)
    else:
        embed = pipeline.engine.embed_text(prompt)
        uncond = pipeline.engine.embed_text(negative_prompt or "")
    latent_shape = pipeline._latent_shape(height, width)

    frame_filepaths = []
    for b in range(num_batches):
        batch_seeds = seeds[b * batch_size:(b + 1) * batch_size]
        noise = np.concatenate([pipeline.init_noise(s, latent_shape)
                                for s in batch_seeds])
        cond = jax.numpy.broadcast_to(embed, (len(batch_seeds),)
                                      + embed.shape[1:])
        xl_kw = pipeline._xl_pooled_kwargs(prompt, negative_prompt,
                                           len(batch_seeds))
        with pipeline.timer.stage("denoise"):
            images = pipeline.engine.denoise_frames(
                cond, uncond, jax.numpy.asarray(noise),
                num_inference_steps=num_inference_steps,
                guidance_scale=guidance_scale, eta=eta, **xl_kw, **ctrl_kw)
        pipeline.timer.add_frames(len(images))
        for seed, pil in zip(batch_seeds, pipeline._postprocess(images)):
            fpath = save_path / f"{seed}{image_file_ext}"
            pil.save(fpath)
            frame_filepaths.append(str(fpath))

    if push_to_hub:
        from ..hub import upload_folder_chunked
        if repo_id is None:
            raise ValueError("push_to_hub=True requires repo_id")
        upload_folder_chunked(repo_id, save_path, private=private,
                              create_pr=create_pr)
    return frame_filepaths


def generate_input_batches(pipeline, prompts, seeds, batch_size: int,
                           height: int, width: int):
    """Yield (batch_idx, embeds, noise) batches for fixed prompt/seed lists
    (reference ``generate_input_batches``, ``image_generation.py:81-105`` —
    minus its hardcoded ``torch.cuda.HalfTensor`` cast, ``:101``)."""
    if len(prompts) != len(seeds):
        raise ValueError("Number of prompts and seeds must be equal.")
    latent_shape = pipeline._latent_shape(height, width)
    embeds, noises, batch_idx = [], [], 0
    for i, (prompt, seed) in enumerate(zip(prompts, seeds)):
        embeds.append(np.asarray(pipeline.engine.embed_text(prompt))[0])
        noises.append(pipeline.init_noise(seed, latent_shape)[0])
        if len(embeds) == batch_size or i + 1 == len(prompts):
            yield batch_idx, np.stack(embeds), np.stack(noises)
            batch_idx += 1
            embeds, noises = [], []


# flax-API-compatible alias: this framework has a single TPU backend, so the
# reference's torch/flax split (image_generation.py:108/221) collapses.
generate_images_flax = generate_images
