"""IP-Adapter — image-prompt conditioning (Ye et al. 2023).

Beyond the reference's feature set (it has no image prompting): a small
projection maps ONE CLIP image embedding to ``num_tokens`` pseudo text
tokens, and every UNet cross-attention gets decoupled ``to_k_ip``/
``to_v_ip`` projections whose scaled attention output is summed with the
text attention (``layers.CrossAttention``).  The UNet backbone is untouched
— the adapter params are SPLICED into the UNet param tree at load time and
the image tokens ride into the jitted denoise program as one extra operand,
so a walk/vid2vid can be style-anchored to a reference image at zero
per-step host cost.

Checkpoint layout (official ``ip-adapter_sd15.bin``-style):
``{"image_proj": {proj.weight/bias, norm.weight/bias},
   "ip_adapter": {"1.to_k_ip.weight", "1.to_v_ip.weight", "3. ...}}``
where the integer enumerates diffusers' ``unet.attn_processors`` in module
registration order — down blocks (level ascending), up blocks (DEEPEST
level first), mid block LAST — with attn2 processors at the odd indices.
``attn2_scopes`` reproduces that order against our scope names.
"""

from __future__ import annotations

from pathlib import Path
from typing import List, Optional, Tuple

import flax
import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from .safety import (CLIP_IMAGE_MEAN, CLIP_IMAGE_STD, CLIPVisionConfig,
                     CLIPVisionEncoder)


def preprocess_clip_image(images: jax.Array, image_size: int) -> jax.Array:
    """(B,H,W,3) float [0,1] -> CLIP-normalised (B,S,S,3), official
    ``CLIPImageProcessor`` semantics: bicubic resize of the SHORTEST side to
    ``image_size``, then center-crop — NOT a square resize, which would
    aspect-distort non-square image prompts and shift the embedding the
    style anchor sees (IP-Adapter ships with this preprocessing)."""
    b, h, w, c = images.shape
    if h <= w:
        nh = image_size
        nw = max(image_size, int(round(w * image_size / h)))
    else:
        nw = image_size
        nh = max(image_size, int(round(h * image_size / w)))
    x = jax.image.resize(images, (b, nh, nw, c), "cubic")
    top, left = (nh - image_size) // 2, (nw - image_size) // 2
    x = x[:, top:top + image_size, left:left + image_size]
    mean = jnp.asarray(CLIP_IMAGE_MEAN, images.dtype)
    std = jnp.asarray(CLIP_IMAGE_STD, images.dtype)
    return (jnp.clip(x, 0.0, 1.0) - mean) / std


class ImageProjection(nn.Module):
    """CLIP image embedding -> ``num_tokens`` cross-attention tokens
    (the official ImageProjModel: Linear -> reshape -> LayerNorm)."""
    cross_attention_dim: int
    num_tokens: int = 4
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, image_embeds: jax.Array) -> jax.Array:
        b = image_embeds.shape[0]
        x = nn.Dense(self.cross_attention_dim * self.num_tokens,
                     dtype=self.dtype, name="proj")(image_embeds)
        x = x.reshape(b, self.num_tokens, self.cross_attention_dim)
        return nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm")(x)


def attn2_scopes(cfg) -> List[Tuple[str, str, int]]:
    """Ordered (outer_scope, block_scope, level) for every cross-attention
    in our UNet, matching diffusers' attn-processor enumeration order
    (down asc -> up desc -> mid; see module docstring)."""
    scopes = []
    n = len(cfg.block_out_channels)
    for level in range(n):
        if cfg.attn_levels[level]:
            for j in range(cfg.layers_per_block):
                for d in range(cfg.depth(level)):
                    scopes.append((f"down_{level}_attn_{j}",
                                   f"blocks_{d}", level))
    for level in reversed(range(n)):
        if cfg.attn_levels[level]:
            for j in range(cfg.layers_per_block + 1):
                for d in range(cfg.depth(level)):
                    scopes.append((f"up_{level}_attn_{j}",
                                   f"blocks_{d}", level))
    for d in range(cfg.depth(n - 1)):
        scopes.append(("mid_attn", f"blocks_{d}", n - 1))
    return scopes


@flax.struct.dataclass
class IPAdapter:
    """Converted IP-Adapter bundle.

    ``attn_kernels``: one ``(to_k_ip, to_v_ip)`` kernel pair
    ((cross_dim, inner_level) each) per ``attn2_scopes`` entry.
    ``vision_params`` may be None when callers pass precomputed CLIP image
    embeddings to :meth:`image_tokens`."""
    proj_params: dict
    attn_kernels: Tuple = flax.struct.field(pytree_node=True)
    num_tokens: int = flax.struct.field(pytree_node=False, default=4)
    embed_dim: int = flax.struct.field(pytree_node=False, default=1024)
    vision_config: Optional[CLIPVisionConfig] = flax.struct.field(
        pytree_node=False, default=None)
    vision_params: Optional[dict] = None

    # ------------------------------------------------------------------
    def splice(self, models):
        """Return ``models`` with this adapter's K/V kernels inserted into
        the UNet param tree (to_k_ip/to_v_ip under every attn2 scope)."""
        ucfg = models.unet_config
        scopes = attn2_scopes(ucfg)
        if len(scopes) != len(self.attn_kernels):
            raise ValueError(
                f"adapter has {len(self.attn_kernels)} attention layers, "
                f"UNet config needs {len(scopes)}")
        unet = flax.core.unfreeze(
            jax.tree.map(lambda x: x, models.params["unet"]))  # deep copy
        tree = unet["params"] if "params" in unet else unet
        for (outer, block, level), (k, v) in zip(scopes, self.attn_kernels):
            inner = ucfg.block_out_channels[level]
            if k.shape[-1] != inner:
                raise ValueError(
                    f"{outer}/{block}: kernel is {k.shape}, UNet level "
                    f"width is {inner} — wrong adapter for this model?")
            attn = tree[outer][block]["attn2"]
            attn["to_k_ip"] = {"kernel": jnp.asarray(k)}
            attn["to_v_ip"] = {"kernel": jnp.asarray(v)}
        params = dict(models.params)
        params["unet"] = unet
        import dataclasses
        return dataclasses.replace(models, params=params)

    # ------------------------------------------------------------------
    def _project(self, image_embeds: jax.Array) -> np.ndarray:
        cross_dim = self.attn_kernels[0][0].shape[0]
        mod = ImageProjection(cross_dim, self.num_tokens)
        return np.asarray(mod.apply(self.proj_params, image_embeds))

    def uncond_tokens(self) -> np.ndarray:
        """Negative-prompt tokens: the projection of a ZERO image embedding
        (the published uncond formulation — not zero tokens)."""
        return self._project(jnp.zeros((1, self.embed_dim), jnp.float32))

    def image_tokens(self, image=None, image_embeds=None) -> np.ndarray:
        """(1, num_tokens, cross_dim) conditioning tokens from a PIL image /
        (H, W, 3) array, or directly from a (B, embed_dim) CLIP image
        embedding."""
        if image_embeds is None:
            if self.vision_params is None:
                raise ValueError("this IPAdapter bundle has no image "
                                 "encoder — pass image_embeds=")
            from PIL import Image as PILImage
            if isinstance(image, (str, Path)):
                image = PILImage.open(image)
            if isinstance(image, PILImage.Image):
                image = np.asarray(image.convert("RGB"), np.float32) / 255.0
            image = np.asarray(image, np.float32)
            if image.max() > 1.5:
                image = image / 255.0
            if image.ndim == 3:
                image = image[None]
            pix = preprocess_clip_image(jnp.asarray(image),
                                        self.vision_config.image_size)
            pooled = CLIPVisionEncoder(self.vision_config).apply(
                self.vision_params["encoder"], pix)
            image_embeds = pooled @ self.vision_params["projection"]
        return self._project(jnp.asarray(image_embeds, jnp.float32))

    # ------------------------------------------------------------------
    @classmethod
    def tiny(cls, unet_config=None, seed: int = 0, perturb: bool = False,
             with_vision: bool = True) -> "IPAdapter":
        """Random tiny adapter matching ``UNetConfig.tiny()`` — zero-init
        K/V kernels (an exact no-op, like a fresh ControlNet) unless
        ``perturb``."""
        from .unet import UNetConfig
        ucfg = unet_config or UNetConfig.tiny()
        embed_dim = 16
        rng = np.random.default_rng(seed)
        proj = ImageProjection(ucfg.cross_attention_dim, 4).init(
            jax.random.PRNGKey(seed), jnp.zeros((1, embed_dim)))
        kernels = []
        for (_, _, level) in attn2_scopes(ucfg):
            inner = ucfg.block_out_channels[level]
            shape = (ucfg.cross_attention_dim, inner)
            if perturb:
                kernels.append((
                    jnp.asarray(rng.normal(0, 0.05, shape), jnp.float32),
                    jnp.asarray(rng.normal(0, 0.05, shape), jnp.float32)))
            else:
                kernels.append((jnp.zeros(shape, jnp.float32),
                                jnp.zeros(shape, jnp.float32)))
        vision_cfg = vision_params = None
        if with_vision:
            vision_cfg = CLIPVisionConfig.tiny()
            enc = CLIPVisionEncoder(vision_cfg).init(
                jax.random.PRNGKey(seed + 1),
                jnp.zeros((1, vision_cfg.image_size,
                           vision_cfg.image_size, 3)))
            proj_m = jnp.asarray(
                rng.normal(0, 0.05, (vision_cfg.hidden_size, embed_dim)),
                jnp.float32)
            vision_params = {"encoder": enc, "projection": proj_m}
        return cls(proj_params=proj, attn_kernels=tuple(kernels),
                   num_tokens=4, embed_dim=embed_dim,
                   vision_config=vision_cfg, vision_params=vision_params)


def _load_ip_state(path) -> dict:
    """IP checkpoints nest two groups; flatten to 'group.key' -> ndarray."""
    path = Path(path)
    if path.suffix == ".safetensors":
        from safetensors.numpy import load_file
        return dict(load_file(str(path)))  # already flat
    import torch
    sd = torch.load(str(path), map_location="cpu", weights_only=True)
    flat = {}
    for group, sub in sd.items():
        if isinstance(sub, dict):
            for k, v in sub.items():
                flat[f"{group}.{k}"] = v.float().numpy()
        else:
            flat[group] = sub.float().numpy()
    return flat


def load_clip_vision_tower(encoder_dir) -> Tuple[CLIPVisionConfig, dict]:
    """transformers ``CLIPVisionModelWithProjection`` directory ->
    (config, {"encoder": flax params, "projection": (D, P) matrix}).

    Key scheme ``vision_model.*`` + ``visual_projection.weight`` — the same
    tower the safety-checker converter handles under its extra
    ``vision_model.`` nesting (``weights.convert_safety_checker``)."""
    import json

    from .weights import _lin, _norm, find_weights_file, load_state_dict
    encoder_dir = Path(encoder_dir)
    cfg_json = json.loads((encoder_dir / "config.json").read_text())
    vc = cfg_json.get("vision_config", cfg_json)
    config = CLIPVisionConfig(
        image_size=vc.get("image_size", 224),
        patch_size=vc.get("patch_size", 14),
        hidden_size=vc.get("hidden_size", 1024),
        intermediate_size=vc.get("intermediate_size", 4096),
        num_layers=vc.get("num_hidden_layers", 24),
        num_heads=vc.get("num_attention_heads", 16),
        projection_dim=cfg_json.get("projection_dim", 768))
    sd = load_state_dict(find_weights_file(encoder_dir))
    pre = "vision_model."
    vis = {
        "patch_embedding": {
            "kernel": np.transpose(
                sd[f"{pre}embeddings.patch_embedding.weight"], (2, 3, 1, 0))},
        "position_embedding": {
            "embedding": sd[f"{pre}embeddings.position_embedding.weight"]},
        "class_embedding": sd[f"{pre}embeddings.class_embedding"],
        "pre_layrnorm": _norm(sd, f"{pre}pre_layrnorm"),
        "post_layernorm": _norm(sd, f"{pre}post_layernorm"),
    }
    for i in range(config.num_layers):
        b = f"{pre}encoder.layers.{i}"
        vis[f"layers_{i}"] = {
            "layer_norm1": _norm(sd, f"{b}.layer_norm1"),
            "q_proj": _lin(sd, f"{b}.self_attn.q_proj"),
            "k_proj": _lin(sd, f"{b}.self_attn.k_proj"),
            "v_proj": _lin(sd, f"{b}.self_attn.v_proj"),
            "out_proj": _lin(sd, f"{b}.self_attn.out_proj"),
            "layer_norm2": _norm(sd, f"{b}.layer_norm2"),
            "fc1": _lin(sd, f"{b}.mlp.fc1"),
            "fc2": _lin(sd, f"{b}.mlp.fc2"),
        }
    projection = np.asarray(sd["visual_projection.weight"], np.float32).T
    return config, {"encoder": {"params": vis},
                    "projection": jnp.asarray(projection)}


def load_ip_adapter(path, models, image_encoder: Optional[str] = None,
                    num_tokens: int = 4) -> IPAdapter:
    """Convert an official IP-Adapter checkpoint (torch .bin/.safetensors
    with ``image_proj`` + ``ip_adapter`` groups) for ``models``'s UNet.

    ``image_encoder``: optional transformers CLIPVisionModelWithProjection
    directory for on-the-fly image embedding; omit to pass precomputed
    ``image_embeds`` at call time."""
    sd = _load_ip_state(path)
    if "image_proj.proj.weight" not in sd:
        raise ValueError(f"{path} is not an IP-Adapter checkpoint "
                         f"(need image_proj + ip_adapter groups)")
    proj_w = np.asarray(sd["image_proj.proj.weight"], np.float32)
    embed_dim = proj_w.shape[1]
    proj_params = {"params": {
        "proj": {"kernel": jnp.asarray(proj_w.T),
                 "bias": jnp.asarray(sd["image_proj.proj.bias"])},
        "norm": {"scale": jnp.asarray(sd["image_proj.norm.weight"]),
                 "bias": jnp.asarray(sd["image_proj.norm.bias"])},
    }}
    scopes = attn2_scopes(models.unet_config)
    n_ckpt = sum(1 for k in sd if k.endswith(".to_k_ip.weight"))
    if n_ckpt != len(scopes):
        raise ValueError(
            f"checkpoint has {n_ckpt} attention layers; this UNet needs "
            f"{len(scopes)} — wrong adapter for this model?")
    kernels = []
    for i in range(len(scopes)):
        idx = 2 * i + 1  # attn2 processors sit at the odd indices
        k = np.asarray(sd[f"ip_adapter.{idx}.to_k_ip.weight"], np.float32)
        v = np.asarray(sd[f"ip_adapter.{idx}.to_v_ip.weight"], np.float32)
        kernels.append((jnp.asarray(k.T), jnp.asarray(v.T)))
    vision_cfg = vision_params = None
    if image_encoder is not None:
        vision_cfg, vision_params = load_clip_vision_tower(image_encoder)
    return IPAdapter(proj_params=proj_params, attn_kernels=tuple(kernels),
                     num_tokens=num_tokens, embed_dim=embed_dim,
                     vision_config=vision_cfg, vision_params=vision_params)
