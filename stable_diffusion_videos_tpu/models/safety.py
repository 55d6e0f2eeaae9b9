"""Safety checker — CLIP-vision NSFW concept classifier, TPU-native Flax.

Owns the role of ``diffusers.StableDiffusionSafetyChecker`` (+Flax) in the
reference (``stable_diffusion_pipeline.py:14-16,440-445``;
``flax_stable_diffusion_pipeline.py:15-17,155-191,420-441``): embed each
generated frame with a CLIP ViT, project into the text space, compute cosine
similarity against fixed "concept" embeddings, flag frames whose similarity
exceeds per-concept thresholds, and black out flagged frames.  Optional, as
in the reference (``_optional_components``, ``:63``).
"""

from __future__ import annotations

import flax.linen as nn
import flax.struct
import jax
import jax.numpy as jnp

from ..ops.attention import masked_attention


@flax.struct.dataclass
class CLIPVisionConfig:
    image_size: int = flax.struct.field(pytree_node=False, default=224)
    patch_size: int = flax.struct.field(pytree_node=False, default=14)
    hidden_size: int = flax.struct.field(pytree_node=False, default=1024)
    intermediate_size: int = flax.struct.field(pytree_node=False, default=4096)
    num_layers: int = flax.struct.field(pytree_node=False, default=24)
    num_heads: int = flax.struct.field(pytree_node=False, default=16)
    projection_dim: int = flax.struct.field(pytree_node=False, default=768)
    layer_norm_eps: float = flax.struct.field(pytree_node=False, default=1e-5)

    @classmethod
    def sd_v1(cls):
        return cls()

    @classmethod
    def tiny(cls):
        return cls(image_size=32, patch_size=8, hidden_size=32,
                   intermediate_size=64, num_layers=2, num_heads=2,
                   projection_dim=16)


class _VisionLayer(nn.Module):
    config: CLIPVisionConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        cfg = self.config
        b, s, d = x.shape
        hd = d // cfg.num_heads
        h = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=self.dtype,
                         name="layer_norm1")(x)
        q = nn.Dense(d, dtype=self.dtype, name="q_proj")(h).reshape(b, s, cfg.num_heads, hd)
        k = nn.Dense(d, dtype=self.dtype, name="k_proj")(h).reshape(b, s, cfg.num_heads, hd)
        v = nn.Dense(d, dtype=self.dtype, name="v_proj")(h).reshape(b, s, cfg.num_heads, hd)
        attn = masked_attention(q, k, v, causal=False).reshape(b, s, d)
        x = x + nn.Dense(d, dtype=self.dtype, name="out_proj")(attn)
        h = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=self.dtype,
                         name="layer_norm2")(x)
        h = nn.Dense(cfg.intermediate_size, dtype=self.dtype, name="fc1")(h)
        h = h * jax.nn.sigmoid(1.702 * h)  # quick_gelu
        h = nn.Dense(d, dtype=self.dtype, name="fc2")(h)
        return x + h


class CLIPVisionEncoder(nn.Module):
    """ViT image tower -> pooled (pre-projection) features."""
    config: CLIPVisionConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, pixel_values: jax.Array):
        """pixel_values: (B, H, W, 3), CLIP-normalised. Returns (B, D)."""
        cfg = self.config
        x = nn.Conv(cfg.hidden_size, (cfg.patch_size, cfg.patch_size),
                    strides=(cfg.patch_size, cfg.patch_size), use_bias=False,
                    dtype=self.dtype, name="patch_embedding")(pixel_values)
        b, h, w, d = x.shape
        x = x.reshape(b, h * w, d)
        cls_tok = self.param("class_embedding", nn.initializers.normal(0.02),
                             (d,)).astype(self.dtype)
        x = jnp.concatenate([jnp.broadcast_to(cls_tok, (b, 1, d)), x], axis=1)
        pos = nn.Embed(1 + h * w, d, dtype=self.dtype,
                       name="position_embedding")(jnp.arange(1 + h * w)[None])
        x = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=self.dtype,
                         name="pre_layrnorm")(x + pos)
        for i in range(cfg.num_layers):
            x = _VisionLayer(cfg, dtype=self.dtype, name=f"layers_{i}")(x)
        pooled = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=self.dtype,
                              name="post_layernorm")(x[:, 0])
        return pooled


@flax.struct.dataclass
class SafetyConfig:
    vision: CLIPVisionConfig = flax.struct.field(
        pytree_node=False, default_factory=CLIPVisionConfig)
    num_concepts: int = flax.struct.field(pytree_node=False, default=17)
    num_special: int = flax.struct.field(pytree_node=False, default=3)

    @classmethod
    def sd_v1(cls):
        return cls()

    @classmethod
    def tiny(cls):
        return cls(vision=CLIPVisionConfig.tiny())


class SafetyChecker(nn.Module):
    config: SafetyConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, pixel_values: jax.Array, adjustment: float = 0.0):
        """pixel_values: (B,H,W,3) CLIP-preprocessed frames.
        Returns has_nsfw: (B,) bool.  ``adjustment`` loosens/tightens the
        thresholds (diffusers uses 0.0 strict / -0.01 lenient)."""
        cfg = self.config
        pooled = CLIPVisionEncoder(cfg.vision, dtype=self.dtype,
                                   name="vision_model")(pixel_values)
        emb = nn.Dense(cfg.vision.projection_dim, use_bias=False,
                       dtype=self.dtype, name="visual_projection")(pooled)
        emb = emb / jnp.linalg.norm(emb, axis=-1, keepdims=True)

        concept = self.param("concept_embeds", nn.initializers.normal(0.02),
                             (cfg.num_concepts, cfg.vision.projection_dim))
        concept_thr = self.param("concept_embeds_weights",
                                 nn.initializers.constant(0.5),
                                 (cfg.num_concepts,))
        special = self.param("special_care_embeds",
                             nn.initializers.normal(0.02),
                             (cfg.num_special, cfg.vision.projection_dim))
        special_thr = self.param("special_care_embeds_weights",
                                 nn.initializers.constant(0.5),
                                 (cfg.num_special,))

        def cos(a, b):
            bn = b / jnp.linalg.norm(b, axis=-1, keepdims=True)
            return a @ bn.T

        special_scores = cos(emb, special) - special_thr[None] + adjustment
        has_special = jnp.any(special_scores > 0, axis=1)
        concept_adj = jnp.where(has_special[:, None], 0.01, 0.0)
        concept_scores = (cos(emb, concept) - concept_thr[None]
                          + adjustment + concept_adj)
        return jnp.any(concept_scores > 0, axis=1)


CLIP_IMAGE_MEAN = (0.48145466, 0.4578275, 0.40821073)
CLIP_IMAGE_STD = (0.26862954, 0.26130258, 0.27577711)


def preprocess_for_safety(images: jax.Array, image_size: int) -> jax.Array:
    """(B,H,W,3) float [0,1] frames -> CLIP-normalised (B,S,S,3)."""
    b, h, w, c = images.shape
    x = jax.image.resize(images, (b, image_size, image_size, c), "bilinear")
    mean = jnp.asarray(CLIP_IMAGE_MEAN, images.dtype)
    std = jnp.asarray(CLIP_IMAGE_STD, images.dtype)
    return (x - mean) / std
