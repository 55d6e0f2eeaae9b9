"""CLIP text encoder — prompt embedding, TPU-native Flax.

Owns the role the reference delegates to ``transformers.CLIPTextModel`` (+
Flax variant) — 77-token prompt embedding, once per walk endpoint (reference
``stable_diffusion_pipeline.py:28,291-306,809-820``;
``flax_stable_diffusion_pipeline.py:30,140-153,860-866``).

Standard CLIP text transformer: token + learned position embeddings, L
pre-LN blocks with causal self-attention and quick-GELU MLP, final LayerNorm.
The SD pipeline consumes ``last_hidden_state``; the pooled output (EOS token
features) feeds the safety checker's vision-text space.
"""

from __future__ import annotations

from typing import Union

import flax.linen as nn
import flax.struct
import jax
import jax.numpy as jnp

from ..ops.attention import masked_attention


@flax.struct.dataclass
class CLIPTextConfig:
    vocab_size: int = flax.struct.field(pytree_node=False, default=49408)
    hidden_size: int = flax.struct.field(pytree_node=False, default=768)
    intermediate_size: int = flax.struct.field(pytree_node=False, default=3072)
    num_layers: int = flax.struct.field(pytree_node=False, default=12)
    num_heads: int = flax.struct.field(pytree_node=False, default=12)
    max_position_embeddings: int = flax.struct.field(pytree_node=False, default=77)
    layer_norm_eps: float = flax.struct.field(pytree_node=False, default=1e-5)
    #: "quick_gelu" (OpenAI CLIP, SD1.x) or "gelu" (OpenCLIP-H, SD2.x)
    hidden_act: str = flax.struct.field(pytree_node=False,
                                        default="quick_gelu")
    #: return the PENULTIMATE layer's hidden state (pre final-LN) as the
    #: sequence output — SDXL consumes hidden_states[-2] from both towers
    #: (the pooled output still comes from the full tower + final LN)
    penultimate_hidden: bool = flax.struct.field(pytree_node=False,
                                                 default=False)
    #: apply a bias-free text_projection to the pooled output (OpenCLIP
    #: towers whose pooled embedding feeds SDXL's addition conditioning)
    projection_dim: Union[int, None] = flax.struct.field(pytree_node=False,
                                                         default=None)
    #: explicit EOS id for the pooled-output lookup.  None keeps CLIP's
    #: classic ``argmax(input_ids)`` (EOS is the highest id in the stock
    #: vocab); it MUST be set once the vocab is extended past EOS
    #: (textual-inversion tokens), where argmax would pick the new ids
    eos_token_id: Union[int, None] = flax.struct.field(pytree_node=False,
                                                       default=None)

    @classmethod
    def sd_v1(cls):
        """openai/clip-vit-large-patch14 text tower (SD v1.x)."""
        return cls()

    @classmethod
    def sd_xl_l(cls):
        """SDXL tower 1: CLIP ViT-L, penultimate hidden states."""
        return cls(penultimate_hidden=True)

    @classmethod
    def sd_xl_g(cls):
        """SDXL tower 2: OpenCLIP ViT-bigG — penultimate hidden states plus
        the projected pooled embedding that feeds text_time conditioning."""
        return cls(hidden_size=1280, intermediate_size=5120, num_layers=32,
                   num_heads=20, hidden_act="gelu", penultimate_hidden=True,
                   projection_dim=1280)

    @classmethod
    def sd_v2(cls):
        """OpenCLIP ViT-H text tower as shipped with SD v2.x checkpoints
        (23 transformer layers = penultimate-layer output, plain gelu)."""
        return cls(hidden_size=1024, intermediate_size=4096, num_layers=23,
                   num_heads=16, hidden_act="gelu")

    @classmethod
    def tiny(cls):
        return cls(vocab_size=1000, hidden_size=32, intermediate_size=64,
                   num_layers=2, num_heads=2)


def quick_gelu(x):
    return x * jax.nn.sigmoid(1.702 * x)


class CLIPEncoderLayer(nn.Module):
    config: CLIPTextConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        cfg = self.config
        h = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=self.dtype,
                         name="layer_norm1")(x)
        b, s, d = h.shape
        hd = d // cfg.num_heads
        q = nn.Dense(d, dtype=self.dtype, name="q_proj")(h)
        k = nn.Dense(d, dtype=self.dtype, name="k_proj")(h)
        v = nn.Dense(d, dtype=self.dtype, name="v_proj")(h)
        q = q.reshape(b, s, cfg.num_heads, hd)
        k = k.reshape(b, s, cfg.num_heads, hd)
        v = v.reshape(b, s, cfg.num_heads, hd)
        attn = masked_attention(q, k, v, causal=True).reshape(b, s, d)
        x = x + nn.Dense(d, dtype=self.dtype, name="out_proj")(attn)

        h = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=self.dtype,
                         name="layer_norm2")(x)
        h = nn.Dense(cfg.intermediate_size, dtype=self.dtype, name="fc1")(h)
        h = (quick_gelu(h) if cfg.hidden_act == "quick_gelu"
             else nn.gelu(h, approximate=False))
        h = nn.Dense(d, dtype=self.dtype, name="fc2")(h)
        return x + h


class CLIPTextEncoder(nn.Module):
    config: CLIPTextConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, input_ids: jax.Array):
        """input_ids: (B, S) int32 -> (last_hidden_state (B,S,D), pooled (B,D))."""
        cfg = self.config
        tok = nn.Embed(cfg.vocab_size, cfg.hidden_size, dtype=self.dtype,
                       name="token_embedding")(input_ids)
        pos_ids = jnp.arange(input_ids.shape[1])[None, :]
        pos = nn.Embed(cfg.max_position_embeddings, cfg.hidden_size,
                       dtype=self.dtype, name="position_embedding")(pos_ids)
        x = tok + pos
        penult = x
        for i in range(cfg.num_layers):
            x = CLIPEncoderLayer(cfg, dtype=self.dtype, name=f"layers_{i}")(x)
            if i == cfg.num_layers - 2:
                penult = x  # HF hidden_states[-2]: after layer L-1, pre-LN
        x = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=self.dtype,
                         name="final_layer_norm")(x)
        # pooled output: features at the EOS token.  Stock vocab: EOS is the
        # highest id, argmax finds its first occurrence; an extended vocab
        # (textual inversion) carries ids above EOS, so the config pins the
        # id and we take the first exact match instead.
        if cfg.eos_token_id is None:
            eos_idx = jnp.argmax(input_ids, axis=-1)
        else:
            eos_idx = jnp.argmax(
                (input_ids == cfg.eos_token_id).astype(jnp.int32), axis=-1)
        pooled = x[jnp.arange(x.shape[0]), eos_idx]
        if cfg.projection_dim is not None:
            pooled = nn.Dense(cfg.projection_dim, use_bias=False,
                              dtype=self.dtype, name="text_projection")(pooled)
        return (penult if cfg.penultimate_hidden else x), pooled
