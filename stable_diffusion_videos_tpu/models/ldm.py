"""Single-file "original layout" checkpoint loading (v1-5-pruned.ckpt style).

The most common community distribution format for Stable Diffusion weights
is one ``.ckpt``/``.safetensors`` file in the CompVis/LDM key scheme
(``model.diffusion_model.*`` / ``first_stage_model.*`` /
``cond_stage_model.*``), not a diffusers-layout directory.  The reference
cannot load these at all — it only accepts diffusers-layout hub ids via
``DiffusionPipeline.from_pretrained`` (reference
``stable_diffusion_pipeline.py:840-858``).  Owning the models means owning
this format too:

* the LDM key scheme is renamed onto the diffusers naming that
  ``models/weights.py`` already converts (one mapping, reused converters);
* the model geometry (levels, widths, heads, transformer depth, context
  dim, SDXL micro-conditioning) is inferred from tensor shapes — SD 1.x,
  SD 2.x and SDXL single files all work with no config JSONs;
* SD 2.x's fused-qkv OpenCLIP text tower is split and renamed to the HF
  CLIP naming (the last resblock is dropped, matching the 23-layer
  truncated tower diffusers ships for SD2).

Single files carry no tokenizer vocab, so ``load_ldm_checkpoint`` takes a
``tokenizer_dir`` (any diffusers-layout ``tokenizer/`` directory with
``vocab.json`` + ``merges.txt``).
"""

from __future__ import annotations

import logging
import re
from pathlib import Path

import jax.numpy as jnp
import numpy as np

logger = logging.getLogger("sdv_tpu")

_UNET_PFX = "model.diffusion_model."
_VAE_PFX = "first_stage_model."
_TEXT_SD1_PFX = "cond_stage_model.transformer."
_TEXT_SD2_PFX = "cond_stage_model.model."
_TEXT_XL1_PFX = "conditioner.embedders.0.transformer."
_TEXT_XL2_PFX = "conditioner.embedders.1.model."


def _sub(sd: dict, prefix: str) -> dict:
    return {k[len(prefix):]: v for k, v in sd.items() if k.startswith(prefix)}


def split_ldm_state_dict(sd: dict) -> dict:
    """Split a flat single-file state dict into per-model sub-dicts with
    their LDM prefixes stripped.  Keys: ``unet``, ``vae``, and depending on
    family ``text`` (SD1/SD2) or ``text``+``text_2`` (SDXL)."""
    out = {"unet": _sub(sd, _UNET_PFX), "vae": _sub(sd, _VAE_PFX)}
    if not out["unet"]:
        raise ValueError(
            "no 'model.diffusion_model.*' keys — not an original-layout "
            "Stable Diffusion checkpoint")
    if any(k.startswith(_TEXT_XL2_PFX) for k in sd):  # SDXL
        out["text"] = _sub(sd, _TEXT_XL1_PFX)
        out["text_2"] = _sub(sd, _TEXT_XL2_PFX)
    elif any(k.startswith(_TEXT_SD2_PFX) for k in sd):  # SD 2.x (OpenCLIP)
        out["text"] = _sub(sd, _TEXT_SD2_PFX)
        out["text_is_openclip"] = True
    else:  # SD 1.x (HF CLIP module embedded as-is)
        out["text"] = _sub(sd, _TEXT_SD1_PFX)
    return out


# ---------------------------------------------------------------------------
# UNet: LDM module-list indices -> diffusers structured names
# ---------------------------------------------------------------------------

_RES_INNER = {
    "in_layers.0": "norm1",
    "in_layers.2": "conv1",
    "emb_layers.1": "time_emb_proj",
    "out_layers.0": "norm2",
    "out_layers.3": "conv2",
    "skip_connection": "conv_shortcut",
}


def _rename_group(sd, old_pfx, new_pfx, table, out):
    """Copy every ``{old_pfx}.{old_inner}.*`` to ``{new_pfx}.{new_inner}.*``."""
    for old_inner, new_inner in table.items():
        for leaf in ("weight", "bias"):
            k = f"{old_pfx}.{old_inner}.{leaf}"
            if k in sd:
                out[f"{new_pfx}.{new_inner}.{leaf}"] = sd[k]


def _rename_passthrough(sd, old_pfx, new_pfx, out):
    """Copy a whole subtree (SpatialTransformer inner names already match
    the diffusers naming: norm/proj_in/transformer_blocks.N.../proj_out)."""
    for k, v in sd.items():
        if k.startswith(old_pfx + "."):
            out[new_pfx + k[len(old_pfx):]] = v


def _block_indices(sd, section: str) -> list[int]:
    idx = {int(m.group(1)) for k in sd
           if (m := re.match(rf"{section}\.(\d+)\.", k))}
    return sorted(idx)


def ldm_unet_to_diffusers(sd: dict) -> dict:
    """``model.diffusion_model.*`` (prefix stripped) -> diffusers UNet
    naming.  Block structure is discovered from the keys themselves:
    ``input_blocks.{i}.0.op`` marks a downsample, a module ``.1`` with
    ``proj_in`` marks a spatial transformer, ``output_blocks.{i}.{m}.conv``
    (m the last module) marks an upsample ending that output level."""
    out = {}
    for leaf in ("weight", "bias"):
        out[f"time_embedding.linear_1.{leaf}"] = sd[f"time_embed.0.{leaf}"]
        out[f"time_embedding.linear_2.{leaf}"] = sd[f"time_embed.2.{leaf}"]
        out[f"conv_in.{leaf}"] = sd[f"input_blocks.0.0.{leaf}"]
        out[f"conv_norm_out.{leaf}"] = sd[f"out.0.{leaf}"]
        out[f"conv_out.{leaf}"] = sd[f"out.2.{leaf}"]
        if f"label_emb.0.0.{leaf}" in sd:  # SDXL text_time micro-cond MLP
            out[f"add_embedding.linear_1.{leaf}"] = sd[f"label_emb.0.0.{leaf}"]
            out[f"add_embedding.linear_2.{leaf}"] = sd[f"label_emb.0.2.{leaf}"]

    # --- input (down) section ---------------------------------------------
    level = j = 0
    for i in _block_indices(sd, "input_blocks"):
        if i == 0:
            continue  # conv_in, handled above
        if f"input_blocks.{i}.0.op.weight" in sd:
            for leaf in ("weight", "bias"):
                out[f"down_blocks.{level}.downsamplers.0.conv.{leaf}"] = \
                    sd[f"input_blocks.{i}.0.op.{leaf}"]
            level += 1
            j = 0
            continue
        _rename_group(sd, f"input_blocks.{i}.0",
                      f"down_blocks.{level}.resnets.{j}", _RES_INNER, out)
        if f"input_blocks.{i}.1.proj_in.weight" in sd:
            _rename_passthrough(sd, f"input_blocks.{i}.1",
                                f"down_blocks.{level}.attentions.{j}", out)
        j += 1

    # --- middle ------------------------------------------------------------
    _rename_group(sd, "middle_block.0", "mid_block.resnets.0",
                  _RES_INNER, out)
    _rename_passthrough(sd, "middle_block.1", "mid_block.attentions.0", out)
    _rename_group(sd, "middle_block.2", "mid_block.resnets.1",
                  _RES_INNER, out)

    # --- output (up) section ------------------------------------------------
    level = j = 0
    for i in _block_indices(sd, "output_blocks"):
        _rename_group(sd, f"output_blocks.{i}.0",
                      f"up_blocks.{level}.resnets.{j}", _RES_INNER, out)
        has_attn = f"output_blocks.{i}.1.proj_in.weight" in sd
        if has_attn:
            _rename_passthrough(sd, f"output_blocks.{i}.1",
                                f"up_blocks.{level}.attentions.{j}", out)
        up_mod = 2 if has_attn else 1
        if f"output_blocks.{i}.{up_mod}.conv.weight" in sd:
            for leaf in ("weight", "bias"):
                out[f"up_blocks.{level}.upsamplers.0.conv.{leaf}"] = \
                    sd[f"output_blocks.{i}.{up_mod}.conv.{leaf}"]
            level += 1
            j = 0
        else:
            j += 1
    return out


# ---------------------------------------------------------------------------
# VAE: ldm AutoencoderKL naming -> diffusers naming
# ---------------------------------------------------------------------------

_VAE_RES_INNER = {
    "norm1": "norm1", "conv1": "conv1", "norm2": "norm2", "conv2": "conv2",
    "nin_shortcut": "conv_shortcut",
}
#: ldm single-head attn -> legacy diffusers names (weights.py `_vae_attn`
#: accepts query/key/value/proj_attn and 1x1-conv-shaped weights)
_VAE_ATTN_INNER = {
    "norm": "group_norm", "q": "query", "k": "key", "v": "value",
    "proj_out": "proj_attn",
}


def _vae_side(sd, side: str, out):
    for leaf in ("weight", "bias"):
        out[f"{side}.conv_in.{leaf}"] = sd[f"{side}.conv_in.{leaf}"]
        out[f"{side}.conv_norm_out.{leaf}"] = sd[f"{side}.norm_out.{leaf}"]
        out[f"{side}.conv_out.{leaf}"] = sd[f"{side}.conv_out.{leaf}"]
    _rename_group(sd, f"{side}.mid.block_1", f"{side}.mid_block.resnets.0",
                  _VAE_RES_INNER, out)
    _rename_group(sd, f"{side}.mid.attn_1", f"{side}.mid_block.attentions.0",
                  _VAE_ATTN_INNER, out)
    _rename_group(sd, f"{side}.mid.block_2", f"{side}.mid_block.resnets.1",
                  _VAE_RES_INNER, out)
    if side == "encoder":
        for lvl in _block_indices(sd, f"{side}.down"):
            pfx = f"{side}.down.{lvl}"
            for j in _block_indices(sd, f"{pfx}.block"):
                _rename_group(sd, f"{pfx}.block.{j}",
                              f"{side}.down_blocks.{lvl}.resnets.{j}",
                              _VAE_RES_INNER, out)
            if f"{pfx}.downsample.conv.weight" in sd:
                for leaf in ("weight", "bias"):
                    out[f"{side}.down_blocks.{lvl}.downsamplers.0.conv"
                        f".{leaf}"] = sd[f"{pfx}.downsample.conv.{leaf}"]
    else:
        # ldm stores decoder levels resolution-indexed (up.0 = highest res);
        # diffusers up_blocks are processing-ordered (up_blocks.0 = deepest)
        levels = _block_indices(sd, f"{side}.up")
        n = len(levels)
        for lvl in levels:
            i = n - 1 - lvl
            pfx = f"{side}.up.{lvl}"
            for j in _block_indices(sd, f"{pfx}.block"):
                _rename_group(sd, f"{pfx}.block.{j}",
                              f"{side}.up_blocks.{i}.resnets.{j}",
                              _VAE_RES_INNER, out)
            if f"{pfx}.upsample.conv.weight" in sd:
                for leaf in ("weight", "bias"):
                    out[f"{side}.up_blocks.{i}.upsamplers.0.conv.{leaf}"] = \
                        sd[f"{pfx}.upsample.conv.{leaf}"]


def ldm_vae_to_diffusers(sd: dict) -> dict:
    out = {}
    _vae_side(sd, "encoder", out)
    _vae_side(sd, "decoder", out)
    for leaf in ("weight", "bias"):
        out[f"quant_conv.{leaf}"] = sd[f"quant_conv.{leaf}"]
        out[f"post_quant_conv.{leaf}"] = sd[f"post_quant_conv.{leaf}"]
    return out


# ---------------------------------------------------------------------------
# OpenCLIP text tower (SD2 / SDXL tower 2) -> HF CLIP naming
# ---------------------------------------------------------------------------

def openclip_text_to_hf(sd: dict, drop_last_layer: bool = False) -> dict:
    """``cond_stage_model.model.*`` / ``conditioner.embedders.1.model.*``
    (prefix stripped) -> HF ``text_model.*`` naming with the fused
    ``attn.in_proj`` split into q/k/v.

    ``drop_last_layer=True`` reproduces the 23-layer tower diffusers ships
    for SD2 (the checkpoint's resblock 23 is unused because SD2 conditions
    on the penultimate hidden state)."""
    out = {
        "text_model.embeddings.token_embedding.weight":
            sd["token_embedding.weight"],
        "text_model.embeddings.position_embedding.weight":
            sd["positional_embedding"],
        "text_model.final_layer_norm.weight": sd["ln_final.weight"],
        "text_model.final_layer_norm.bias": sd["ln_final.bias"],
    }
    if "text_projection" in sd:
        # OpenCLIP applies x @ text_projection (in, out); HF stores the
        # (out, in) Linear weight
        out["text_projection.weight"] = np.transpose(sd["text_projection"])
    layers = _block_indices(sd, "transformer.resblocks")
    if drop_last_layer:
        layers = layers[:-1]
    table = {"ln_1": "layer_norm1", "ln_2": "layer_norm2",
             "mlp.c_fc": "mlp.fc1", "mlp.c_proj": "mlp.fc2",
             "attn.out_proj": "self_attn.out_proj"}
    for i in layers:
        b = f"transformer.resblocks.{i}"
        nb = f"text_model.encoder.layers.{i}"
        _rename_group(sd, b, nb, table, out)
        w3 = sd[f"{b}.attn.in_proj_weight"]
        b3 = sd[f"{b}.attn.in_proj_bias"]
        d = w3.shape[0] // 3
        for part, name in enumerate(("q_proj", "k_proj", "v_proj")):
            out[f"{nb}.self_attn.{name}.weight"] = w3[part * d:(part + 1) * d]
            out[f"{nb}.self_attn.{name}.bias"] = b3[part * d:(part + 1) * d]
    return out


# ---------------------------------------------------------------------------
# Geometry inference from tensor shapes (single files carry no config JSONs)
# ---------------------------------------------------------------------------

def infer_unet_config(dsd: dict, pooled_dim: int | None = None):
    """Build a ``UNetConfig`` from a diffusers-named UNet state dict.

    Heads follow the family convention the checkpoints themselves don't
    record: context 768 (SD1.x) = 8 heads everywhere; wider contexts
    (SD2.x 1024, SDXL 2048) = 64 channels per head at every level."""
    from .unet import UNetConfig

    n_levels = 1 + max(int(m.group(1)) for k in dsd
                       if (m := re.match(r"down_blocks\.(\d+)\.", k)))
    widths = tuple(
        dsd[f"down_blocks.{L}.resnets.0.conv1.weight"].shape[0]
        for L in range(n_levels))
    layers_per_block = 1 + max(
        int(m.group(1)) for k in dsd
        if (m := re.match(r"down_blocks\.0\.resnets\.(\d+)\.", k)))
    attn_levels = tuple(
        f"down_blocks.{L}.attentions.0.proj_in.weight" in dsd
        for L in range(n_levels))

    ctx = None
    depth = []
    for L in range(n_levels):
        if not attn_levels[L]:
            depth.append(0)
            continue
        pfx = f"down_blocks.{L}.attentions.0"
        ctx = dsd[f"{pfx}.transformer_blocks.0.attn2.to_k.weight"].shape[1]
        depth.append(1 + max(
            int(m.group(1)) for k in dsd
            if (m := re.match(rf"{re.escape(pfx)}\.transformer_blocks"
                              r"\.(\d+)\.", k))))
    if ctx is None:
        ctx = dsd["mid_block.attentions.0.transformer_blocks.0.attn2"
                  ".to_k.weight"].shape[1]
    if ctx == 768:  # SD 1.x
        heads = 8
    else:  # SD 2.x / SDXL: d_head = 64 (max(1,) keeps sub-64 test
        # geometries loadable; override attention_head_dim for parity)
        heads = tuple(max(1, w // 64) for w in widths)
    present = [d for d in depth if d] or [1]
    tdepth = present[0] if all(d == present[0] for d in present) \
        else tuple(depth)

    add_dim = add_pooled = None
    num_ids = 6
    if "add_embedding.linear_1.weight" in dsd:  # SDXL
        add_dim = 256
        proj_in = dsd["add_embedding.linear_1.weight"].shape[1]
        if pooled_dim is None:
            pooled_dim = 1280  # OpenCLIP-bigG projection width
        add_pooled = pooled_dim
        num_ids = (proj_in - pooled_dim) // add_dim

    return UNetConfig(
        sample_size=128 if add_dim else 64,
        in_channels=dsd["conv_in.weight"].shape[1],
        out_channels=dsd["conv_out.weight"].shape[0],
        block_out_channels=widths,
        layers_per_block=layers_per_block,
        cross_attention_dim=ctx,
        attention_head_dim=heads,
        attn_levels=attn_levels,
        transformer_depth=tdepth,
        addition_embed_dim=add_dim,
        addition_pooled_dim=add_pooled,
        addition_num_ids=num_ids,
    )


def infer_vae_config(dsd: dict, is_xl: bool = False):
    from .vae import VAEConfig
    n_levels = 1 + max(int(m.group(1)) for k in dsd
                       if (m := re.match(r"encoder\.down_blocks\.(\d+)\.", k)))
    widths = tuple(
        dsd[f"encoder.down_blocks.{L}.resnets.0.conv1.weight"].shape[0]
        for L in range(n_levels))
    layers_per_block = 1 + max(
        int(m.group(1)) for k in dsd
        if (m := re.match(r"encoder\.down_blocks\.0\.resnets\.(\d+)\.", k)))
    return VAEConfig(
        in_channels=dsd["encoder.conv_in.weight"].shape[1],
        out_channels=dsd["decoder.conv_out.weight"].shape[0],
        latent_channels=dsd["post_quant_conv.weight"].shape[1],
        block_out_channels=widths,
        layers_per_block=layers_per_block,
        # single files don't store it; SDXL's retrained VAE uses 0.13025
        scaling_factor=0.13025 if is_xl else 0.18215,
    )


def infer_text_config(tsd: dict, penultimate: bool = False,
                      with_projection: bool = False):
    """HF-named CLIP text state dict -> CLIPTextConfig (shapes only)."""
    from .clip_text import CLIPTextConfig
    emb = tsd["text_model.embeddings.token_embedding.weight"]
    hidden = emb.shape[1]
    num_layers = 1 + max(
        int(m.group(1)) for k in tsd
        if (m := re.match(r"text_model\.encoder\.layers\.(\d+)\.", k)))
    inter = tsd["text_model.encoder.layers.0.mlp.fc1.weight"].shape[0]
    return CLIPTextConfig(
        vocab_size=emb.shape[0],
        hidden_size=hidden,
        intermediate_size=inter,
        num_layers=num_layers,
        # every real family is 64-dim heads (SD1 CLIP-L 768/12, SD2
        # OpenCLIP-H 1024/16, SDXL bigG 1280/20); max(1,) keeps sub-64
        # test geometries loadable (override num_heads for exact parity)
        num_heads=max(1, hidden // 64),
        max_position_embeddings=tsd[
            "text_model.embeddings.position_embedding.weight"].shape[0],
        # OpenCLIP towers (SD2/SDXL-2) use plain gelu; SD1's CLIP quick_gelu
        hidden_act="quick_gelu" if hidden == 768 and not with_projection
                   else "gelu",
        penultimate_hidden=penultimate,
        projection_dim=(tsd["text_projection.weight"].shape[0]
                        if with_projection else None),
    )


# ---------------------------------------------------------------------------
# top-level loader
# ---------------------------------------------------------------------------

def load_ldm_checkpoint(path: str, tokenizer_dir: str | None = None,
                        dtype=jnp.bfloat16, tiled: bool = False,
                        prediction_type: str | None = None, cls=None,
                        unet_overrides: dict | None = None,
                        vae_overrides: dict | None = None,
                        text_overrides: dict | None = None,
                        text2_overrides: dict | None = None):
    """Single ``.ckpt``/``.safetensors`` file -> ``SDModels`` bundle.

    ``tokenizer_dir``: directory with ``vocab.json`` + ``merges.txt`` (single
    files carry no vocab).  ``prediction_type``: "epsilon" (default) or
    "v_prediction" — v-models (SD2-768) are indistinguishable from their
    epsilon siblings by weights alone, so the caller must say.

    ``*_overrides``: ``Config.replace`` fields for what shapes cannot
    determine (head counts follow the SD1/SD2/SDXL family conventions;
    off-family checkpoints can pin them here).
    """
    from ..core.schedulers import SchedulerConfig
    from .bundle import SDModels
    from .tokenizer import CLIPBPETokenizer
    from .weights import (convert_text_encoder, convert_unet, convert_vae,
                          load_state_dict, _to_jnp)

    cls = cls or SDModels
    path = Path(path)
    if not path.is_file():
        raise FileNotFoundError(f"{path} is not a checkpoint file")
    flat = load_state_dict(path)
    # training dumps may carry EMA shadows / optimizer extras alongside
    flat = {k: v for k, v in flat.items() if not k.startswith("model_ema.")}
    parts = split_ldm_state_dict(flat)

    unet_dsd = ldm_unet_to_diffusers(parts["unet"])
    vae_dsd = ldm_vae_to_diffusers(parts["vae"])
    is_xl = "text_2" in parts

    tcfg2 = None
    params = {}
    if is_xl:
        t2 = openclip_text_to_hf(parts["text_2"])
        tcfg2 = infer_text_config(t2, penultimate=True, with_projection=True)
        if text2_overrides:
            tcfg2 = tcfg2.replace(**text2_overrides)
        tcfg = infer_text_config(parts["text"], penultimate=True)
        if text_overrides:
            tcfg = tcfg.replace(**text_overrides)
        params["text_encoder"] = _to_jnp(
            convert_text_encoder(parts["text"], tcfg))
        params["text_encoder_2"] = _to_jnp(convert_text_encoder(t2, tcfg2))
        pooled_dim = tcfg2.projection_dim
    elif parts.get("text_is_openclip"):  # SD 2.x
        t = openclip_text_to_hf(parts["text"], drop_last_layer=True)
        tcfg = infer_text_config(t)
        if text_overrides:
            tcfg = tcfg.replace(**text_overrides)
        params["text_encoder"] = _to_jnp(convert_text_encoder(t, tcfg))
        pooled_dim = None
    else:  # SD 1.x
        tcfg = infer_text_config(parts["text"])
        if text_overrides:
            tcfg = tcfg.replace(**text_overrides)
        params["text_encoder"] = _to_jnp(
            convert_text_encoder(parts["text"], tcfg))
        pooled_dim = None

    ucfg = infer_unet_config(unet_dsd, pooled_dim=pooled_dim)
    if unet_overrides:
        ucfg = ucfg.replace(**unet_overrides)
    vcfg = infer_vae_config(vae_dsd, is_xl=is_xl)
    if vae_overrides:
        vcfg = vcfg.replace(**vae_overrides)
    params["unet"] = _to_jnp(convert_unet(unet_dsd, ucfg))
    params["vae"] = _to_jnp(convert_vae(vae_dsd, vcfg))

    if tokenizer_dir is None:
        raise FileNotFoundError(
            "single-file checkpoints carry no tokenizer vocab; pass "
            "tokenizer_dir= pointing at a diffusers-layout tokenizer/ "
            "directory (vocab.json + merges.txt)")
    tok_dir = Path(tokenizer_dir)
    tokenizer = CLIPBPETokenizer(tok_dir / "vocab.json",
                                 tok_dir / "merges.txt")
    tokenizer_2 = None
    if is_xl:
        tokenizer_2 = CLIPBPETokenizer(tok_dir / "vocab.json",
                                       tok_dir / "merges.txt", pad_token_id=0)

    sched_cfg = SchedulerConfig(
        prediction_type=prediction_type or "epsilon",
        # the SD training schedule; original-layout files don't restate it
        beta_start=0.00085, beta_end=0.012, beta_schedule="scaled_linear",
        steps_offset=1, clip_sample=False, set_alpha_to_one=False,
        skip_prk_steps=True)
    logger.info("loaded single-file checkpoint %s (unet %s%s)", path,
                ucfg.block_out_channels, ", SDXL" if is_xl else "")
    return cls(ucfg, vcfg, tcfg, params, tokenizer, sched_cfg,
               dtype=dtype, tiled=tiled, text_config_2=tcfg2,
               tokenizer_2=tokenizer_2)
