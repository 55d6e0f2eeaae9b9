"""Checkpoint conversion: diffusers/transformers SD v1.x -> this framework.

Maps the torch state dicts of a diffusers-layout checkpoint directory
(``unet/``, ``vae/``, ``text_encoder/``, ``tokenizer/``, ``safety_checker/``)
onto the NHWC Flax pytrees of ``models/``:

* conv weights  OIHW -> HWIO
* linear weights (out, in) -> (in, out)
* norm weight/bias -> scale/bias
* embeddings unchanged

The reference gets all of this for free from ``DiffusionPipeline
.from_pretrained`` (``stable_diffusion_pipeline.py:840-858``); owning the
models means owning the converter.  Works from ``.safetensors`` (preferred)
or ``.bin``/``.pth`` (torch pickle, CPU).
"""

from __future__ import annotations

import json
import logging
from pathlib import Path

import jax.numpy as jnp
import numpy as np

logger = logging.getLogger("sdv_tpu")


# ---------------------------------------------------------------------------
# state-dict loading
# ---------------------------------------------------------------------------

def load_state_dict(path: Path) -> dict[str, np.ndarray]:
    path = Path(path)
    if path.suffix == ".safetensors":
        from safetensors.numpy import load_file
        return load_file(str(path))
    import torch
    sd = torch.load(str(path), map_location="cpu", weights_only=True)
    if "params_ema" in sd:  # Real-ESRGAN releases nest under params_ema
        sd = sd["params_ema"]
    elif "params" in sd:
        sd = sd["params"]
    elif "state_dict" in sd:
        sd = sd["state_dict"]
    return {k: v.float().numpy() for k, v in sd.items()}


def find_weights_file(subdir: Path) -> Path:
    for pattern in ("*.safetensors", "*.bin", "*.pth", "*.pt"):
        hits = sorted(subdir.glob(pattern))
        if hits:
            return hits[0]
    raise FileNotFoundError(f"no weights file found under {subdir}")


# ---------------------------------------------------------------------------
# tensor converters
# ---------------------------------------------------------------------------

def t_conv(w):
    return np.transpose(w, (2, 3, 1, 0))  # OIHW -> HWIO


def t_lin(w):
    return np.transpose(w)  # (out, in) -> (in, out)


def _conv(sd, name):
    return {"kernel": t_conv(sd[f"{name}.weight"]),
            "bias": sd[f"{name}.bias"]}


def _conv_nobias(sd, name):
    return {"kernel": t_conv(sd[f"{name}.weight"])}


def _lin(sd, name, bias=True):
    out = {"kernel": t_lin(sd[f"{name}.weight"])}
    if bias:
        out["bias"] = sd[f"{name}.bias"]
    return out


def _norm(sd, name):
    return {"scale": sd[f"{name}.weight"], "bias": sd[f"{name}.bias"]}


def _gn32(sd, name):
    # our GroupNorm32 wraps flax GroupNorm under a child named "norm"
    return {"norm": _norm(sd, name)}


# ---------------------------------------------------------------------------
# UNet
# ---------------------------------------------------------------------------

def _resnet(sd, pfx):
    out = {
        "norm1": _gn32(sd, f"{pfx}.norm1"),
        "conv1": _conv(sd, f"{pfx}.conv1"),
        "norm2": _gn32(sd, f"{pfx}.norm2"),
        "conv2": _conv(sd, f"{pfx}.conv2"),
    }
    if f"{pfx}.time_emb_proj.weight" in sd:
        out["time_emb_proj"] = _lin(sd, f"{pfx}.time_emb_proj")
    if f"{pfx}.conv_shortcut.weight" in sd:
        out["conv_shortcut"] = _conv(sd, f"{pfx}.conv_shortcut")
    return out


def _attn_inner(sd, pfx):
    """CrossAttention: to_q/k/v (no bias) + to_out.0."""
    return {
        "to_q": _lin(sd, f"{pfx}.to_q", bias=False),
        "to_k": _lin(sd, f"{pfx}.to_k", bias=False),
        "to_v": _lin(sd, f"{pfx}.to_v", bias=False),
        "to_out": _lin(sd, f"{pfx}.to_out.0"),
    }


def _conv1x1_or_lin(sd, name):
    """1x1 conv weights, accepting the 2-D Linear form SD2.x/SDXL store
    (``use_linear_projection`` — a Linear over NHWC channels IS a 1x1
    conv; our SpatialTransformer always uses the conv)."""
    w = sd[f"{name}.weight"]
    if w.ndim == 2:
        w = w[:, :, None, None]
    return {"kernel": t_conv(w), "bias": sd[f"{name}.bias"]}


def _transformer(sd, pfx, depth):
    out = {
        "norm": _gn32(sd, f"{pfx}.norm"),
        "proj_in": _conv1x1_or_lin(sd, f"{pfx}.proj_in"),
        "proj_out": _conv1x1_or_lin(sd, f"{pfx}.proj_out"),
    }
    for i in range(depth):
        b = f"{pfx}.transformer_blocks.{i}"
        out[f"blocks_{i}"] = {
            "norm1": _norm(sd, f"{b}.norm1"),
            "attn1": _attn_inner(sd, f"{b}.attn1"),
            "norm2": _norm(sd, f"{b}.norm2"),
            "attn2": _attn_inner(sd, f"{b}.attn2"),
            "norm3": _norm(sd, f"{b}.norm3"),
            "ff": {"proj_in": _lin(sd, f"{b}.ff.net.0.proj"),
                   "proj_out": _lin(sd, f"{b}.ff.net.2")},
        }
    return out


def _unet_trunk(sd: dict, config) -> dict:
    """conv_in + time/add embeddings + down path + mid block — the part a
    diffusers ControlNetModel shares byte-for-byte with UNet2DConditionModel."""
    n = len(config.block_out_channels)
    p = {
        "conv_in": _conv(sd, "conv_in"),
        "time_embedding": {
            "linear_1": _lin(sd, "time_embedding.linear_1"),
            "linear_2": _lin(sd, "time_embedding.linear_2"),
        },
    }
    if config.addition_embed_dim is not None:  # SDXL text_time
        p["add_embedding"] = {
            "linear_1": _lin(sd, "add_embedding.linear_1"),
            "linear_2": _lin(sd, "add_embedding.linear_2"),
        }
    for level in range(n):
        for j in range(config.layers_per_block):
            p[f"down_{level}_res_{j}"] = _resnet(
                sd, f"down_blocks.{level}.resnets.{j}")
            if config.attn_levels[level]:
                p[f"down_{level}_attn_{j}"] = _transformer(
                    sd, f"down_blocks.{level}.attentions.{j}",
                    config.depth(level))
        if level != n - 1:
            p[f"down_{level}_downsample"] = {"conv": _conv(
                sd, f"down_blocks.{level}.downsamplers.0.conv")}
    p["mid_res_0"] = _resnet(sd, "mid_block.resnets.0")
    p["mid_attn"] = _transformer(sd, "mid_block.attentions.0",
                                 config.depth(n - 1))
    p["mid_res_1"] = _resnet(sd, "mid_block.resnets.1")
    return p


def convert_unet(sd: dict, config) -> dict:
    """diffusers UNet2DConditionModel state dict -> our UNet pytree
    (SD 1.x/2.x and SDXL — per-level transformer depth + add_embedding)."""
    n = len(config.block_out_channels)
    p = _unet_trunk(sd, config)
    p["conv_norm_out"] = _gn32(sd, "conv_norm_out")
    p["conv_out"] = _conv(sd, "conv_out")
    for i in range(n):  # diffusers up_blocks[0] is the deepest level
        level = n - 1 - i
        for j in range(config.layers_per_block + 1):
            p[f"up_{level}_res_{j}"] = _resnet(
                sd, f"up_blocks.{i}.resnets.{j}")
            if config.attn_levels[level]:
                p[f"up_{level}_attn_{j}"] = _transformer(
                    sd, f"up_blocks.{i}.attentions.{j}",
                    config.depth(level))
        if i != n - 1:
            p[f"up_{level}_upsample"] = {"conv": _conv(
                sd, f"up_blocks.{i}.upsamplers.0.conv")}
    return {"params": p}


# ---------------------------------------------------------------------------
# ControlNet
# ---------------------------------------------------------------------------

def convert_controlnet(sd: dict, config, cond_channels=(16, 32, 96, 256)
                       ) -> dict:
    """diffusers ControlNetModel state dict -> our ControlNet pytree
    (``models/controlnet.py``): the shared UNet trunk mapping + the
    conditioning embedding + the zero-conv taps."""
    n = len(config.block_out_channels)
    p = _unet_trunk(sd, config)
    emb = {
        "conv_in": _conv(sd, "controlnet_cond_embedding.conv_in"),
        "conv_out": _conv(sd, "controlnet_cond_embedding.conv_out"),
    }
    for i in range(2 * (len(cond_channels) - 1)):
        emb[f"blocks_{i}"] = _conv(sd,
                                   f"controlnet_cond_embedding.blocks.{i}")
    p["cond_embedding"] = emb
    n_skips = 1 + n * config.layers_per_block + (n - 1)
    for i in range(n_skips):
        p[f"zero_conv_{i}"] = _conv(sd, f"controlnet_down_blocks.{i}")
    p["zero_conv_mid"] = _conv(sd, "controlnet_mid_block")
    return {"params": p}


def load_controlnet(path: str, dtype=jnp.float32):
    """diffusers-layout ControlNetModel dir (config.json + weights file) or a
    bare diffusers-naming weights file -> ``ControlNetBundle``.

    Covers the lllyasviel/sd-controlnet-* and diffusers/controlnet-* hub
    layouts; params are kept float32 (compute dtype comes from the engine)."""
    from .controlnet import ControlNetBundle
    root = Path(resolve_checkpoint(str(path)))
    if root.is_dir():
        wfile = find_weights_file(root)
        cfg_json = _read_json(root / "config.json")
    else:
        wfile, cfg_json = root, {}
    sd = load_state_dict(wfile)
    if "conv_in.weight" not in sd:
        raise ValueError(
            f"{wfile} is not a diffusers-layout ControlNetModel state dict "
            "(A1111 'control_model.*' single files are not supported — "
            "convert with diffusers' scripts first)")
    if cfg_json:
        config = _unet_config_from_json(cfg_json)
        cond_channels = tuple(cfg_json.get(
            "conditioning_embedding_out_channels", (16, 32, 96, 256)))
    else:
        # infer geometry from the state dict (mirrors load_sd_checkpoint's
        # shape-driven approach for single files)
        config = _controlnet_config_from_sd(sd)
        blocks = [k for k in sd
                  if k.startswith("controlnet_cond_embedding.blocks.")
                  and k.endswith(".weight")]
        n_pairs = len(blocks) // 2
        chans = [sd["controlnet_cond_embedding.conv_in.weight"].shape[0]]
        for i in range(n_pairs):
            chans.append(
                sd[f"controlnet_cond_embedding.blocks.{2 * i + 1}.weight"]
                .shape[0])
        cond_channels = tuple(chans)
    params = _to_jnp(convert_controlnet(sd, config, cond_channels), dtype)
    return ControlNetBundle(config, params, cond_channels)


def _controlnet_config_from_sd(sd: dict):
    """Geometry straight from diffusers-naming tensor shapes (no config.json)."""
    from .unet import UNetConfig
    chans, level = [], 0
    while f"down_blocks.{level}.resnets.0.conv1.weight" in sd:
        chans.append(sd[f"down_blocks.{level}.resnets.0.conv1.weight"]
                     .shape[0])
        level += 1
    n = len(chans)
    layers = 0
    while f"down_blocks.0.resnets.{layers}.conv1.weight" in sd:
        layers += 1
    attn_levels, heads, depths = [], [], []
    for lv in range(n):
        k = f"down_blocks.{lv}.attentions.0.transformer_blocks.0.attn2.to_k.weight"
        has = k in sd
        attn_levels.append(has)
        d = 0
        while (f"down_blocks.{lv}.attentions.0.transformer_blocks.{d}"
               ".attn1.to_q.weight") in sd:
            d += 1
        depths.append(d)
        heads.append(chans[lv] // 64 if has and chans[lv] % 64 == 0 else 8)
    ctx = next((sd[k].shape[1] for k in sd
                if k.endswith("attn2.to_k.weight")), 768)
    # SD1.x checkpoints use 8 heads everywhere (head_dim = ch/8); detect by
    # context width — 768 => SD1.x family
    head_cfg = 8 if ctx == 768 else tuple(heads)
    add = "add_embedding.linear_1.weight" in sd
    add_dim = 256 if add else None
    pooled = (sd["add_embedding.linear_1.weight"].shape[1] - 6 * 256
              if add else None)
    return UNetConfig(
        in_channels=sd["conv_in.weight"].shape[1],
        block_out_channels=tuple(chans), layers_per_block=layers,
        cross_attention_dim=ctx, attention_head_dim=head_cfg,
        attn_levels=tuple(attn_levels),
        transformer_depth=tuple(max(d, 1) if a else 0
                                for d, a in zip(depths, attn_levels))
        if any(d > 1 for d in depths) else 1,
        addition_embed_dim=add_dim, addition_pooled_dim=pooled)


# ---------------------------------------------------------------------------
# VAE
# ---------------------------------------------------------------------------

def _vae_attn(sd, pfx):
    # modern diffusers names (to_q/...); legacy query/key/value/proj_attn
    if f"{pfx}.to_q.weight" in sd:
        qn, kn, vn, on = "to_q", "to_k", "to_v", "to_out.0"
    else:
        qn, kn, vn, on = "query", "key", "value", "proj_attn"

    def lin_any(name):
        w = sd[f"{pfx}.{name}.weight"]
        if w.ndim == 4:  # some checkpoints store 1x1 convs
            w = w[:, :, 0, 0]
        return {"kernel": t_lin(w), "bias": sd[f"{pfx}.{name}.bias"]}

    return {
        "group_norm": _gn32(sd, f"{pfx}.group_norm"),
        "to_q": lin_any(qn), "to_k": lin_any(kn), "to_v": lin_any(vn),
        "to_out": lin_any(on),
    }


def _vae_encdec(sd, side: str, config) -> dict:
    n = len(config.block_out_channels)
    p = {
        "conv_in": _conv(sd, f"{side}.conv_in"),
        "conv_norm_out": _gn32(sd, f"{side}.conv_norm_out"),
        "conv_out": _conv(sd, f"{side}.conv_out"),
        "mid_res_0": _resnet(sd, f"{side}.mid_block.resnets.0"),
        "mid_attn": _vae_attn(sd, f"{side}.mid_block.attentions.0"),
        "mid_res_1": _resnet(sd, f"{side}.mid_block.resnets.1"),
    }
    if side == "encoder":
        for level in range(n):
            for j in range(config.layers_per_block):
                p[f"down_{level}_res_{j}"] = _resnet(
                    sd, f"{side}.down_blocks.{level}.resnets.{j}")
            if level != n - 1:
                p[f"down_{level}_downsample"] = {"conv": _conv(
                    sd, f"{side}.down_blocks.{level}.downsamplers.0.conv")}
    else:
        for i in range(n):
            level = n - 1 - i
            for j in range(config.layers_per_block + 1):
                p[f"up_{level}_res_{j}"] = _resnet(
                    sd, f"{side}.up_blocks.{i}.resnets.{j}")
            if i != n - 1:
                p[f"up_{level}_upsample"] = {"conv": _conv(
                    sd, f"{side}.up_blocks.{i}.upsamplers.0.conv")}
    return p


def convert_vae(sd: dict, config) -> dict:
    return {"params": {
        "encoder": _vae_encdec(sd, "encoder", config),
        "decoder": _vae_encdec(sd, "decoder", config),
        "quant_conv": _conv(sd, "quant_conv"),
        "post_quant_conv": _conv(sd, "post_quant_conv"),
    }}


# ---------------------------------------------------------------------------
# CLIP text encoder
# ---------------------------------------------------------------------------

def convert_text_encoder(sd: dict, config) -> dict:
    pre = "text_model." if any(k.startswith("text_model.") for k in sd) else ""
    p = {
        "token_embedding": {
            "embedding": sd[f"{pre}embeddings.token_embedding.weight"]},
        "position_embedding": {
            "embedding": sd[f"{pre}embeddings.position_embedding.weight"]},
        "final_layer_norm": _norm(sd, f"{pre}final_layer_norm"),
    }
    if config.projection_dim is not None:
        # CLIPTextModelWithProjection (SDXL tower 2)
        p["text_projection"] = _lin(sd, "text_projection", bias=False)
    for i in range(config.num_layers):
        b = f"{pre}encoder.layers.{i}"
        p[f"layers_{i}"] = {
            "layer_norm1": _norm(sd, f"{b}.layer_norm1"),
            "q_proj": _lin(sd, f"{b}.self_attn.q_proj"),
            "k_proj": _lin(sd, f"{b}.self_attn.k_proj"),
            "v_proj": _lin(sd, f"{b}.self_attn.v_proj"),
            "out_proj": _lin(sd, f"{b}.self_attn.out_proj"),
            "layer_norm2": _norm(sd, f"{b}.layer_norm2"),
            "fc1": _lin(sd, f"{b}.mlp.fc1"),
            "fc2": _lin(sd, f"{b}.mlp.fc2"),
        }
    return {"params": p}


# ---------------------------------------------------------------------------
# Safety checker (CLIP vision + projection + concept embeddings)
# ---------------------------------------------------------------------------

def convert_safety_checker(sd: dict, config) -> dict:
    pre = "vision_model.vision_model."
    vis = {
        "patch_embedding": _conv_nobias(sd, f"{pre}embeddings.patch_embedding"),
        "position_embedding": {
            "embedding": sd[f"{pre}embeddings.position_embedding.weight"]},
        "pre_layrnorm": _norm(sd, f"{pre}pre_layrnorm"),
        "post_layernorm": _norm(sd, f"{pre}post_layernorm"),
    }
    for i in range(config.vision.num_layers):
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
    p = {
        "vision_model": vis,
        "visual_projection": _lin(sd, "visual_projection", bias=False),
        "concept_embeds": sd["concept_embeds"],
        "concept_embeds_weights": sd["concept_embeds_weights"],
        "special_care_embeds": sd["special_care_embeds"],
        "special_care_embeds_weights": sd["special_care_embeds_weights"],
    }
    p["vision_model"]["class_embedding"] = sd[f"{pre}embeddings.class_embedding"]
    return {"params": p}


# ---------------------------------------------------------------------------
# Real-ESRGAN RRDBNet
# ---------------------------------------------------------------------------

def convert_rrdbnet(sd: dict, config) -> dict:
    p = {
        "conv_first": _conv(sd, "conv_first"),
        "conv_body": _conv(sd, "conv_body"),
        "conv_up1": _conv(sd, "conv_up1"),
        "conv_hr": _conv(sd, "conv_hr"),
        "conv_up2": _conv(sd, "conv_up2"),
        "conv_last": _conv(sd, "conv_last"),
    }
    for i in range(config.num_block):
        blk = {}
        for r in (1, 2, 3):
            blk[f"rdb{r}"] = {f"conv{c}": _conv(sd, f"body.{i}.rdb{r}.conv{c}")
                              for c in range(1, 6)}
        p[f"body_{i}"] = blk
    return {"params": p}


def load_realesrgan(path):
    """RealESRGAN .pth/.safetensors -> (RRDBNetConfig, params).

    The official checkpoints wrap the weights in ``params_ema``/``params``;
    geometry (num_feat/num_block/num_grow_ch/scale) is inferred from the
    tensor shapes so x4plus, x2plus and custom RRDBNets all load."""
    from .rrdbnet import RRDBNetConfig
    sd = load_state_dict(Path(path))  # unwraps params_ema/params, -> numpy
    first = sd["conv_first.weight"]
    grow = sd["body.0.rdb1.conv1.weight"]
    last = sd["conv_last.weight"]
    n_block = 1 + max(int(k.split(".")[1]) for k in sd
                      if k.startswith("body."))
    # every official checkpoint has both up convs; the net scale is encoded
    # in conv_first's input width instead (3 -> x4, 12 -> x2 via 2x pixel
    # unshuffle, 48 -> x1 via 4x unshuffle — basicsr rrdbnet_arch semantics)
    first_in = int(first.shape[1])
    scale = {3: 4, 12: 2, 48: 1}.get(first_in, 4)
    cfg = RRDBNetConfig(
        in_channels=first_in // {4: 1, 2: 4, 1: 16}[scale],
        out_channels=int(last.shape[0]),
        num_feat=int(first.shape[0]),
        num_block=n_block,
        num_grow_ch=int(grow.shape[0]),
        scale=scale)
    return cfg, _to_jnp(convert_rrdbnet(sd, cfg))


# ---------------------------------------------------------------------------
# full checkpoint directory
# ---------------------------------------------------------------------------

def _to_jnp(tree, dtype=None):
    import jax
    return jax.tree.map(
        lambda x: jnp.asarray(x, dtype or jnp.float32), tree)


def _unet_config_from_json(cfg: dict):
    from .unet import UNetConfig
    down = cfg.get("down_block_types",
                   ["CrossAttnDownBlock2D"] * 3 + ["DownBlock2D"])
    head = cfg.get("attention_head_dim", 8)
    depth = cfg.get("transformer_layers_per_block", 1)
    add_dim = pooled_dim = None
    if cfg.get("addition_embed_type") == "text_time":  # SDXL
        add_dim = cfg.get("addition_time_embed_dim", 256)
        # projection input = pooled + 6 micro-conditioning sinusoids
        pooled_dim = cfg.get("projection_class_embeddings_input_dim",
                             2816) - 6 * add_dim
    return UNetConfig(
        sample_size=cfg.get("sample_size", 64),
        in_channels=cfg.get("in_channels", 4),
        out_channels=cfg.get("out_channels", 4),
        block_out_channels=tuple(cfg.get("block_out_channels",
                                         (320, 640, 1280, 1280))),
        layers_per_block=cfg.get("layers_per_block", 2),
        cross_attention_dim=cfg.get("cross_attention_dim", 768),
        attention_head_dim=head if isinstance(head, int) else tuple(head),
        attn_levels=tuple(t == "CrossAttnDownBlock2D" for t in down),
        transformer_depth=depth if isinstance(depth, int) else tuple(depth),
        flip_sin_to_cos=cfg.get("flip_sin_to_cos", True),
        freq_shift=cfg.get("freq_shift", 0),
        addition_embed_dim=add_dim,
        addition_pooled_dim=pooled_dim,
    )


def _vae_config_from_json(cfg: dict):
    from .vae import VAEConfig
    return VAEConfig(
        in_channels=cfg.get("in_channels", 3),
        out_channels=cfg.get("out_channels", 3),
        latent_channels=cfg.get("latent_channels", 4),
        block_out_channels=tuple(cfg.get("block_out_channels",
                                         (128, 256, 512, 512))),
        layers_per_block=cfg.get("layers_per_block", 2),
        scaling_factor=cfg.get("scaling_factor", 0.18215),
    )


def _text_config_from_json(cfg: dict, penultimate: bool = False,
                           with_projection: bool = False):
    from .clip_text import CLIPTextConfig
    return CLIPTextConfig(
        vocab_size=cfg.get("vocab_size", 49408),
        hidden_size=cfg.get("hidden_size", 768),
        intermediate_size=cfg.get("intermediate_size", 3072),
        num_layers=cfg.get("num_hidden_layers", 12),
        num_heads=cfg.get("num_attention_heads", 12),
        max_position_embeddings=cfg.get("max_position_embeddings", 77),
        hidden_act=cfg.get("hidden_act", "quick_gelu"),
        penultimate_hidden=penultimate,
        projection_dim=(cfg.get("projection_dim", 1280) if with_projection
                        else None),
    )


def _read_json(path: Path) -> dict:
    return json.loads(path.read_text()) if path.exists() else {}


#: weight/config files worth pulling from a hub snapshot (skips .ckpt dumps)
_HUB_ALLOW_PATTERNS = ["*.json", "*.txt", "*.safetensors", "*.bin"]


def resolve_checkpoint(path_or_id: str, cache_dir=None,
                       revision=None) -> Path:
    """Local diffusers-layout dir, or a hub id such as
    ``CompVis/stable-diffusion-v1-4`` (the reference's ``from_pretrained``
    argument, ``stable_diffusion_pipeline.py:856-858``).

    A non-local path matching ``org/name`` is fetched with
    ``huggingface_hub.snapshot_download``; when the hub is unreachable (this
    build environment has no egress) the error says so clearly instead of
    surfacing a socket traceback."""
    import re

    root = Path(path_or_id)
    if root.exists():
        return root
    if not re.fullmatch(r"[\w.\-]+/[\w.\-]+", str(path_or_id)):
        raise FileNotFoundError(
            f"{path_or_id!r} is neither a local diffusers-layout directory "
            "nor a hub id of the form 'org/name'")
    try:
        from huggingface_hub import snapshot_download
    except ImportError as e:
        raise FileNotFoundError(
            f"{path_or_id!r} is not a local directory and huggingface_hub "
            "is not installed to download it") from e
    try:
        return Path(snapshot_download(repo_id=path_or_id, revision=revision,
                                      cache_dir=cache_dir,
                                      allow_patterns=_HUB_ALLOW_PATTERNS))
    except Exception as e:
        raise FileNotFoundError(
            f"could not download {path_or_id!r} from the Hugging Face hub "
            f"(offline or repo missing): {type(e).__name__}: {e}") from e


def load_sd_checkpoint(path: str, dtype=jnp.bfloat16, tiled: bool = False,
                       with_safety: bool = True, cls=None):
    """diffusers-layout checkpoint dir OR hub id -> SDModels bundle."""
    from ..core.schedulers import SchedulerConfig
    from .bundle import SDModels
    from .safety import SafetyConfig
    from .tokenizer import CLIPBPETokenizer

    cls = cls or SDModels
    root = resolve_checkpoint(path)

    ucfg = _unet_config_from_json(_read_json(root / "unet" / "config.json"))
    vcfg = _vae_config_from_json(_read_json(root / "vae" / "config.json"))
    is_xl = ucfg.addition_embed_dim is not None \
        or (root / "text_encoder_2").exists()
    # the SDXL-refiner ships ONLY the bigG tower (text_encoder_2); its
    # context comes from that tower alone
    has_tower1 = (root / "text_encoder").exists()
    tcfg = None
    params = {
        "unet": _to_jnp(convert_unet(
            load_state_dict(find_weights_file(root / "unet")), ucfg)),
        "vae": _to_jnp(convert_vae(
            load_state_dict(find_weights_file(root / "vae")), vcfg)),
    }
    if has_tower1:
        tcfg = _text_config_from_json(
            _read_json(root / "text_encoder" / "config.json"),
            penultimate=is_xl)
        params["text_encoder"] = _to_jnp(convert_text_encoder(
            load_state_dict(find_weights_file(root / "text_encoder")), tcfg))
    tcfg2 = None
    if is_xl:
        # SDXL: OpenCLIP-bigG second tower with projected pooled output
        tcfg2 = _text_config_from_json(
            _read_json(root / "text_encoder_2" / "config.json"),
            penultimate=True, with_projection=True)
        params["text_encoder_2"] = _to_jnp(convert_text_encoder(
            load_state_dict(find_weights_file(root / "text_encoder_2")),
            tcfg2))
        if not has_tower1:  # refiner: tower 2 is the only (and primary) one
            tcfg = tcfg2
            params["text_encoder"] = params["text_encoder_2"]
        # the UNet json gives only pooled+ids as one projection width;
        # tower 2's projection_dim pins the split (base: 2816-1280=6x256,
        # refiner: 2560-1280=5x256 — the fifth id is the aesthetic score)
        proj_in = ucfg.addition_pooled_dim + 6 * ucfg.addition_embed_dim
        num_ids = (proj_in - tcfg2.projection_dim) // ucfg.addition_embed_dim
        ucfg = ucfg.replace(addition_pooled_dim=tcfg2.projection_dim,
                            addition_num_ids=num_ids)
    safety_cfg = None
    if with_safety and (root / "safety_checker").exists():
        safety_cfg = SafetyConfig.sd_v1()
        params["safety_checker"] = _to_jnp(convert_safety_checker(
            load_state_dict(find_weights_file(root / "safety_checker")),
            safety_cfg))

    if tcfg is None:
        raise FileNotFoundError(f"{root} has no text_encoder/ (and no "
                                "text_encoder_2/ to fall back on)")

    tok_dir = root / "tokenizer"
    if not (tok_dir / "vocab.json").exists() \
            and (root / "tokenizer_2" / "vocab.json").exists():
        tok_dir = root / "tokenizer_2"  # refiner layout
    tokenizer = CLIPBPETokenizer(tok_dir / "vocab.json",
                                 tok_dir / "merges.txt")
    tokenizer_2 = None
    if is_xl:
        # SDXL's tokenizer_2 shares the BPE but pads with 0 ("!") not eos
        tok2_dir = root / "tokenizer_2"
        if not (tok2_dir / "vocab.json").exists():
            tok2_dir = tok_dir
        tokenizer_2 = CLIPBPETokenizer(tok2_dir / "vocab.json",
                                       tok2_dir / "merges.txt",
                                       pad_token_id=0)

    scfg_json = _read_json(root / "scheduler" / "scheduler_config.json")
    sched_cfg = SchedulerConfig(
        num_train_timesteps=scfg_json.get("num_train_timesteps", 1000),
        beta_start=scfg_json.get("beta_start", 0.00085),
        beta_end=scfg_json.get("beta_end", 0.012),
        beta_schedule=scfg_json.get("beta_schedule", "scaled_linear"),
        prediction_type=scfg_json.get("prediction_type", "epsilon"),
        steps_offset=scfg_json.get("steps_offset", 1),
        clip_sample=scfg_json.get("clip_sample", False),
        set_alpha_to_one=scfg_json.get("set_alpha_to_one", False),
        skip_prk_steps=scfg_json.get("skip_prk_steps", True),
        timestep_spacing=scfg_json.get("timestep_spacing", "leading"),
        rescale_betas_zero_snr=scfg_json.get("rescale_betas_zero_snr",
                                             False),
    )
    logger.info("loaded checkpoint %s (unet %s, vae %s%s)", root,
                ucfg.block_out_channels, vcfg.block_out_channels,
                ", SDXL" if is_xl else "")
    return cls(ucfg, vcfg, tcfg, params, tokenizer, sched_cfg,
               safety_config=safety_cfg, dtype=dtype, tiled=tiled,
               text_config_2=tcfg2, tokenizer_2=tokenizer_2)


# ---------------------------------------------------------------------------
# Inverse direction: export our pytrees to diffusers/torch state-dict naming.
# Used for (a) diffusers interop and (b) round-trip tests of the converter.
# ---------------------------------------------------------------------------

def _inv_conv(p, name, out):
    out[f"{name}.weight"] = np.transpose(np.asarray(p["kernel"]), (3, 2, 0, 1))
    if "bias" in p:
        out[f"{name}.bias"] = np.asarray(p["bias"])


def _inv_lin(p, name, out):
    out[f"{name}.weight"] = np.transpose(np.asarray(p["kernel"]))
    if "bias" in p:
        out[f"{name}.bias"] = np.asarray(p["bias"])


def _inv_norm(p, name, out):
    out[f"{name}.weight"] = np.asarray(p["scale"])
    out[f"{name}.bias"] = np.asarray(p["bias"])


def _inv_gn32(p, name, out):
    _inv_norm(p["norm"], name, out)


def _inv_resnet(p, pfx, out):
    _inv_gn32(p["norm1"], f"{pfx}.norm1", out)
    _inv_conv(p["conv1"], f"{pfx}.conv1", out)
    _inv_gn32(p["norm2"], f"{pfx}.norm2", out)
    _inv_conv(p["conv2"], f"{pfx}.conv2", out)
    if "time_emb_proj" in p:
        _inv_lin(p["time_emb_proj"], f"{pfx}.time_emb_proj", out)
    if "conv_shortcut" in p:
        _inv_conv(p["conv_shortcut"], f"{pfx}.conv_shortcut", out)


def _inv_attn_inner(p, pfx, out):
    _inv_lin(p["to_q"], f"{pfx}.to_q", out)
    _inv_lin(p["to_k"], f"{pfx}.to_k", out)
    _inv_lin(p["to_v"], f"{pfx}.to_v", out)
    _inv_lin(p["to_out"], f"{pfx}.to_out.0", out)


def _inv_transformer(p, pfx, depth, out):
    _inv_gn32(p["norm"], f"{pfx}.norm", out)
    _inv_conv(p["proj_in"], f"{pfx}.proj_in", out)
    _inv_conv(p["proj_out"], f"{pfx}.proj_out", out)
    for i in range(depth):
        b = f"{pfx}.transformer_blocks.{i}"
        blk = p[f"blocks_{i}"]
        _inv_norm(blk["norm1"], f"{b}.norm1", out)
        _inv_attn_inner(blk["attn1"], f"{b}.attn1", out)
        _inv_norm(blk["norm2"], f"{b}.norm2", out)
        _inv_attn_inner(blk["attn2"], f"{b}.attn2", out)
        _inv_norm(blk["norm3"], f"{b}.norm3", out)
        _inv_lin(blk["ff"]["proj_in"], f"{b}.ff.net.0.proj", out)
        _inv_lin(blk["ff"]["proj_out"], f"{b}.ff.net.2", out)


def export_unet(params: dict, config) -> dict[str, np.ndarray]:
    p = params["params"]
    out: dict[str, np.ndarray] = {}
    _inv_conv(p["conv_in"], "conv_in", out)
    _inv_lin(p["time_embedding"]["linear_1"], "time_embedding.linear_1", out)
    _inv_lin(p["time_embedding"]["linear_2"], "time_embedding.linear_2", out)
    if "add_embedding" in p:  # SDXL text_time
        _inv_lin(p["add_embedding"]["linear_1"], "add_embedding.linear_1", out)
        _inv_lin(p["add_embedding"]["linear_2"], "add_embedding.linear_2", out)
    _inv_gn32(p["conv_norm_out"], "conv_norm_out", out)
    _inv_conv(p["conv_out"], "conv_out", out)
    n = len(config.block_out_channels)
    for level in range(n):
        for j in range(config.layers_per_block):
            _inv_resnet(p[f"down_{level}_res_{j}"],
                        f"down_blocks.{level}.resnets.{j}", out)
            if config.attn_levels[level]:
                _inv_transformer(p[f"down_{level}_attn_{j}"],
                                 f"down_blocks.{level}.attentions.{j}",
                                 config.depth(level), out)
        if level != n - 1:
            _inv_conv(p[f"down_{level}_downsample"]["conv"],
                      f"down_blocks.{level}.downsamplers.0.conv", out)
    _inv_resnet(p["mid_res_0"], "mid_block.resnets.0", out)
    _inv_transformer(p["mid_attn"], "mid_block.attentions.0",
                     config.depth(n - 1), out)
    _inv_resnet(p["mid_res_1"], "mid_block.resnets.1", out)
    for i in range(n):
        level = n - 1 - i
        for j in range(config.layers_per_block + 1):
            _inv_resnet(p[f"up_{level}_res_{j}"],
                        f"up_blocks.{i}.resnets.{j}", out)
            if config.attn_levels[level]:
                _inv_transformer(p[f"up_{level}_attn_{j}"],
                                 f"up_blocks.{i}.attentions.{j}",
                                 config.depth(level), out)
        if i != n - 1:
            _inv_conv(p[f"up_{level}_upsample"]["conv"],
                      f"up_blocks.{i}.upsamplers.0.conv", out)
    return out


def export_vae(params: dict, config) -> dict[str, np.ndarray]:
    out: dict[str, np.ndarray] = {}
    n = len(config.block_out_channels)
    for side in ("encoder", "decoder"):
        p = params["params"][side]
        _inv_conv(p["conv_in"], f"{side}.conv_in", out)
        _inv_gn32(p["conv_norm_out"], f"{side}.conv_norm_out", out)
        _inv_conv(p["conv_out"], f"{side}.conv_out", out)
        _inv_resnet(p["mid_res_0"], f"{side}.mid_block.resnets.0", out)
        _inv_resnet(p["mid_res_1"], f"{side}.mid_block.resnets.1", out)
        a = p["mid_attn"]
        apfx = f"{side}.mid_block.attentions.0"
        _inv_gn32(a["group_norm"], f"{apfx}.group_norm", out)
        _inv_lin(a["to_q"], f"{apfx}.to_q", out)
        _inv_lin(a["to_k"], f"{apfx}.to_k", out)
        _inv_lin(a["to_v"], f"{apfx}.to_v", out)
        _inv_lin(a["to_out"], f"{apfx}.to_out.0", out)
        if side == "encoder":
            for level in range(n):
                for j in range(config.layers_per_block):
                    _inv_resnet(p[f"down_{level}_res_{j}"],
                                f"{side}.down_blocks.{level}.resnets.{j}", out)
                if level != n - 1:
                    _inv_conv(p[f"down_{level}_downsample"]["conv"],
                              f"{side}.down_blocks.{level}.downsamplers.0.conv",
                              out)
        else:
            for i in range(n):
                level = n - 1 - i
                for j in range(config.layers_per_block + 1):
                    _inv_resnet(p[f"up_{level}_res_{j}"],
                                f"{side}.up_blocks.{i}.resnets.{j}", out)
                if i != n - 1:
                    _inv_conv(p[f"up_{level}_upsample"]["conv"],
                              f"{side}.up_blocks.{i}.upsamplers.0.conv", out)
    _inv_conv(params["params"]["quant_conv"], "quant_conv", out)
    _inv_conv(params["params"]["post_quant_conv"], "post_quant_conv", out)
    return out


def export_text_encoder(params: dict, config) -> dict[str, np.ndarray]:
    p = params["params"]
    out: dict[str, np.ndarray] = {
        "text_model.embeddings.token_embedding.weight":
            np.asarray(p["token_embedding"]["embedding"]),
        "text_model.embeddings.position_embedding.weight":
            np.asarray(p["position_embedding"]["embedding"]),
    }
    _inv_norm(p["final_layer_norm"], "text_model.final_layer_norm", out)
    if "text_projection" in p:
        _inv_lin(p["text_projection"], "text_projection", out)
    for i in range(config.num_layers):
        b = f"text_model.encoder.layers.{i}"
        blk = p[f"layers_{i}"]
        _inv_norm(blk["layer_norm1"], f"{b}.layer_norm1", out)
        _inv_lin(blk["q_proj"], f"{b}.self_attn.q_proj", out)
        _inv_lin(blk["k_proj"], f"{b}.self_attn.k_proj", out)
        _inv_lin(blk["v_proj"], f"{b}.self_attn.v_proj", out)
        _inv_lin(blk["out_proj"], f"{b}.self_attn.out_proj", out)
        _inv_norm(blk["layer_norm2"], f"{b}.layer_norm2", out)
        _inv_lin(blk["fc1"], f"{b}.mlp.fc1", out)
        _inv_lin(blk["fc2"], f"{b}.mlp.fc2", out)
    return out
