"""Single-file ("original layout") checkpoint loading tests.

The LDM-named state dicts here are synthesised from exported
diffusers-named tensors through *hand-enumerated* key tables for the tiny
geometries — independent of ``models/ldm.py``'s index arithmetic, so a
mapping bug in the loader cannot cancel against an identical bug in the
test.  Reference formats: CompVis/Stability single ``.ckpt``/
``.safetensors`` releases (``model.diffusion_model.*`` etc.), which the
reference repo cannot load at all (diffusers-layout hub ids only,
``stable_diffusion_pipeline.py:840-858``).
"""

import json

import jax
import numpy as np
import pytest

from stable_diffusion_videos_tpu.models.bundle import SDModels
from stable_diffusion_videos_tpu.models.ldm import (
    infer_unet_config, infer_vae_config, ldm_unet_to_diffusers,
    ldm_vae_to_diffusers, load_ldm_checkpoint, openclip_text_to_hf,
    split_ldm_state_dict)
from stable_diffusion_videos_tpu.models.weights import (
    convert_text_encoder, export_text_encoder, export_unet, export_vae)

# ---------------------------------------------------------------------------
# hand tables: diffusers prefix -> LDM prefix for the TINY geometries
# ---------------------------------------------------------------------------

# UNetConfig.tiny: levels (32, 64), layers_per_block=1, attn=(True, False)
_UNET_PREFIX = {
    "time_embedding.linear_1.": "time_embed.0.",
    "time_embedding.linear_2.": "time_embed.2.",
    "conv_in.": "input_blocks.0.0.",
    "down_blocks.0.resnets.0.": "input_blocks.1.0.",
    "down_blocks.0.attentions.0.": "input_blocks.1.1.",
    "down_blocks.0.downsamplers.0.conv.": "input_blocks.2.0.op.",
    "down_blocks.1.resnets.0.": "input_blocks.3.0.",
    "mid_block.resnets.0.": "middle_block.0.",
    "mid_block.attentions.0.": "middle_block.1.",
    "mid_block.resnets.1.": "middle_block.2.",
    # up_blocks.0 = deepest level (64ch, no attn); upsample rides the last
    # block of the level as module 1 (no attention) / 2 (attention)
    "up_blocks.0.resnets.0.": "output_blocks.0.0.",
    "up_blocks.0.resnets.1.": "output_blocks.1.0.",
    "up_blocks.0.upsamplers.0.conv.": "output_blocks.1.1.conv.",
    "up_blocks.1.resnets.0.": "output_blocks.2.0.",
    "up_blocks.1.attentions.0.": "output_blocks.2.1.",
    "up_blocks.1.resnets.1.": "output_blocks.3.0.",
    "up_blocks.1.attentions.1.": "output_blocks.3.1.",
    "conv_norm_out.": "out.0.",
    "conv_out.": "out.2.",
    # SDXL label_emb (tested by the tiny_xl case; unused keys are harmless)
    "add_embedding.linear_1.": "label_emb.0.0.",
    "add_embedding.linear_2.": "label_emb.0.2.",
}

# UNetConfig.tiny_xl: levels (32, 64), lp=1, attn=(False, True), depth (0,2)
_UNET_XL_PREFIX = {
    "time_embedding.linear_1.": "time_embed.0.",
    "time_embedding.linear_2.": "time_embed.2.",
    "conv_in.": "input_blocks.0.0.",
    "down_blocks.0.resnets.0.": "input_blocks.1.0.",
    "down_blocks.0.downsamplers.0.conv.": "input_blocks.2.0.op.",
    "down_blocks.1.resnets.0.": "input_blocks.3.0.",
    "down_blocks.1.attentions.0.": "input_blocks.3.1.",
    "mid_block.resnets.0.": "middle_block.0.",
    "mid_block.attentions.0.": "middle_block.1.",
    "mid_block.resnets.1.": "middle_block.2.",
    "up_blocks.0.resnets.0.": "output_blocks.0.0.",
    "up_blocks.0.attentions.0.": "output_blocks.0.1.",
    "up_blocks.0.resnets.1.": "output_blocks.1.0.",
    "up_blocks.0.attentions.1.": "output_blocks.1.1.",
    "up_blocks.0.upsamplers.0.conv.": "output_blocks.1.2.conv.",
    "up_blocks.1.resnets.0.": "output_blocks.2.0.",
    "up_blocks.1.resnets.1.": "output_blocks.3.0.",
    "conv_norm_out.": "out.0.",
    "conv_out.": "out.2.",
    "add_embedding.linear_1.": "label_emb.0.0.",
    "add_embedding.linear_2.": "label_emb.0.2.",
}

_RESNET_INNER = {
    "norm1.": "in_layers.0.",
    "conv1.": "in_layers.2.",
    "time_emb_proj.": "emb_layers.1.",
    "norm2.": "out_layers.0.",
    "conv2.": "out_layers.3.",
    "conv_shortcut.": "skip_connection.",
}

# VAEConfig.tiny: levels (32, 64), layers_per_block=1
_VAE_PREFIX = {
    "encoder.conv_in.": "encoder.conv_in.",
    "encoder.down_blocks.0.resnets.0.": "encoder.down.0.block.0.",
    "encoder.down_blocks.0.downsamplers.0.conv.":
        "encoder.down.0.downsample.conv.",
    "encoder.down_blocks.1.resnets.0.": "encoder.down.1.block.0.",
    "encoder.mid_block.resnets.0.": "encoder.mid.block_1.",
    "encoder.mid_block.attentions.0.": "encoder.mid.attn_1.",
    "encoder.mid_block.resnets.1.": "encoder.mid.block_2.",
    "encoder.conv_norm_out.": "encoder.norm_out.",
    "encoder.conv_out.": "encoder.conv_out.",
    # ldm decoder levels are resolution-indexed: up.0 = highest res, so
    # diffusers up_blocks.0 (deepest, processed first) = ldm up.1
    "decoder.conv_in.": "decoder.conv_in.",
    "decoder.mid_block.resnets.0.": "decoder.mid.block_1.",
    "decoder.mid_block.attentions.0.": "decoder.mid.attn_1.",
    "decoder.mid_block.resnets.1.": "decoder.mid.block_2.",
    "decoder.up_blocks.0.resnets.0.": "decoder.up.1.block.0.",
    "decoder.up_blocks.0.resnets.1.": "decoder.up.1.block.1.",
    "decoder.up_blocks.0.upsamplers.0.conv.": "decoder.up.1.upsample.conv.",
    "decoder.up_blocks.1.resnets.0.": "decoder.up.0.block.0.",
    "decoder.up_blocks.1.resnets.1.": "decoder.up.0.block.1.",
    "decoder.conv_norm_out.": "decoder.norm_out.",
    "decoder.conv_out.": "decoder.conv_out.",
    "quant_conv.": "quant_conv.",
    "post_quant_conv.": "post_quant_conv.",
}

_VAE_RES_INNER = {"conv_shortcut.": "nin_shortcut."}
_VAE_ATTN_INNER = {  # modern 2-D linears -> ldm 1x1-conv names (reshaped)
    "group_norm.": "norm.", "to_q.": "q.", "to_k.": "k.", "to_v.": "v.",
    "to_out.0.": "proj_out.",
}


def _apply_tables(dsd, prefix_map, inner_tables):
    """diffusers-named dict -> LDM-named dict via the hand tables.
    Inner renames apply only directly after the matched prefix (ldm VAE
    resnets keep the norm1/conv1 names, ldm UNet resnets do not)."""
    out = {}
    for k, v in dsd.items():
        hit = next((p for p in sorted(prefix_map, key=len, reverse=True)
                    if k.startswith(p)), None)
        assert hit is not None, f"untabled key {k}"
        new_pfx, rest = prefix_map[hit], k[len(hit):]
        for table in inner_tables:
            for old_i, new_i in table.items():
                if rest.startswith(old_i):
                    rest = new_i + rest[len(old_i):]
                    break
        out[new_pfx + rest] = v
    return out


def _ldm_unet_sd(dsd, xl=False):
    return _apply_tables(dsd, _UNET_XL_PREFIX if xl else _UNET_PREFIX,
                         (_RESNET_INNER,))


def _ldm_vae_sd(dsd):
    out = _apply_tables(dsd, _VAE_PREFIX,
                        (_VAE_RES_INNER, _VAE_ATTN_INNER))
    # ldm stores the single-head VAE attention as 1x1 convs
    for k in list(out):
        if ".attn_1." in k and k.endswith(".weight") \
                and "norm" not in k and out[k].ndim == 2:
            out[k] = out[k][:, :, None, None]
    return out


def _openclip_text_sd(hf_sd, num_layers, extra_unused_layer=True):
    """HF CLIP naming -> OpenCLIP (cond_stage_model.model.*) naming, with
    the per-layer q/k/v fused into attn.in_proj."""
    out = {
        "token_embedding.weight":
            hf_sd["text_model.embeddings.token_embedding.weight"],
        "positional_embedding":
            hf_sd["text_model.embeddings.position_embedding.weight"],
        "ln_final.weight": hf_sd["text_model.final_layer_norm.weight"],
        "ln_final.bias": hf_sd["text_model.final_layer_norm.bias"],
    }
    if "text_projection.weight" in hf_sd:
        # OpenCLIP stores the (in, out) matrix applied as x @ W
        out["text_projection"] = np.transpose(hf_sd["text_projection.weight"])
    table = {"layer_norm1": "ln_1", "layer_norm2": "ln_2",
             "mlp.fc1": "mlp.c_fc", "mlp.fc2": "mlp.c_proj",
             "self_attn.out_proj": "attn.out_proj"}
    for i in range(num_layers):
        hb = f"text_model.encoder.layers.{i}"
        ob = f"transformer.resblocks.{i}"
        for hf_n, oc_n in table.items():
            for leaf in ("weight", "bias"):
                out[f"{ob}.{oc_n}.{leaf}"] = hf_sd[f"{hb}.{hf_n}.{leaf}"]
        out[f"{ob}.attn.in_proj_weight"] = np.concatenate(
            [hf_sd[f"{hb}.self_attn.{p}.weight"]
             for p in ("q_proj", "k_proj", "v_proj")], axis=0)
        out[f"{ob}.attn.in_proj_bias"] = np.concatenate(
            [hf_sd[f"{hb}.self_attn.{p}.bias"]
             for p in ("q_proj", "k_proj", "v_proj")], axis=0)
    if extra_unused_layer:
        # real SD2 files carry resblock N (unused: SD2 conditions on the
        # penultimate hidden state; diffusers ships the truncated tower)
        d = out["token_embedding.weight"].shape[1]
        last = f"transformer.resblocks.{num_layers}"
        rng = np.random.default_rng(7)
        for n, shape in [("ln_1.weight", (d,)), ("ln_1.bias", (d,)),
                         ("ln_2.weight", (d,)), ("ln_2.bias", (d,)),
                         ("attn.in_proj_weight", (3 * d, d)),
                         ("attn.in_proj_bias", (3 * d,)),
                         ("attn.out_proj.weight", (d, d)),
                         ("attn.out_proj.bias", (d,)),
                         ("mlp.c_fc.weight", (2 * d, d)),
                         ("mlp.c_fc.bias", (2 * d,)),
                         ("mlp.c_proj.weight", (d, 2 * d)),
                         ("mlp.c_proj.bias", (d,))]:
            out[f"{last}.{n}"] = rng.standard_normal(shape).astype(np.float32)
    return out


def _tree_allclose(a, b, path=""):
    if isinstance(a, dict):
        assert set(a) == set(b), \
            f"{path}: keys {sorted(a)} != {sorted(b)}"
        for k in a:
            _tree_allclose(a[k], b[k], f"{path}/{k}")
    else:
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6,
                                   err_msg=path)


def _write_tokenizer(tmp_path):
    vocab = {"<|startoftext|>": 0, "<|endoftext|>": 1,
             "a</w>": 2, "b</w>": 3, "ab</w>": 4}
    d = tmp_path / "tok"
    d.mkdir(exist_ok=True)
    (d / "vocab.json").write_text(json.dumps(vocab))
    (d / "merges.txt").write_text("#version: 0.2\na b</w>\n")
    return d


def _save_single_file(tmp_path, flat, name="model.safetensors"):
    from safetensors.numpy import save_file
    path = tmp_path / name
    # ascontiguousarray: this safetensors build writes the raw buffer and
    # ignores strides, silently scrambling transposed views (the export_*
    # helpers return np.transpose views)
    save_file({k: np.ascontiguousarray(v, np.float32)
               for k, v in flat.items()}, str(path))
    return path


def _f32(tree):
    return jax.tree.map(lambda x: np.asarray(x, np.float32), tree)


# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def tiny():
    return SDModels.tiny()


def _sd1_flat(models):
    """Assemble a complete SD1-style single-file dict from a tiny bundle."""
    unet_d = export_unet(models.params["unet"], models.unet_config)
    vae_d = export_vae(models.params["vae"], models.vae_config)
    text_d = export_text_encoder(models.params["text_encoder"],
                                 models.text_config)
    flat = {}
    flat.update({f"model.diffusion_model.{k}": v
                 for k, v in _ldm_unet_sd(unet_d).items()})
    flat.update({f"first_stage_model.{k}": v
                 for k, v in _ldm_vae_sd(vae_d).items()})
    flat.update({f"cond_stage_model.transformer.{k}": v
                 for k, v in text_d.items()})
    return flat


def test_sd1_single_file_roundtrip(tiny, tmp_path):
    path = _save_single_file(tmp_path, _sd1_flat(tiny))
    loaded = load_ldm_checkpoint(
        path, tokenizer_dir=_write_tokenizer(tmp_path),
        unet_overrides=dict(attention_head_dim=2, sample_size=8),
        text_overrides=dict(num_heads=2, hidden_act="quick_gelu"))
    # inferred geometry
    assert loaded.unet_config.block_out_channels == (32, 64)
    assert loaded.unet_config.attn_levels == (True, False)
    assert loaded.unet_config.cross_attention_dim == 32
    assert loaded.unet_config.layers_per_block == 1
    assert loaded.vae_config.block_out_channels == (32, 64)
    assert loaded.text_config.num_layers == 2
    assert loaded.text_config.hidden_size == 32
    # weights identical to the source bundle
    _tree_allclose(_f32(tiny.params["unet"]), _f32(loaded.params["unet"]))
    _tree_allclose(_f32(tiny.params["vae"]), _f32(loaded.params["vae"]))
    _tree_allclose(_f32(tiny.params["text_encoder"]),
                   _f32(loaded.params["text_encoder"]))


def test_sd1_single_file_forward_matches(tiny, tmp_path):
    """One UNet forward with the reloaded weights must equal the source."""
    import jax.numpy as jnp
    path = _save_single_file(tmp_path, _sd1_flat(tiny))
    loaded = load_ldm_checkpoint(
        path, tokenizer_dir=_write_tokenizer(tmp_path), dtype=jnp.float32,
        unet_overrides=dict(attention_head_dim=2, sample_size=8),
        text_overrides=dict(num_heads=2, hidden_act="quick_gelu"))
    lat = jax.random.normal(jax.random.PRNGKey(0), (1, 8, 8, 4))
    ctx = jax.random.normal(jax.random.PRNGKey(1), (1, 7, 32))
    t = jax.numpy.ones((1,))
    a = tiny.unet().apply(tiny.params["unet"], lat, t, ctx)
    b = loaded.unet().apply(loaded.params["unet"], lat, t, ctx)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_from_pretrained_routes_single_files(tiny, tmp_path):
    path = _save_single_file(tmp_path, _sd1_flat(tiny))
    loaded = SDModels.from_pretrained(
        str(path), tokenizer_dir=_write_tokenizer(tmp_path))
    assert loaded.unet_config.block_out_channels == (32, 64)


def test_single_file_requires_tokenizer_dir(tiny, tmp_path):
    path = _save_single_file(tmp_path, _sd1_flat(tiny))
    with pytest.raises(FileNotFoundError, match="tokenizer"):
        load_ldm_checkpoint(path)


def test_openclip_tower_mapping():
    """Fused-qkv OpenCLIP naming -> HF naming -> our pytree, vs a tower
    exported straight from the flax params."""
    from stable_diffusion_videos_tpu.models.clip_text import (
        CLIPTextConfig, CLIPTextEncoder)
    cfg = CLIPTextConfig.tiny().replace(hidden_act="gelu")
    params = CLIPTextEncoder(cfg).init(
        jax.random.PRNGKey(3), np.zeros((1, 77), np.int32))
    hf = export_text_encoder(params, cfg)
    oc = _openclip_text_sd(hf, cfg.num_layers, extra_unused_layer=True)
    back = openclip_text_to_hf(oc, drop_last_layer=True)
    reloaded = convert_text_encoder(back, cfg)
    _tree_allclose(_f32(params), _f32(reloaded))


def test_sd2_style_single_file(tiny, tmp_path):
    """cond_stage_model.model.* (OpenCLIP) marks the SD2 family; the
    trailing unused resblock is dropped."""
    unet_d = export_unet(tiny.params["unet"], tiny.unet_config)
    vae_d = export_vae(tiny.params["vae"], tiny.vae_config)
    text_d = export_text_encoder(tiny.params["text_encoder"],
                                 tiny.text_config)
    flat = {}
    flat.update({f"model.diffusion_model.{k}": v
                 for k, v in _ldm_unet_sd(unet_d).items()})
    flat.update({f"first_stage_model.{k}": v
                 for k, v in _ldm_vae_sd(vae_d).items()})
    flat.update({f"cond_stage_model.model.{k}": v
                 for k, v in _openclip_text_sd(
                     text_d, tiny.text_config.num_layers).items()})
    path = _save_single_file(tmp_path, flat)
    loaded = load_ldm_checkpoint(
        path, tokenizer_dir=_write_tokenizer(tmp_path),
        prediction_type="v_prediction",
        unet_overrides=dict(attention_head_dim=2, sample_size=8),
        text_overrides=dict(num_heads=2, hidden_act="quick_gelu"))
    assert loaded.scheduler_config.prediction_type == "v_prediction"
    assert loaded.text_config.num_layers == 2  # extra resblock dropped
    _tree_allclose(_f32(tiny.params["text_encoder"]),
                   _f32(loaded.params["text_encoder"]))
    _tree_allclose(_f32(tiny.params["unet"]), _f32(loaded.params["unet"]))


def test_xl_single_file(tmp_path):
    """conditioner.embedders.{0,1} towers + label_emb micro-conditioning."""
    xl = SDModels.tiny_xl()
    unet_d = export_unet(xl.params["unet"], xl.unet_config)
    vae_d = export_vae(xl.params["vae"], xl.vae_config)
    t1 = export_text_encoder(xl.params["text_encoder"], xl.text_config)
    t2 = export_text_encoder(xl.params["text_encoder_2"], xl.text_config_2)
    flat = {}
    flat.update({f"model.diffusion_model.{k}": v
                 for k, v in _ldm_unet_sd(unet_d, xl=True).items()})
    flat.update({f"first_stage_model.{k}": v
                 for k, v in _ldm_vae_sd(vae_d).items()})
    flat.update({f"conditioner.embedders.0.transformer.{k}": v
                 for k, v in t1.items()})
    flat.update({f"conditioner.embedders.1.model.{k}": v
                 for k, v in _openclip_text_sd(
                     t2, xl.text_config_2.num_layers,
                     extra_unused_layer=False).items()})
    path = _save_single_file(tmp_path, flat)
    loaded = load_ldm_checkpoint(
        path, tokenizer_dir=_write_tokenizer(tmp_path),
        unet_overrides=dict(attention_head_dim=2, sample_size=8,
                            addition_embed_dim=8, addition_pooled_dim=16,
                            addition_num_ids=6),
        text_overrides=dict(num_heads=2, hidden_act="quick_gelu"),
        text2_overrides=dict(num_heads=2, hidden_act="quick_gelu"))
    assert loaded.text_config_2 is not None
    assert loaded.unet_config.transformer_depth in (2, (0, 2))
    assert loaded.vae_config.scaling_factor == pytest.approx(0.13025)
    _tree_allclose(_f32(xl.params["unet"]), _f32(loaded.params["unet"]))
    _tree_allclose(_f32(xl.params["text_encoder_2"]),
                   _f32(loaded.params["text_encoder_2"]))


def test_split_rejects_non_sd_files():
    with pytest.raises(ValueError, match="diffusion_model"):
        split_ldm_state_dict({"whatever.weight": np.zeros((1,))})


def test_linear_projection_weights_accepted(tiny):
    """SD2.x/SDXL diffusers+single-file transformers store proj_in/out as
    2-D Linears (use_linear_projection); the converter reshapes them to our
    1x1 convs."""
    from stable_diffusion_videos_tpu.models.weights import convert_unet
    dsd = export_unet(tiny.params["unet"], tiny.unet_config)
    squeezed = {}
    for k, v in dsd.items():
        if ("proj_in.weight" in k or "proj_out.weight" in k) and v.ndim == 4:
            v = v[:, :, 0, 0]
        squeezed[k] = v
    a = convert_unet(dsd, tiny.unet_config)
    b = convert_unet(squeezed, tiny.unet_config)
    _tree_allclose(_f32(a), _f32(b))
