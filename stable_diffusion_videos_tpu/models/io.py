"""Bundle save/load in this framework's native format.

``SDModels.from_pretrained`` converts a torch/diffusers checkpoint on every
load; ``save_bundle``/``load_bundle`` persist the converted NHWC pytrees
(msgpack via flax.serialization) plus all configs, so subsequent loads skip
conversion entirely and stream straight to device.
"""

from __future__ import annotations

import dataclasses
import json
from pathlib import Path

import flax.serialization
import jax
import jax.numpy as jnp
import numpy as np

FORMAT_VERSION = 1


def _cfg_to_dict(cfg) -> dict:
    out = {}
    for f in dataclasses.fields(cfg):
        v = getattr(cfg, f.name)
        if dataclasses.is_dataclass(v):
            v = _cfg_to_dict(v)
        elif isinstance(v, tuple):
            v = list(v)
        out[f.name] = v
    return out


def save_bundle(models, path) -> str:
    """Write an SDModels bundle to ``path/`` (one .msgpack per component +
    bundle.json).  Tokenizer vocab files are copied when the tokenizer is
    file-backed."""
    from .tokenizer import CLIPBPETokenizer, TextualInversionTokenizer

    def unwrap(tok):
        return tok.base if isinstance(tok, TextualInversionTokenizer) \
            else tok

    def triggers(tok):
        return tok.triggers if isinstance(tok, TextualInversionTokenizer) \
            else None

    base_tok = unwrap(models.tokenizer)
    base_tok2 = unwrap(models.tokenizer_2) if models.tokenizer_2 else None

    path = Path(path)
    path.mkdir(parents=True, exist_ok=True)
    meta = {
        "format_version": FORMAT_VERSION,
        "dtype": jnp.dtype(models.dtype).name,
        "tiled": models.tiled,
        "unet_config": _cfg_to_dict(models.unet_config),
        "vae_config": _cfg_to_dict(models.vae_config),
        "text_config": _cfg_to_dict(models.text_config),
        "text_config_2": (_cfg_to_dict(models.text_config_2)
                          if models.text_config_2 else None),
        "scheduler_config": _cfg_to_dict(models.scheduler_config),
        "safety_config": (_cfg_to_dict(models.safety_config)
                          if models.safety_config else None),
        "taesd_config": (_cfg_to_dict(models.taesd_config)
                         if models.taesd_config is not None else None),
        "components": sorted(models.params.keys()),
        "tokenizer": ("bpe" if isinstance(base_tok, CLIPBPETokenizer)
                      else "hash"),
        "tokenizer_vocab_size": getattr(base_tok, "vocab_size", None),
        # textual-inversion trigger -> learned-id splices (the learned
        # vectors themselves live in the params msgpack already)
        "ti_triggers": triggers(models.tokenizer),
        "ti_triggers_2": triggers(models.tokenizer_2),
    }
    (path / "bundle.json").write_text(json.dumps(meta, indent=2))
    if isinstance(base_tok, CLIPBPETokenizer):
        import shutil
        tok_dir = path / "tokenizer"
        tok_dir.mkdir(exist_ok=True)
        shutil.copy(base_tok.vocab_path, tok_dir / "vocab.json")
        shutil.copy(base_tok.merges_path, tok_dir / "merges.txt")
    if isinstance(base_tok2, CLIPBPETokenizer):
        import shutil
        tok_dir = path / "tokenizer_2"
        tok_dir.mkdir(exist_ok=True)
        shutil.copy(base_tok2.vocab_path, tok_dir / "vocab.json")
        shutil.copy(base_tok2.merges_path, tok_dir / "merges.txt")
    for name, tree in models.params.items():
        host = jax.tree.map(np.asarray, tree)
        (path / f"{name}.msgpack").write_bytes(
            flax.serialization.to_bytes(host))
    return str(path)


def load_bundle(path, dtype=None, cls=None):
    """Read a bundle written by ``save_bundle`` -> SDModels."""
    from ..core.schedulers import SchedulerConfig
    from .bundle import SDModels
    from .clip_text import CLIPTextConfig
    from .safety import CLIPVisionConfig, SafetyConfig
    from .tokenizer import (CLIPBPETokenizer, HashTokenizer,
                            TextualInversionTokenizer)
    from .unet import UNetConfig
    from .vae import VAEConfig

    cls = cls or SDModels
    path = Path(path)
    meta = json.loads((path / "bundle.json").read_text())
    if meta["format_version"] != FORMAT_VERSION:
        raise ValueError(f"unsupported bundle format {meta['format_version']}")

    def tup(d, *keys):
        for k in keys:
            if k in d and isinstance(d[k], list):
                d[k] = tuple(d[k])
        return d

    ucfg = UNetConfig(**tup(meta["unet_config"], "block_out_channels",
                            "attn_levels", "attention_head_dim",
                            "transformer_depth"))
    vcfg = VAEConfig(**tup(meta["vae_config"], "block_out_channels"))
    tcfg = CLIPTextConfig(**meta["text_config"])
    tcfg2 = (CLIPTextConfig(**meta["text_config_2"])
             if meta.get("text_config_2") else None)
    scfg = SchedulerConfig(**meta["scheduler_config"])
    safety_cfg = None
    if meta["safety_config"]:
        sc = dict(meta["safety_config"])
        sc["vision"] = CLIPVisionConfig(**sc["vision"])
        safety_cfg = SafetyConfig(**sc)
    taesd_cfg = None
    if meta.get("taesd_config"):  # absent in pre-r5 bundles
        from .taesd import TAESDConfig
        taesd_cfg = TAESDConfig(**meta["taesd_config"])

    params = {}
    for name in meta["components"]:
        raw = (path / f"{name}.msgpack").read_bytes()
        params[name] = flax.serialization.msgpack_restore(raw)

    tok_dir = path / "tokenizer"
    if meta["tokenizer"] == "bpe" and tok_dir.exists():
        tokenizer = CLIPBPETokenizer(tok_dir / "vocab.json",
                                     tok_dir / "merges.txt")
    else:
        tokenizer = HashTokenizer(
            vocab_size=meta.get("tokenizer_vocab_size") or tcfg.vocab_size)
    tok2_dir = path / "tokenizer_2"
    tokenizer_2 = (CLIPBPETokenizer(tok2_dir / "vocab.json",
                                    tok2_dir / "merges.txt", pad_token_id=0)
                   if tok2_dir.exists() else None)
    base_tok = tokenizer
    if meta.get("ti_triggers"):
        tokenizer = TextualInversionTokenizer(tokenizer, meta["ti_triggers"])
    if meta.get("ti_triggers_2"):
        tokenizer_2 = TextualInversionTokenizer(tokenizer_2 or base_tok,
                                                meta["ti_triggers_2"])

    load_dtype = dtype or jnp.dtype(meta["dtype"])
    return cls(ucfg, vcfg, tcfg, params, tokenizer, scfg,
               safety_config=safety_cfg, dtype=load_dtype,
               tiled=meta["tiled"], text_config_2=tcfg2,
               tokenizer_2=tokenizer_2, taesd_config=taesd_cfg)
