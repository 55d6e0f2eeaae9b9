"""Textual-inversion embedding loading — the other dominant community
customization format next to LoRA (``models/lora_file.py``).

Accepted file formats:

* diffusers ``learned_embeds.safetensors`` / ``.bin``: one key per concept,
  ``{"<token>": (D,) or (n, D)}``.
* Automatic1111 ``.pt``: ``{"string_to_param": {"*": (n, D)}, "name": ...}``.
* Automatic1111 ``.safetensors``: ``{"emb_params": (n, D)}`` (trigger word
  taken from the filename).
* SDXL dual-tower: ``{"clip_l": (n, 768), "clip_g": (n, 1280)}``.

The reference repo has no textual-inversion support (concepts had to be
baked into a full checkpoint); owning the tokenizer and text towers means
the adapter file can be consumed directly.

TPU-first design: like LoRA, everything happens ON THE HOST at load time —
the learned vectors are appended as new rows of the token-embedding table,
the tokenizer is wrapped to splice the new ids wherever the trigger word
appears, and ``eos_token_id`` is pinned in the text config (the classic
``argmax(input_ids)`` EOS lookup is wrong once ids exist above EOS).  The
jitted programs see only a slightly wider embedding matmul — no new ops, no
recompile between prompts, and the params shard exactly as before.
"""

from __future__ import annotations

import dataclasses
import logging
from pathlib import Path

import numpy as np

from .tokenizer import TextualInversionTokenizer

logger = logging.getLogger("sdv_tpu")


@dataclasses.dataclass
class TIEmbedding:
    token: str
    #: learned vectors per tower: "l" (or the only tower) and optionally
    #: "g" (SDXL second tower); each (n_vectors, D) float32
    vectors: dict[str, np.ndarray]

    @property
    def n_vectors(self) -> int:
        return next(iter(self.vectors.values())).shape[0]


def _as_2d(x) -> np.ndarray:
    a = np.asarray(x, np.float32)
    if a.ndim == 1:
        a = a[None, :]
    if a.ndim != 2:
        raise ValueError(f"embedding tensor must be 1-D or 2-D, got "
                         f"{a.shape}")
    return a


def _load_torch(path) -> dict:
    import torch
    try:
        return torch.load(path, map_location="cpu", weights_only=True)
    except Exception:
        # old A1111 files pickle helper classes next to the tensors
        logger.warning("ti %s: weights_only load failed, retrying with "
                       "full unpickling", path)
        return torch.load(path, map_location="cpu", weights_only=False)


def parse_ti_file(path, token: str | None = None) -> TIEmbedding:
    """Read one textual-inversion file -> :class:`TIEmbedding`.  ``token``
    overrides the trigger word (defaults to the name stored in the file,
    else the filename stem)."""
    path = Path(path)
    if path.suffix == ".safetensors":
        from safetensors.numpy import load_file
        sd = load_file(str(path))
    else:
        sd = _load_torch(path)

    if "clip_l" in sd or "clip_g" in sd:  # SDXL dual-tower
        vectors = {}
        if "clip_l" in sd:
            vectors["l"] = _as_2d(sd["clip_l"])
        if "clip_g" in sd:
            vectors["g"] = _as_2d(sd["clip_g"])
        if len(vectors) == 2 and \
                vectors["l"].shape[0] != vectors["g"].shape[0]:
            raise ValueError(f"{path}: clip_l/clip_g vector counts differ "
                             f"({vectors['l'].shape[0]} vs "
                             f"{vectors['g'].shape[0]})")
        return TIEmbedding(token or path.stem, vectors)
    if "string_to_param" in sd:  # A1111 .pt
        tensors = list(sd["string_to_param"].values())
        if len(tensors) != 1:
            raise ValueError(f"{path}: expected one concept in "
                             f"string_to_param, got {len(tensors)}")
        name = sd.get("name")
        return TIEmbedding(token or (name if isinstance(name, str) else None)
                           or path.stem, {"l": _as_2d(tensors[0])})
    if "emb_params" in sd:  # A1111 .safetensors
        return TIEmbedding(token or path.stem, {"l": _as_2d(sd["emb_params"])})
    tensor_keys = [k for k, v in sd.items()
                   if hasattr(v, "shape") and np.asarray(v).ndim in (1, 2)]
    if len(tensor_keys) == 1:  # diffusers learned_embeds
        k = tensor_keys[0]
        return TIEmbedding(token or k, {"l": _as_2d(sd[k])})
    raise ValueError(f"{path}: not a recognised textual-inversion file "
                     f"(keys: {sorted(sd)[:5]})")


def _extend_tower(params: dict, config, tokenizer, vectors: np.ndarray):
    """Append ``vectors`` rows to one tower's token-embedding table ->
    (new group params, new config, new ids)."""
    emb = np.asarray(params["params"]["token_embedding"]["embedding"])
    V, D = emb.shape
    if vectors.shape[1] != D:
        raise ValueError(f"embedding width {vectors.shape[1]} does not "
                         f"match the text tower's hidden size {D}")
    new_ids = list(range(V, V + vectors.shape[0]))
    out = dict(params)
    out["params"] = dict(params["params"])
    out["params"]["token_embedding"] = {
        "embedding": np.concatenate([emb, vectors.astype(emb.dtype)], 0)}
    new_cfg = config.replace(vocab_size=V + vectors.shape[0],
                             eos_token_id=int(tokenizer.eos_token_id))
    return out, new_cfg, new_ids


def _wrap(tokenizer, trigger: str, ids: list[int]):
    if isinstance(tokenizer, TextualInversionTokenizer):
        return tokenizer.with_trigger(trigger, ids)
    return TextualInversionTokenizer(tokenizer, {trigger: ids})


def apply_textual_inversion(models, path, token: str | None = None):
    """Merge one textual-inversion file into a bundle -> NEW ``SDModels``
    (base untouched).  For SDXL bundles the file must carry both towers'
    vectors (``clip_l``/``clip_g``); single-tower files go to the bundle's
    only tower."""
    ti = parse_ti_file(path, token=token)
    params = dict(models.params)
    changes: dict = {}

    if models.text_config_2 is not None:  # dual-tower bundle
        if set(ti.vectors) != {"l", "g"}:
            raise ValueError(
                f"{path}: this is an SDXL bundle — the embedding file must "
                f"carry both clip_l and clip_g vectors (found "
                f"{sorted(ti.vectors)})")
        tok2 = models.tokenizer_2 or models.tokenizer
        params["text_encoder"], changes["text_config"], ids = _extend_tower(
            params["text_encoder"], models.text_config, models.tokenizer,
            ti.vectors["l"])
        params["text_encoder_2"], changes["text_config_2"], ids2 = \
            _extend_tower(params["text_encoder_2"], models.text_config_2,
                          tok2, ti.vectors["g"])
        changes["tokenizer"] = _wrap(models.tokenizer, ti.token, ids)
        changes["tokenizer_2"] = _wrap(tok2, ti.token, ids2)
    else:
        if "g" in ti.vectors and "l" not in ti.vectors:
            vec = ti.vectors["g"]
        elif len(ti.vectors) == 2:
            # dual-tower file on a single-tower bundle: pick by width
            D = np.asarray(params["text_encoder"]["params"]
                           ["token_embedding"]["embedding"]).shape[1]
            vec = next((v for v in ti.vectors.values() if v.shape[1] == D),
                       None)
            if vec is None:
                raise ValueError(f"{path}: no tower matches hidden size {D}")
        else:
            vec = ti.vectors["l"]
        params["text_encoder"], changes["text_config"], ids = _extend_tower(
            params["text_encoder"], models.text_config, models.tokenizer,
            vec)
        changes["tokenizer"] = _wrap(models.tokenizer, ti.token, ids)

    logger.info("textual inversion %s: trigger %r -> %d vector(s)", path,
                ti.token, ti.n_vectors)
    return dataclasses.replace(models, params=params, **changes)


def apply_textual_inversions(models, items):
    """Apply several embeddings: ``items`` is an iterable of ``path`` or
    ``(path, trigger_token)``."""
    for item in items:
        if isinstance(item, (tuple, list)):
            p, tok = item
        else:
            p, tok = item, None
        models = apply_textual_inversion(models, p, token=tok)
    return models


def parse_ti_arg(arg: str) -> tuple[str, str | None]:
    """CLI form ``path[:token]`` -> (path, token or None).  The token part
    must not look like a file suffix, so plain windows-style paths with
    drive colons still parse."""
    if ":" in arg:
        head, tail = arg.rsplit(":", 1)
        if tail and "/" not in tail and "." not in tail.rstrip(">"):
            return head, tail
    return arg, None
