"""Community LoRA file loading — kohya-ss and diffusers/peft formats.

The dominant SD customization artifact is a LoRA ``.safetensors`` file in
the kohya-ss naming (``lora_unet_<module>.lora_down.weight`` /
``.lora_up.weight`` / ``.alpha``), with diffusers/peft's
(``unet.<dotted>.lora_A.weight``) as the second ecosystem format.  kohya
SD1/SD2 files name UNet modules in the diffusers scheme
(``down_blocks_0_attentions_0_...``); kohya SDXL files name them in the
original LDM scheme (``input_blocks_4_1_...``) — both are accepted here.
The reference repo has no LoRA support at all (customized models must be
baked into a full diffusers checkpoint first); owning the models means
accepting the adapter files directly.

TPU-first design: adapters are merged into the parameter pytree ON THE
HOST at load time (``W += scale * (alpha/r) * up @ down``), so the jitted
denoise program is byte-identical to the base model's — zero runtime cost,
no recompile, and the merged tree shards exactly like the base tree.  (The
in-jit merge path used for *training* lives in ``training/lora.py``; this
module is the inference-side file format.)

Supported adapter shapes: 2-D Linear, 1x1 conv (stored either way), and
3x3 conv (LoCon-style ``down (r,i,3,3) / up (o,r,1,1)``).
"""

from __future__ import annotations

import dataclasses
import logging
import re

import numpy as np

logger = logging.getLogger("sdv_tpu")


# ---------------------------------------------------------------------------
# our param-tree paths -> kohya module names
# ---------------------------------------------------------------------------

_ATTN_LEAF = {
    ("attn1", "to_q"): "attn1_to_q", ("attn1", "to_k"): "attn1_to_k",
    ("attn1", "to_v"): "attn1_to_v", ("attn1", "to_out"): "attn1_to_out_0",
    ("attn2", "to_q"): "attn2_to_q", ("attn2", "to_k"): "attn2_to_k",
    ("attn2", "to_v"): "attn2_to_v", ("attn2", "to_out"): "attn2_to_out_0",
    ("ff", "proj_in"): "ff_net_0_proj", ("ff", "proj_out"): "ff_net_2",
}

_RES_LEAF = {"conv1": "conv1", "conv2": "conv2",
             "time_emb_proj": "time_emb_proj",
             "conv_shortcut": "conv_shortcut"}


def unet_module_map(unet_params: dict, n_levels: int) -> dict[str, tuple]:
    """{kohya module name (no ``lora_unet_`` prefix): path tuple into the
    params tree (ending at the module dict that holds ``kernel``)}.

    Enumerated from the ACTUAL tree, so only modules that exist are
    offered for matching; the kohya name is derived from our structured
    layer names (``models/unet.py:203-269`` naming scheme).
    """
    p = unet_params["params"]
    out: dict[str, tuple] = {}

    def transformer(tree_name, kohya_pfx):
        sub = p[tree_name]
        n_blocks = len([k for k in sub if k.startswith("blocks_")])
        for i in range(n_blocks):
            for ours, theirs in _ATTN_LEAF.items():
                out[f"{kohya_pfx}_transformer_blocks_{i}_{theirs}"] = \
                    ("params", tree_name, f"blocks_{i}", *ours)
        out[f"{kohya_pfx}_proj_in"] = ("params", tree_name, "proj_in")
        out[f"{kohya_pfx}_proj_out"] = ("params", tree_name, "proj_out")

    def resnet(tree_name, kohya_pfx):
        for ours, theirs in _RES_LEAF.items():
            if ours in p[tree_name]:
                out[f"{kohya_pfx}_{theirs}"] = ("params", tree_name, ours)

    for name in p:
        if m := re.fullmatch(r"down_(\d+)_attn_(\d+)", name):
            transformer(name, f"down_blocks_{m.group(1)}"
                              f"_attentions_{m.group(2)}")
        elif m := re.fullmatch(r"up_(\d+)_attn_(\d+)", name):
            L, j = int(m.group(1)), int(m.group(2))
            transformer(name, f"up_blocks_{n_levels - 1 - L}"
                              f"_attentions_{j}")
        elif name == "mid_attn":
            transformer(name, "mid_block_attentions_0")
        elif m := re.fullmatch(r"down_(\d+)_res_(\d+)", name):
            resnet(name, f"down_blocks_{m.group(1)}_resnets_{m.group(2)}")
        elif m := re.fullmatch(r"up_(\d+)_res_(\d+)", name):
            L, j = int(m.group(1)), int(m.group(2))
            resnet(name, f"up_blocks_{n_levels - 1 - L}_resnets_{j}")
        elif m := re.fullmatch(r"mid_res_(\d)", name):
            resnet(name, f"mid_block_resnets_{m.group(1)}")
        elif m := re.fullmatch(r"down_(\d+)_downsample", name):
            out[f"down_blocks_{m.group(1)}_downsamplers_0_conv"] = \
                ("params", name, "conv")
        elif m := re.fullmatch(r"up_(\d+)_upsample", name):
            L = int(m.group(1))
            out[f"up_blocks_{n_levels - 1 - L}_upsamplers_0_conv"] = \
                ("params", name, "conv")
        elif name in ("conv_in", "conv_out"):
            out[name] = ("params", name)
    return out


#: LDM resnet inner names (kohya SDXL conv-LoRA naming)
_LDM_RES_LEAF = {"conv1": "in_layers_2", "conv2": "out_layers_3",
                 "time_emb_proj": "emb_layers_1",
                 "conv_shortcut": "skip_connection"}


def ldm_unet_aliases(config) -> dict[str, str]:
    """{LDM-scheme module name: diffusers-scheme module name} for this UNet
    geometry — kohya SDXL LoRAs use ``input_blocks_4_1_...`` style names
    (sd-scripts adapts the original SDXL UNet, not the diffusers one).
    Derived from the config the same way ``models/ldm.py`` maps weights.
    """
    n = len(config.block_out_channels)
    lp = config.layers_per_block
    attn = config.attn_levels
    alias: dict[str, str] = {}

    def res(ldm_pfx, diff_pfx):
        for ours, ldm_inner in _LDM_RES_LEAF.items():
            alias[f"{ldm_pfx}_{ldm_inner}"] = f"{diff_pfx}_{ours}"

    i = 1
    for L in range(n):
        for j in range(lp):
            res(f"input_blocks_{i}_0", f"down_blocks_{L}_resnets_{j}")
            if attn[L]:
                alias[f"input_blocks_{i}_1"] = \
                    f"down_blocks_{L}_attentions_{j}"
            i += 1
        if L != n - 1:
            alias[f"input_blocks_{i}_0_op"] = \
                f"down_blocks_{L}_downsamplers_0_conv"
            i += 1
    res("middle_block_0", "mid_block_resnets_0")
    alias["middle_block_1"] = "mid_block_attentions_0"
    res("middle_block_2", "mid_block_resnets_1")
    i = 0
    for u in range(n):
        L = n - 1 - u
        for j in range(lp + 1):
            res(f"output_blocks_{i}_0", f"up_blocks_{u}_resnets_{j}")
            mod = 1
            if attn[L]:
                alias[f"output_blocks_{i}_1"] = f"up_blocks_{u}_attentions_{j}"
                mod = 2
            if j == lp and u != n - 1:
                alias[f"output_blocks_{i}_{mod}_conv"] = \
                    f"up_blocks_{u}_upsamplers_0_conv"
            i += 1
    return alias


_TE_LEAF = {"q_proj": "self_attn_q_proj", "k_proj": "self_attn_k_proj",
            "v_proj": "self_attn_v_proj", "out_proj": "self_attn_out_proj",
            "fc1": "mlp_fc1", "fc2": "mlp_fc2"}


def text_module_map(text_params: dict) -> dict[str, tuple]:
    """{kohya module name (no ``lora_te*_`` prefix): path tuple}.  kohya
    names both SDXL towers in the HF CLIP scheme, so one map serves
    te/te1/te2."""
    p = text_params["params"]
    out: dict[str, tuple] = {}
    for name in p:
        if m := re.fullmatch(r"layers_(\d+)", name):
            for ours, theirs in _TE_LEAF.items():
                if ours in p[name]:
                    out[f"text_model_encoder_layers_{m.group(1)}_{theirs}"] \
                        = ("params", name, ours)
    return out


# ---------------------------------------------------------------------------
# file parsing
# ---------------------------------------------------------------------------

@dataclasses.dataclass
class LoRADelta:
    down: np.ndarray  # (r, in[, kh, kw])
    up: np.ndarray    # (out, r[, 1, 1])
    alpha: float | None = None  # None -> alpha == rank (factor 1)

    @property
    def rank(self) -> int:
        return self.down.shape[0]

    def factor(self) -> float:
        return 1.0 if self.alpha is None else self.alpha / self.rank


_GROUP_PREFIXES = [  # file key prefix -> bundle group (longest match first)
    ("lora_unet_", "unet"), ("lora_te1_", "text_encoder"),
    ("lora_te2_", "text_encoder_2"), ("lora_te_", "text_encoder"),
    ("unet.", "unet"), ("text_encoder_2.", "text_encoder_2"),
    ("text_encoder.", "text_encoder"),
]
#: (suffix of the key stem once ``.weight`` is stripped, adapter part)
_PART_SUFFIXES = [
    (".lora_down", "down"), (".lora_A", "down"), (".lora.down", "down"),
    (".lora_up", "up"), (".lora_B", "up"), (".lora.up", "up"),
    # kohya underscore-joined forms (dots already collapsed in some dumps)
    ("_lora_down", "down"), ("_lora_up", "up"),
]


def parse_lora_file(path) -> dict[str, dict[str, LoRADelta]]:
    """LoRA ``.safetensors`` -> {group: {module_name: LoRADelta}} with
    kohya-style underscore module names (dotted peft names normalised)."""
    from safetensors.numpy import load_file
    sd = load_file(str(path))
    groups: dict[str, dict[str, dict]] = {}
    skipped = []
    for key, value in sd.items():
        hit = next(((pfx, g) for pfx, g in _GROUP_PREFIXES
                    if key.startswith(pfx)), None)
        if hit is None:
            skipped.append(key)
            continue
        pfx, grp = hit
        rest = key[len(pfx):]
        if rest.endswith(".alpha"):
            mod, part = rest[:-len(".alpha")], "alpha"
        elif rest.endswith(".weight"):
            stem = rest[:-len(".weight")]
            for suffix, part in _PART_SUFFIXES:
                if stem.endswith(suffix):
                    mod = stem[:-len(suffix)]
                    break
            else:
                skipped.append(key)
                continue
        else:
            skipped.append(key)
            continue
        mod = mod.replace(".", "_")
        groups.setdefault(grp, {}).setdefault(mod, {})[part] = value
    if skipped:
        logger.warning("lora %s: %d unrecognised keys (e.g. %s)", path,
                       len(skipped), skipped[:3])
    out: dict[str, dict[str, LoRADelta]] = {}
    for grp, mods in groups.items():
        out[grp] = {}
        for mod, parts in mods.items():
            if "down" not in parts or "up" not in parts:
                logger.warning("lora %s: module %s missing down/up — "
                               "skipped", path, mod)
                continue
            alpha = parts.get("alpha")
            out[grp][mod] = LoRADelta(
                down=np.asarray(parts["down"], np.float32),
                up=np.asarray(parts["up"], np.float32),
                alpha=(float(np.asarray(alpha).item())
                       if alpha is not None else None))
    if not any(out.values()):
        raise ValueError(f"{path}: no LoRA modules found (not a kohya- or "
                         "diffusers-format LoRA file?)")
    return out


# ---------------------------------------------------------------------------
# merge
# ---------------------------------------------------------------------------

def _translate_ldm(mod: str, aliases: dict[str, str]) -> str:
    """LDM-scheme module name -> diffusers-scheme, by longest-prefix block
    alias; names already in the diffusers scheme pass through unchanged."""
    for a in sorted(aliases, key=len, reverse=True):
        if mod == a:
            return aliases[a]
        if mod.startswith(a + "_"):
            return aliases[a] + mod[len(a):]
    return mod

def _delta_for_kernel(kernel_shape: tuple, d: LoRADelta) -> np.ndarray:
    """Adapter delta in OUR kernel layout (Dense (in, out) / conv HWIO)."""
    down, up = d.down, d.up
    if up.ndim == 4:
        up = up[:, :, 0, 0]  # (out, r)
    if len(kernel_shape) == 2:  # Dense (in, out)
        if down.ndim == 4:
            down = down[:, :, 0, 0]
        return (down.T @ up.T).astype(np.float32)
    kh, kw = kernel_shape[0], kernel_shape[1]
    if down.ndim == 2:
        down = down[:, :, None, None]
    if down.shape[2:] != (kh, kw):
        raise ValueError(f"lora down kernel {d.down.shape} incompatible "
                         f"with conv kernel {tuple(kernel_shape)}")
    # delta_oihw[o,i,h,w] = sum_r up[o,r] * down[r,i,h,w]
    delta = np.einsum("or,rihw->oihw", up, down)
    return np.transpose(delta, (2, 3, 1, 0)).astype(np.float32)  # -> HWIO


def _merge_group(group_params, module_map: dict[str, tuple],
                 deltas: dict[str, LoRADelta], scale: float,
                 label: str) -> tuple[dict, int]:
    targets: dict[tuple, np.ndarray] = {}
    matched = 0
    for mod, d in deltas.items():
        path = module_map.get(mod)
        if path is None:
            logger.warning("lora: no %s module for %r — skipped", label, mod)
            continue
        sub = group_params
        for k in path:
            sub = sub[k]
        kern = np.asarray(sub["kernel"])
        targets[(*path, "kernel")] = \
            _delta_for_kernel(kern.shape, d) * (scale * d.factor())
        matched += 1

    def visit(tree, pfx):
        if isinstance(tree, dict):
            return {k: visit(v, (*pfx, k)) for k, v in tree.items()}
        if pfx in targets:
            base = np.asarray(tree)
            return (base.astype(np.float32)
                    + targets[pfx]).astype(base.dtype)
        return tree

    return visit(group_params, ()), matched


def apply_lora(models, path, scale: float = 1.0):
    """Merge one LoRA file into a bundle -> NEW ``SDModels`` (base params
    untouched).  ``path`` may also be the ``training/lora.py`` ``.npz``
    trainer format (detected by suffix)."""
    if str(path).endswith(".npz"):
        from ..training.lora import LoRATrainer, merge_lora
        lora, rank, alpha = LoRATrainer.load_lora(path)
        params = dict(models.params)
        params["unet"] = merge_lora(models.params["unet"], lora,
                                    scale * alpha / rank)
        logger.info("merged trainer lora %s (rank %d) into unet", path, rank)
        return dataclasses.replace(models, params=params)

    groups = parse_lora_file(path)
    params = dict(models.params)
    n_levels = len(models.unet_config.block_out_channels)
    total = 0
    for grp, deltas in groups.items():
        if grp not in params:
            logger.warning("lora %s targets %s which this bundle lacks — "
                           "skipped (%d modules)", path, grp, len(deltas))
            continue
        if grp == "unet":
            mmap = unet_module_map(params["unet"], n_levels)
            # accept the LDM-scheme names kohya uses for SDXL: translate a
            # leading block alias (inner transformer_blocks names match)
            aliases = ldm_unet_aliases(models.unet_config)
            deltas = {_translate_ldm(mod, aliases): d
                      for mod, d in deltas.items()}
        else:
            mmap = text_module_map(params[grp])
        merged, matched = _merge_group(params[grp], mmap, deltas, scale, grp)
        params[grp] = merged
        total += matched
    if total == 0:
        raise ValueError(f"{path}: no LoRA module matched this bundle's "
                         "architecture")
    logger.info("merged lora %s: %d modules at scale %.3g", path, total,
                scale)
    return dataclasses.replace(models, params=params)


def apply_loras(models, loras, scale: float = 1.0):
    """Apply several adapters: ``loras`` is an iterable of ``path`` or
    ``(path, scale)`` (per-item scale overrides the shared default)."""
    for item in loras:
        if isinstance(item, (tuple, list)):
            p, s = item
        else:
            p, s = item, scale
        models = apply_lora(models, p, float(s))
    return models


def parse_lora_arg(arg: str) -> tuple[str, float]:
    """CLI form ``path[:scale]`` -> (path, scale)."""
    if ":" in arg:
        head, tail = arg.rsplit(":", 1)
        try:
            return head, float(tail)
        except ValueError:
            pass
    return arg, 1.0
