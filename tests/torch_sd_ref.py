"""Independent PyTorch transcription of the SD 1.x UNet/VAE semantics.

Used ONLY by tests/test_torch_parity.py to numerically validate the Flax
models + weight converter, following the proven pattern of
``tests/test_pndm_reference_impl.py`` (independent stateful transcription,
cross-checked numerically).

This is a from-scratch implementation of the architecture the reference
consumes via ``diffusers.UNet2DConditionModel`` / ``AutoencoderKL``
(reference ``stable_diffusion_pipeline.py:11,418,433``), written in plain
torch with diffusers' *state-dict naming* so the repo's converter
(``models/weights.py``) can ingest ``model.state_dict()`` directly:

* ResnetBlock2D: GN -> SiLU -> conv3x3 [+ time-emb proj] -> GN -> SiLU ->
  conv3x3 (+ 1x1 shortcut when channels change); eps 1e-5 (UNet) / 1e-6 (VAE)
* Transformer2DModel: GN(eps 1e-6) -> 1x1 proj_in -> [LN -> self-attn ->
  LN -> cross-attn -> LN -> GEGLU FF] x depth -> 1x1 proj_out + residual
* Downsample: stride-2 conv — symmetric padding 1 in the UNet
  (downsample_padding=1), asymmetric (0,1),(0,1) zero-pad in the VAE encoder
* Upsample: 2x nearest + conv3x3
* sinusoidal timestep embedding with flip_sin_to_cos + Linear/SiLU/Linear MLP
"""

from __future__ import annotations

import math

import torch
import torch.nn as nn
import torch.nn.functional as F


def timestep_embedding(t: torch.Tensor, dim: int, flip_sin_to_cos=True,
                       downscale_freq_shift=0.0, max_period=10000):
    half = dim // 2
    exponent = -math.log(max_period) * torch.arange(half, dtype=torch.float32)
    exponent = exponent / (half - downscale_freq_shift)
    emb = t.float()[:, None] * torch.exp(exponent)[None, :]
    sin, cos = torch.sin(emb), torch.cos(emb)
    return torch.cat([cos, sin] if flip_sin_to_cos else [sin, cos], dim=-1)


class TimestepEmbedding(nn.Module):
    def __init__(self, in_dim, embed_dim):
        super().__init__()
        self.linear_1 = nn.Linear(in_dim, embed_dim)
        self.linear_2 = nn.Linear(embed_dim, embed_dim)

    def forward(self, x):
        return self.linear_2(F.silu(self.linear_1(x)))


class ResnetBlock2D(nn.Module):
    def __init__(self, cin, cout, temb_dim=None, eps=1e-5, groups=32):
        super().__init__()
        self.norm1 = nn.GroupNorm(groups, cin, eps=eps)
        self.conv1 = nn.Conv2d(cin, cout, 3, padding=1)
        if temb_dim is not None:
            self.time_emb_proj = nn.Linear(temb_dim, cout)
        self.norm2 = nn.GroupNorm(groups, cout, eps=eps)
        self.conv2 = nn.Conv2d(cout, cout, 3, padding=1)
        if cin != cout:
            self.conv_shortcut = nn.Conv2d(cin, cout, 1)

    def forward(self, x, temb=None):
        h = self.conv1(F.silu(self.norm1(x)))
        if temb is not None:
            h = h + self.time_emb_proj(F.silu(temb))[:, :, None, None]
        h = self.conv2(F.silu(self.norm2(h)))
        if hasattr(self, "conv_shortcut"):
            x = self.conv_shortcut(x)
        return x + h


class CrossAttention(nn.Module):
    def __init__(self, dim, ctx_dim, heads, head_dim):
        super().__init__()
        self.heads, self.head_dim = heads, head_dim
        inner = heads * head_dim
        self.to_q = nn.Linear(dim, inner, bias=False)
        self.to_k = nn.Linear(ctx_dim, inner, bias=False)
        self.to_v = nn.Linear(ctx_dim, inner, bias=False)
        self.to_out = nn.ModuleList([nn.Linear(inner, dim)])

    def forward(self, x, ctx=None):
        ctx = x if ctx is None else ctx
        b, s, _ = x.shape

        def split(t):
            return t.view(b, -1, self.heads, self.head_dim).transpose(1, 2)

        q, k, v = split(self.to_q(x)), split(self.to_k(ctx)), \
            split(self.to_v(ctx))
        attn = torch.softmax(
            (q @ k.transpose(-1, -2)) * self.head_dim ** -0.5, dim=-1)
        out = (attn @ v).transpose(1, 2).reshape(b, s, -1)
        return self.to_out[0](out)


class GEGLU(nn.Module):
    def __init__(self, dim, inner):
        super().__init__()
        self.proj = nn.Linear(dim, inner * 2)

    def forward(self, x):
        h, gate = self.proj(x).chunk(2, dim=-1)
        return h * F.gelu(gate)


class FeedForward(nn.Module):
    def __init__(self, dim, mult=4):
        super().__init__()
        inner = dim * mult
        # net.1 is a Dropout in diffusers (parameter-free)
        self.net = nn.ModuleList(
            [GEGLU(dim, inner), nn.Identity(), nn.Linear(inner, dim)])

    def forward(self, x):
        for m in self.net:
            x = m(x)
        return x


class BasicTransformerBlock(nn.Module):
    def __init__(self, dim, ctx_dim, heads, head_dim):
        super().__init__()
        self.norm1 = nn.LayerNorm(dim)
        self.attn1 = CrossAttention(dim, dim, heads, head_dim)
        self.norm2 = nn.LayerNorm(dim)
        self.attn2 = CrossAttention(dim, ctx_dim, heads, head_dim)
        self.norm3 = nn.LayerNorm(dim)
        self.ff = FeedForward(dim)

    def forward(self, x, ctx):
        x = x + self.attn1(self.norm1(x))
        x = x + self.attn2(self.norm2(x), ctx)
        x = x + self.ff(self.norm3(x))
        return x


class Transformer2DModel(nn.Module):
    def __init__(self, ch, ctx_dim, heads, depth=1):
        super().__init__()
        self.norm = nn.GroupNorm(32, ch, eps=1e-6)
        self.proj_in = nn.Conv2d(ch, ch, 1)
        self.transformer_blocks = nn.ModuleList(
            [BasicTransformerBlock(ch, ctx_dim, heads, ch // heads)
             for _ in range(depth)])
        self.proj_out = nn.Conv2d(ch, ch, 1)

    def forward(self, x, ctx):
        b, c, h, w = x.shape
        residual = x
        x = self.proj_in(self.norm(x))
        x = x.permute(0, 2, 3, 1).reshape(b, h * w, c)
        for blk in self.transformer_blocks:
            x = blk(x, ctx)
        x = x.reshape(b, h, w, c).permute(0, 3, 1, 2)
        return self.proj_out(x) + residual


class Downsample2D(nn.Module):
    def __init__(self, ch, asymmetric=False):
        super().__init__()
        self.asymmetric = asymmetric
        self.conv = nn.Conv2d(ch, ch, 3, stride=2,
                              padding=0 if asymmetric else 1)

    def forward(self, x):
        if self.asymmetric:
            x = F.pad(x, (0, 1, 0, 1))
        return self.conv(x)


class Upsample2D(nn.Module):
    def __init__(self, ch):
        super().__init__()
        self.conv = nn.Conv2d(ch, ch, 3, padding=1)

    def forward(self, x):
        return self.conv(F.interpolate(x, scale_factor=2, mode="nearest"))


class _Blocks(nn.Module):
    """Anonymous container so child ModuleLists get diffusers-style names."""
    def __init__(self, **kw):
        super().__init__()
        for k, v in kw.items():
            setattr(self, k, v)


class TorchUNet(nn.Module):
    """UNet2DConditionModel transcription, driven by the repo's UNetConfig."""

    def __init__(self, cfg):
        super().__init__()
        self.cfg = cfg
        chans = cfg.block_out_channels
        n = len(chans)
        temb_dim = chans[0] * 4
        self.conv_in = nn.Conv2d(cfg.in_channels, chans[0], 3, padding=1)
        self.time_embedding = TimestepEmbedding(chans[0], temb_dim)
        if cfg.addition_embed_dim is not None:  # SDXL text_time
            self.add_embedding = TimestepEmbedding(
                cfg.addition_pooled_dim + 6 * cfg.addition_embed_dim,
                temb_dim)

        skips = [chans[0]]
        self.down_blocks = nn.ModuleList()
        ch = chans[0]
        for level, out_ch in enumerate(chans):
            resnets, attns = nn.ModuleList(), nn.ModuleList()
            for _ in range(cfg.layers_per_block):
                resnets.append(ResnetBlock2D(ch, out_ch, temb_dim))
                ch = out_ch
                if cfg.attn_levels[level]:
                    attns.append(Transformer2DModel(
                        ch, cfg.cross_attention_dim, cfg.heads(level),
                        cfg.depth(level)))
                skips.append(ch)
            kw = {"resnets": resnets}
            if cfg.attn_levels[level]:
                kw["attentions"] = attns
            if level != n - 1:
                kw["downsamplers"] = nn.ModuleList([Downsample2D(ch)])
                skips.append(ch)
            self.down_blocks.append(_Blocks(**kw))

        mid_ch = chans[-1]
        self.mid_block = _Blocks(
            resnets=nn.ModuleList([ResnetBlock2D(mid_ch, mid_ch, temb_dim),
                                   ResnetBlock2D(mid_ch, mid_ch, temb_dim)]),
            attentions=nn.ModuleList([Transformer2DModel(
                mid_ch, cfg.cross_attention_dim, cfg.heads(n - 1),
                cfg.depth(n - 1))]))

        self.up_blocks = nn.ModuleList()
        for i in range(n):
            level = n - 1 - i
            out_ch = chans[level]
            resnets, attns = nn.ModuleList(), nn.ModuleList()
            for _ in range(cfg.layers_per_block + 1):
                skip_ch = skips.pop()
                resnets.append(ResnetBlock2D(ch + skip_ch, out_ch, temb_dim))
                ch = out_ch
                if cfg.attn_levels[level]:
                    attns.append(Transformer2DModel(
                        ch, cfg.cross_attention_dim, cfg.heads(level),
                        cfg.depth(level)))
            kw = {"resnets": resnets}
            if cfg.attn_levels[level]:
                kw["attentions"] = attns
            if i != n - 1:
                kw["upsamplers"] = nn.ModuleList([Upsample2D(ch)])
            self.up_blocks.append(_Blocks(**kw))

        self.conv_norm_out = nn.GroupNorm(32, chans[0], eps=1e-5)
        self.conv_out = nn.Conv2d(chans[0], cfg.out_channels, 3, padding=1)

    def forward(self, sample, timesteps, ctx, text_embeds=None,
                time_ids=None, ctrl_down=None, ctrl_mid=None):
        cfg = self.cfg
        if timesteps.ndim == 0:
            timesteps = timesteps.expand(sample.shape[0])
        temb = self.time_embedding(timestep_embedding(
            timesteps, cfg.block_out_channels[0], cfg.flip_sin_to_cos,
            cfg.freq_shift))
        if cfg.addition_embed_dim is not None:
            ids_emb = timestep_embedding(
                time_ids.reshape(-1), cfg.addition_embed_dim,
                cfg.flip_sin_to_cos, cfg.freq_shift
            ).reshape(sample.shape[0], -1)
            temb = temb + self.add_embedding(
                torch.cat([text_embeds, ids_emb], dim=-1))
        x = self.conv_in(sample)
        skips = [x]
        for blk in self.down_blocks:
            attns = list(getattr(blk, "attentions", []))
            for j, res in enumerate(blk.resnets):
                x = res(x, temb)
                if attns:
                    x = attns[j](x, ctx)
                skips.append(x)
            if hasattr(blk, "downsamplers"):
                x = blk.downsamplers[0](x)
                skips.append(x)
        if ctrl_down is not None:
            skips = [s + r for s, r in zip(skips, ctrl_down)]
        x = self.mid_block.resnets[0](x, temb)
        x = self.mid_block.attentions[0](x, ctx)
        x = self.mid_block.resnets[1](x, temb)
        if ctrl_mid is not None:
            x = x + ctrl_mid
        for blk in self.up_blocks:
            attns = list(getattr(blk, "attentions", []))
            for j, res in enumerate(blk.resnets):
                x = torch.cat([x, skips.pop()], dim=1)
                x = res(x, temb)
                if attns:
                    x = attns[j](x, ctx)
            if hasattr(blk, "upsamplers"):
                x = blk.upsamplers[0](x)
        return self.conv_out(F.silu(self.conv_norm_out(x)))


class VAEAttention(nn.Module):
    """Single-head self-attention of the VAE mid block."""

    def __init__(self, ch):
        super().__init__()
        self.group_norm = nn.GroupNorm(32, ch, eps=1e-6)
        self.to_q = nn.Linear(ch, ch)
        self.to_k = nn.Linear(ch, ch)
        self.to_v = nn.Linear(ch, ch)
        self.to_out = nn.ModuleList([nn.Linear(ch, ch)])

    def forward(self, x):
        b, c, h, w = x.shape
        residual = x
        y = self.group_norm(x).permute(0, 2, 3, 1).reshape(b, h * w, c)
        q, k, v = self.to_q(y), self.to_k(y), self.to_v(y)
        attn = torch.softmax((q @ k.transpose(-1, -2)) * c ** -0.5, dim=-1)
        y = self.to_out[0](attn @ v)
        return y.reshape(b, h, w, c).permute(0, 3, 1, 2) + residual


class TorchVAEEncoder(nn.Module):
    def __init__(self, cfg):
        super().__init__()
        chans = cfg.block_out_channels
        n = len(chans)
        self.conv_in = nn.Conv2d(cfg.in_channels, chans[0], 3, padding=1)
        self.down_blocks = nn.ModuleList()
        ch = chans[0]
        for level, out_ch in enumerate(chans):
            resnets = nn.ModuleList()
            for _ in range(cfg.layers_per_block):
                resnets.append(ResnetBlock2D(ch, out_ch, eps=1e-6))
                ch = out_ch
            kw = {"resnets": resnets}
            if level != n - 1:
                kw["downsamplers"] = nn.ModuleList(
                    [Downsample2D(ch, asymmetric=True)])
            self.down_blocks.append(_Blocks(**kw))
        self.mid_block = _Blocks(
            resnets=nn.ModuleList([ResnetBlock2D(ch, ch, eps=1e-6),
                                   ResnetBlock2D(ch, ch, eps=1e-6)]),
            attentions=nn.ModuleList([VAEAttention(ch)]))
        self.conv_norm_out = nn.GroupNorm(32, ch, eps=1e-6)
        self.conv_out = nn.Conv2d(ch, 2 * cfg.latent_channels, 3, padding=1)

    def forward(self, x):
        x = self.conv_in(x)
        for blk in self.down_blocks:
            for res in blk.resnets:
                x = res(x)
            if hasattr(blk, "downsamplers"):
                x = blk.downsamplers[0](x)
        x = self.mid_block.resnets[0](x)
        x = self.mid_block.attentions[0](x)
        x = self.mid_block.resnets[1](x)
        return self.conv_out(F.silu(self.conv_norm_out(x)))


class TorchVAEDecoder(nn.Module):
    def __init__(self, cfg):
        super().__init__()
        chans = cfg.block_out_channels
        n = len(chans)
        ch = chans[-1]
        self.conv_in = nn.Conv2d(cfg.latent_channels, ch, 3, padding=1)
        self.mid_block = _Blocks(
            resnets=nn.ModuleList([ResnetBlock2D(ch, ch, eps=1e-6),
                                   ResnetBlock2D(ch, ch, eps=1e-6)]),
            attentions=nn.ModuleList([VAEAttention(ch)]))
        self.up_blocks = nn.ModuleList()
        for i in range(n):
            level = n - 1 - i
            out_ch = chans[level]
            resnets = nn.ModuleList()
            for _ in range(cfg.layers_per_block + 1):
                resnets.append(ResnetBlock2D(ch, out_ch, eps=1e-6))
                ch = out_ch
            kw = {"resnets": resnets}
            if i != n - 1:
                kw["upsamplers"] = nn.ModuleList([Upsample2D(ch)])
            self.up_blocks.append(_Blocks(**kw))
        self.conv_norm_out = nn.GroupNorm(32, ch, eps=1e-6)
        self.conv_out = nn.Conv2d(ch, cfg.out_channels, 3, padding=1)

    def forward(self, z):
        x = self.conv_in(z)
        x = self.mid_block.resnets[0](x)
        x = self.mid_block.attentions[0](x)
        x = self.mid_block.resnets[1](x)
        for blk in self.up_blocks:
            for res in blk.resnets:
                x = res(x)
            if hasattr(blk, "upsamplers"):
                x = blk.upsamplers[0](x)
        return self.conv_out(F.silu(self.conv_norm_out(x)))


class TorchVAE(nn.Module):
    def __init__(self, cfg):
        super().__init__()
        self.encoder = TorchVAEEncoder(cfg)
        self.decoder = TorchVAEDecoder(cfg)
        self.quant_conv = nn.Conv2d(2 * cfg.latent_channels,
                                    2 * cfg.latent_channels, 1)
        self.post_quant_conv = nn.Conv2d(cfg.latent_channels,
                                         cfg.latent_channels, 1)

    def encode_moments(self, x):
        moments = self.quant_conv(self.encoder(x))
        mean, logvar = moments.chunk(2, dim=1)
        return mean, torch.clamp(logvar, -30.0, 20.0)

    def decode(self, z):
        return self.decoder(self.post_quant_conv(z))


class TorchControlNetCondEmbedding(nn.Module):
    """diffusers ControlNetConditioningEmbedding transcription: conv_in ->
    [conv3x3, conv3x3 stride2] pairs -> zero conv_out, SiLU between all."""

    def __init__(self, out_channels, channels=(16, 32, 96, 256)):
        super().__init__()
        self.conv_in = nn.Conv2d(3, channels[0], 3, padding=1)
        self.blocks = nn.ModuleList()
        for i in range(len(channels) - 1):
            self.blocks.append(nn.Conv2d(channels[i], channels[i], 3,
                                         padding=1))
            self.blocks.append(nn.Conv2d(channels[i], channels[i + 1], 3,
                                         padding=1, stride=2))
        self.conv_out = nn.Conv2d(channels[-1], out_channels, 3, padding=1)
        nn.init.zeros_(self.conv_out.weight)
        nn.init.zeros_(self.conv_out.bias)

    def forward(self, cond):
        x = F.silu(self.conv_in(cond))
        for blk in self.blocks:
            x = F.silu(blk(x))
        return self.conv_out(x)


class TorchControlNet(nn.Module):
    """diffusers ControlNetModel transcription: the UNet's down+mid trunk fed
    conv_in(latents) + cond_embedding(control image), tapped through
    zero-initialised 1x1 convs (state-dict naming: controlnet_cond_embedding,
    controlnet_down_blocks, controlnet_mid_block)."""

    def __init__(self, cfg, cond_channels=(16, 32, 96, 256)):
        super().__init__()
        self.cfg = cfg
        chans = cfg.block_out_channels
        n = len(chans)
        temb_dim = chans[0] * 4
        self.conv_in = nn.Conv2d(cfg.in_channels, chans[0], 3, padding=1)
        self.time_embedding = TimestepEmbedding(chans[0], temb_dim)
        if cfg.addition_embed_dim is not None:
            self.add_embedding = TimestepEmbedding(
                cfg.addition_pooled_dim + 6 * cfg.addition_embed_dim,
                temb_dim)
        self.controlnet_cond_embedding = TorchControlNetCondEmbedding(
            chans[0], cond_channels)

        def zero_conv(ch):
            c = nn.Conv2d(ch, ch, 1)
            nn.init.zeros_(c.weight)
            nn.init.zeros_(c.bias)
            return c

        skip_chans = [chans[0]]
        self.down_blocks = nn.ModuleList()
        ch = chans[0]
        for level, out_ch in enumerate(chans):
            resnets, attns = nn.ModuleList(), nn.ModuleList()
            for _ in range(cfg.layers_per_block):
                resnets.append(ResnetBlock2D(ch, out_ch, temb_dim))
                ch = out_ch
                if cfg.attn_levels[level]:
                    attns.append(Transformer2DModel(
                        ch, cfg.cross_attention_dim, cfg.heads(level),
                        cfg.depth(level)))
                skip_chans.append(ch)
            kw = {"resnets": resnets}
            if cfg.attn_levels[level]:
                kw["attentions"] = attns
            if level != n - 1:
                kw["downsamplers"] = nn.ModuleList([Downsample2D(ch)])
                skip_chans.append(ch)
            self.down_blocks.append(_Blocks(**kw))

        mid_ch = chans[-1]
        self.mid_block = _Blocks(
            resnets=nn.ModuleList([ResnetBlock2D(mid_ch, mid_ch, temb_dim),
                                   ResnetBlock2D(mid_ch, mid_ch, temb_dim)]),
            attentions=nn.ModuleList([Transformer2DModel(
                mid_ch, cfg.cross_attention_dim, cfg.heads(n - 1),
                cfg.depth(n - 1))]))

        self.controlnet_down_blocks = nn.ModuleList(
            [zero_conv(c) for c in skip_chans])
        self.controlnet_mid_block = zero_conv(mid_ch)

    def forward(self, sample, timesteps, ctx, cond, conditioning_scale=1.0,
                text_embeds=None, time_ids=None):
        cfg = self.cfg
        if timesteps.ndim == 0:
            timesteps = timesteps.expand(sample.shape[0])
        temb = self.time_embedding(timestep_embedding(
            timesteps, cfg.block_out_channels[0], cfg.flip_sin_to_cos,
            cfg.freq_shift))
        if cfg.addition_embed_dim is not None:
            ids_emb = timestep_embedding(
                time_ids.reshape(-1), cfg.addition_embed_dim,
                cfg.flip_sin_to_cos, cfg.freq_shift
            ).reshape(sample.shape[0], -1)
            temb = temb + self.add_embedding(
                torch.cat([text_embeds, ids_emb], dim=-1))
        x = self.conv_in(sample) + self.controlnet_cond_embedding(cond)
        skips = [x]
        for blk in self.down_blocks:
            attns = list(getattr(blk, "attentions", []))
            for j, res in enumerate(blk.resnets):
                x = res(x, temb)
                if attns:
                    x = attns[j](x, ctx)
                skips.append(x)
            if hasattr(blk, "downsamplers"):
                x = blk.downsamplers[0](x)
                skips.append(x)
        x = self.mid_block.resnets[0](x, temb)
        x = self.mid_block.attentions[0](x, ctx)
        x = self.mid_block.resnets[1](x, temb)
        down_res = [zc(s) * conditioning_scale
                    for zc, s in zip(self.controlnet_down_blocks, skips)]
        mid_res = self.controlnet_mid_block(x) * conditioning_scale
        return down_res, mid_res
