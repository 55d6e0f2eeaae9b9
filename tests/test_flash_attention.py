"""Pallas flash attention vs XLA reference (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from stable_diffusion_videos_tpu.ops.attention import xla_attention
from stable_diffusion_videos_tpu.ops.flash_attention import flash_attention


def _mk(b, s, h, d, sk=None, dtype=jnp.float32, seed=0):
    ks = jax.random.split(jax.random.PRNGKey(seed), 3)
    sk = sk or s
    q = jax.random.normal(ks[0], (b, s, h, d), dtype)
    k = jax.random.normal(ks[1], (b, sk, h, d), dtype)
    v = jax.random.normal(ks[2], (b, sk, h, d), dtype)
    return q, k, v


@pytest.mark.parametrize("b,s,h,d", [
    (1, 256, 2, 40),    # SD level-0 head dim, small seq
    (2, 512, 1, 64),
    (1, 1024, 2, 160),  # SD level-2 head dim
])
def test_flash_matches_xla(b, s, h, d):
    q, k, v = _mk(b, s, h, d)
    want = np.asarray(xla_attention(q, k, v))
    got = np.asarray(flash_attention(q, k, v, interpret=True,
                                     tile_q=128, tile_k=128))
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=2e-5)


def test_flash_multi_k_tiles_online_softmax():
    # k tiles > 1 exercises the online-softmax rescaling path
    q, k, v = _mk(1, 512, 1, 64, seed=3)
    want = np.asarray(xla_attention(q, k, v))
    got = np.asarray(flash_attention(q, k, v, interpret=True,
                                     tile_q=128, tile_k=128))
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=2e-5)


def test_flash_cross_attention_shapes():
    # cross-attention: Sq=1024 image tokens, Sk=128 text tokens (padded 77
    # falls back to XLA; aligned 128 goes through pallas)
    q, k, v = _mk(1, 1024, 2, 40, sk=128, seed=4)
    want = np.asarray(xla_attention(q, k, v))
    got = np.asarray(flash_attention(q, k, v, interpret=True,
                                     tile_q=256, tile_k=128))
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=2e-5)


def test_flash_ragged_keys_falls_back():
    q, k, v = _mk(1, 128, 1, 32, sk=77, seed=5)
    got = np.asarray(flash_attention(q, k, v, interpret=True))
    want = np.asarray(xla_attention(q, k, v))
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=2e-5)


def test_flash_unaligned_q_padding():
    q, k, v = _mk(1, 300, 1, 64, sk=256, seed=6)
    got = np.asarray(flash_attention(q, k, v, interpret=True,
                                     tile_q=128, tile_k=128))
    want = np.asarray(xla_attention(q, k, v))
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=2e-5)


def test_flash_bf16():
    q, k, v = _mk(1, 256, 2, 64, dtype=jnp.bfloat16, seed=7)
    got = np.asarray(flash_attention(q, k, v, interpret=True,
                                     tile_q=128, tile_k=128),
                     dtype=np.float32)
    want = np.asarray(xla_attention(q, k, v), dtype=np.float32)
    np.testing.assert_allclose(got, want, atol=2e-2, rtol=2e-2)


def test_auto_backend_routing():
    """auto routes UNet shapes to XLA and only the VAE-mid single-head
    D=512 case to flash (measured policy, tools/profile_r02.json r2)."""
    import importlib
    A = importlib.import_module("stable_diffusion_videos_tpu.ops.attention")
    assert A._resolve_backend(77, 64) == "xla"        # CLIP
    assert A._resolve_backend(4096, 40) == "xla"      # UNet level 0
    assert A._resolve_backend(1024, 80) == "xla"      # UNet level 1
    assert A._resolve_backend(256, 160) == "xla"      # UNet level 2
    # VAE mid block: flash on TPU, xla elsewhere (CPU test env -> xla)
    import jax
    want = "flash" if jax.default_backend() == "tpu" else "xla"
    assert A._resolve_backend(4096, 512) == want
    A.set_attention_backend("flash")
    try:
        assert A._resolve_backend(77, 64) == "flash"
    finally:
        A.set_attention_backend("auto")


def test_highres_tile_policy(monkeypatch):
    """attention() picks swept tiles by sequence length (S>=8192: q512 with
    the largest k tile <= 2048 dividing Sk — the optimum is ~1536-2048,
    probe_r03.json "flash_ktile_big") and the S=4096-tuned default
    otherwise — pins the measured policy."""
    import importlib

    import jax.numpy as jnp

    attn_mod = importlib.import_module(
        "stable_diffusion_videos_tpu.ops.attention")
    import stable_diffusion_videos_tpu.ops.flash_attention as fa

    seen = {}

    def spy(q, k, v, scale=None, tile_q=None, tile_k=None, **kw):
        seen["tiles"] = (tile_q, tile_k)
        return q

    monkeypatch.setattr(fa, "flash_attention", spy)
    monkeypatch.setattr(attn_mod, "_BACKEND", "flash")

    def run(sq, sk):
        q = jnp.zeros((1, sq, 1, 40), jnp.bfloat16)
        kv = jnp.zeros((1, sk, 1, 40), jnp.bfloat16)
        attn_mod.attention(q, kv, kv)
        return seen["tiles"]

    assert run(16384, 16384) == (512, 2048)
    assert run(9216, 9216) == (512, 1536)   # 9216 % 2048 != 0; 1536 divides
    assert run(4096, 4096) == (256, 1024)   # the S=4096-tuned default
    assert run(4096, 77) == (256, 77)


def test_materialization_aware_routing(monkeypatch):
    """r3 policy (tools/sd2_b8_r03.json + probe_r03.json "sd2attn"): D>=64
    self-attention routes to flash exactly when XLA would materialise the
    f32 score tensor (it fits in HBM) — the SD2 batch-8 cliff's root cause.
    D=40 (SD1.x) and cross-attention (kv=77) never re-route."""
    import importlib

    import jax as _jax
    A = importlib.import_module("stable_diffusion_videos_tpu.ops.attention")
    monkeypatch.setattr(_jax, "default_backend", lambda: "tpu")
    # SD2 L0 at CFG batch 16 (B*H=80, S=4096, D=64): 5 GB scores fit ->
    # XLA materialises -> flash (measured 11.9 vs 18.6 ms)
    assert A._resolve_backend(4096, 64, batch_heads=80) == "flash"
    # CFG batch 32 (10 GB > limit): XLA's forced chunked path wins
    assert A._resolve_backend(4096, 64, batch_heads=160) == "xla"
    # SD2 L1 (S=1024, B*H=160): 0.6 GB fits -> flash (5.0 vs 6.0 ms)
    assert A._resolve_backend(1024, 64, batch_heads=160) == "flash"
    # SD1.x D=40/80: XLA measured faster at every shape, never re-route
    assert A._resolve_backend(4096, 40, batch_heads=128) == "xla"
    assert A._resolve_backend(1024, 80, batch_heads=128) == "xla"
    # cross-attention (kv=77): tiny scores, stays XLA
    assert A._resolve_backend(4096, 64, batch_heads=80, kv_len=77) == "xla"
    # small sequences stay XLA
    assert A._resolve_backend(256, 64, batch_heads=320) == "xla"
