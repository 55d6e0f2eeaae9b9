"""SDXL model-family tests: per-level transformer depth, text_time
micro-conditioning, dual text towers, and the engine/pipeline plumbing.

The reference supports only SD 1.x (diffusers pipelines); SDXL is a
beyond-reference model family.  Geometry facts asserted here follow the
published stabilityai/stable-diffusion-xl-base-1.0 config.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from stable_diffusion_videos_tpu.models.bundle import SDModels
from stable_diffusion_videos_tpu.models.clip_text import (CLIPTextConfig,
                                                          CLIPTextEncoder)
from stable_diffusion_videos_tpu.models.unet import (UNet2DCondition,
                                                     UNetConfig)


# ---------------------------------------------------------------------------
# configs
# ---------------------------------------------------------------------------
def test_sd_xl_config_geometry():
    cfg = UNetConfig.sd_xl()
    assert cfg.block_out_channels == (320, 640, 1280)
    assert cfg.cross_attention_dim == 2048
    assert cfg.attn_levels == (False, True, True)
    assert [cfg.depth(i) for i in range(3)] == [0, 2, 10]
    assert [cfg.heads(i) for i in range(3)] == [5, 10, 20]
    # 64 channels per head at every attention level
    assert all(cfg.block_out_channels[i] // cfg.heads(i) == 64
               for i in (1, 2))
    # text_time addition embedding: 1280 pooled + 6 x 256 = 2816
    assert cfg.addition_pooled_dim + 6 * cfg.addition_embed_dim == 2816


def test_sd_xl_text_tower_configs():
    l, g = CLIPTextConfig.sd_xl_l(), CLIPTextConfig.sd_xl_g()
    assert l.penultimate_hidden and g.penultimate_hidden
    assert l.projection_dim is None and g.projection_dim == 1280
    # dual-tower concat matches the UNet context width
    assert l.hidden_size + g.hidden_size == UNetConfig.sd_xl().cross_attention_dim
    uc, vc, tc, tc2 = SDModels.sd_xl_configs()
    assert vc.scaling_factor == pytest.approx(0.13025)  # sdxl-vae


# ---------------------------------------------------------------------------
# UNet text_time conditioning
# ---------------------------------------------------------------------------
@pytest.fixture(scope="module")
def xl_unet():
    cfg = UNetConfig.tiny_xl()
    m = UNet2DCondition(cfg)
    lat = jnp.zeros((2, 8, 8, 4))
    ctx = jnp.zeros((2, 7, cfg.cross_attention_dim))
    te = jnp.zeros((2, cfg.addition_pooled_dim))
    ti = jnp.zeros((2, 6))
    p = m.init(jax.random.PRNGKey(0), lat, jnp.zeros((2,)), ctx, te, ti)
    return cfg, m, p


def test_xl_unet_forward_and_param_structure(xl_unet):
    cfg, m, p = xl_unet
    lat = jnp.asarray(np.random.default_rng(0).standard_normal((2, 8, 8, 4)),
                      jnp.float32)
    ctx = jnp.ones((2, 7, cfg.cross_attention_dim)) * 0.1
    te = jnp.ones((2, cfg.addition_pooled_dim))
    ti = jnp.asarray([[64, 64, 0, 0, 64, 64]] * 2, jnp.float32)
    out = m.apply(p, lat, jnp.zeros((2,)), ctx, te, ti)
    assert out.shape == (2, 8, 8, 4)
    assert np.isfinite(np.asarray(out)).all()
    # the addition MLP exists and projects 6*emb + pooled -> 4*ch0
    add = p["params"]["add_embedding"]
    in_dim = cfg.addition_pooled_dim + 6 * cfg.addition_embed_dim
    assert add["linear_1"]["kernel"].shape == (in_dim,
                                               cfg.block_out_channels[0] * 4)
    # level 0 carries no attention params; level 1 has depth-2 blocks
    names = set(p["params"])
    assert not any(n.startswith("down_0_attn") for n in names)
    assert "blocks_1" in p["params"]["down_1_attn_0"]
    assert "blocks_0" in p["params"]["mid_attn"]


def test_xl_unet_conditioning_changes_output(xl_unet):
    cfg, m, p = xl_unet
    lat = jnp.ones((1, 8, 8, 4))
    ctx = jnp.ones((1, 7, cfg.cross_attention_dim)) * 0.1
    t = jnp.zeros((1,))
    ti = jnp.asarray([[64, 64, 0, 0, 64, 64]], jnp.float32)
    te0 = jnp.zeros((1, cfg.addition_pooled_dim))
    te1 = jnp.ones((1, cfg.addition_pooled_dim))
    o0 = m.apply(p, lat, t, ctx, te0, ti)
    o1 = m.apply(p, lat, t, ctx, te1, ti)
    assert not np.allclose(np.asarray(o0), np.asarray(o1))
    # different size conditioning also changes the output
    ti2 = jnp.asarray([[32, 32, 0, 0, 32, 32]], jnp.float32)
    o2 = m.apply(p, lat, t, ctx, te0, ti2)
    assert not np.allclose(np.asarray(o0), np.asarray(o2))


def test_xl_unet_requires_added_conds(xl_unet):
    cfg, m, p = xl_unet
    with pytest.raises(ValueError, match="text_embeds"):
        m.apply(p, jnp.zeros((1, 8, 8, 4)), jnp.zeros((1,)),
                jnp.zeros((1, 7, cfg.cross_attention_dim)))


# ---------------------------------------------------------------------------
# CLIP penultimate hidden + projection
# ---------------------------------------------------------------------------
def test_clip_penultimate_and_projection():
    base = dict(vocab_size=100, hidden_size=16, intermediate_size=32,
                num_layers=3, num_heads=2)
    ids = jnp.asarray([[1, 7, 99, 0, 0]], jnp.int32)
    enc_last = CLIPTextEncoder(CLIPTextConfig(**base))
    p = enc_last.init(jax.random.PRNGKey(0), ids)
    h_last, pooled_last = enc_last.apply(p, ids)

    enc_pen = CLIPTextEncoder(CLIPTextConfig(**base, penultimate_hidden=True,
                                             projection_dim=24))
    # same tower params + a projection head: reuse p's params where shared
    p2 = enc_pen.init(jax.random.PRNGKey(0), ids)
    merged = jax.tree.map(lambda a: a, p2)
    for k, v in p["params"].items():
        merged["params"][k] = v
    h_pen, pooled_proj = enc_pen.apply(merged, ids)

    assert h_pen.shape == h_last.shape
    # penultimate output differs from the final-LN last-layer output
    assert not np.allclose(np.asarray(h_pen), np.asarray(h_last), atol=1e-5)
    assert pooled_proj.shape == (1, 24)
    # pooled comes from the FULL tower: projecting pooled_last by the
    # text_projection kernel reproduces it exactly
    kern = merged["params"]["text_projection"]["kernel"]
    np.testing.assert_allclose(np.asarray(pooled_last @ kern),
                               np.asarray(pooled_proj), rtol=2e-5, atol=2e-6)


# ---------------------------------------------------------------------------
# bundle + engine + pipeline
# ---------------------------------------------------------------------------
@pytest.fixture(scope="module")
def xl_pipe():
    from stable_diffusion_videos_tpu.pipeline import StableDiffusionWalkPipeline
    return StableDiffusionWalkPipeline.tiny_xl(scheduler="ddim")


def test_xl_bundle_flags(xl_pipe):
    models = xl_pipe.models
    assert models.is_xl
    assert not SDModels.tiny().is_xl
    assert models.text_encoder_2() is not None


def test_xl_embed_text_and_pooled(xl_pipe):
    eng = xl_pipe.engine
    ctx = eng.embed_text("hello world")
    assert ctx.shape == (1, 77, xl_pipe.models.unet_config.cross_attention_dim)
    pooled = eng.embed_text_pooled("hello world")
    assert pooled.shape == (1, xl_pipe.models.unet_config.addition_pooled_dim)
    # SD1/2 bundles refuse pooled requests
    from stable_diffusion_videos_tpu.runtime.engine import Engine
    eng_sd = Engine(SDModels.tiny(), scheduler="ddim")
    with pytest.raises(ValueError, match="SDXL"):
        eng_sd.embed_text_pooled("x")


def test_xl_engine_requires_pooled(xl_pipe):
    eng = xl_pipe.engine
    cond = jnp.zeros((1, 77, xl_pipe.models.unet_config.cross_attention_dim))
    noise = jnp.zeros((1, 8, 8, 4))
    with pytest.raises(ValueError, match="pooled"):
        eng.denoise_frames(cond, cond, noise, num_inference_steps=2)


def test_xl_generate_and_pooled_effect(xl_pipe):
    size = xl_pipe.models.default_size
    imgs = xl_pipe.generate(prompt="a cat", num_inference_steps=2,
                            output_type="np", seed=3)
    assert imgs.shape == (1, size, size, 3)
    # same prompt context, different pooled -> different frames
    eng = xl_pipe.engine
    cond = eng.embed_text("a cat")
    noise = jnp.asarray(xl_pipe.init_noise(3, (1, size // 8, size // 8, 4)))
    dp = xl_pipe.models.unet_config.addition_pooled_dim
    a = eng.denoise_frames(cond, cond, noise, num_inference_steps=2,
                           pooled=jnp.zeros((1, dp)),
                           uncond_pooled=jnp.zeros((1, dp)))
    b = eng.denoise_frames(cond, cond, noise, num_inference_steps=2,
                           pooled=jnp.ones((1, dp)) * 3.0,
                           uncond_pooled=jnp.zeros((1, dp)))
    assert not np.allclose(a, b)


def test_xl_generate_precomputed_requires_pooled(xl_pipe):
    ctx = np.zeros((1, 77, xl_pipe.models.unet_config.cross_attention_dim),
                   np.float32)
    with pytest.raises(ValueError, match="pooled"):
        xl_pipe.generate(text_embeddings=ctx, num_inference_steps=2)


def test_xl_walk_e2e(tmp_path, xl_pipe):
    out = xl_pipe.walk(prompts=["a", "b"], seeds=[1, 2],
                       num_interpolation_steps=3, output_dir=str(tmp_path),
                       name="xlwalk", num_inference_steps=2, fps=5,
                       batch_size=2)
    from pathlib import Path
    assert Path(out).exists() and Path(out).stat().st_size > 1000
    frames = sorted((tmp_path / "xlwalk" / "xlwalk_000000").glob("frame*.png"))
    assert len(frames) == 3


# ---------------------------------------------------------------------------
# weight conversion
# ---------------------------------------------------------------------------
def _tree_equal(a, b, path=""):
    assert set(a.keys()) == set(b.keys()), (
        f"{path}: {set(a) ^ set(b)} differ")
    for k in a:
        if isinstance(a[k], dict):
            _tree_equal(a[k], b[k], f"{path}/{k}")
        else:
            np.testing.assert_array_equal(np.asarray(a[k]), np.asarray(b[k]),
                                          err_msg=f"{path}/{k}")


def test_xl_unet_converter_roundtrip(xl_unet):
    import stable_diffusion_videos_tpu.models.weights as W
    cfg, _, params = xl_unet
    sd = W.export_unet(params, cfg)
    assert "add_embedding.linear_1.weight" in sd
    assert "down_blocks.1.attentions.0.transformer_blocks.1.attn1.to_q.weight" in sd
    back = W.convert_unet(sd, cfg)
    _tree_equal(jax.tree.map(np.asarray, dict(params)), back)


def test_xl_text_encoder_projection_roundtrip():
    import stable_diffusion_videos_tpu.models.weights as W
    cfg = CLIPTextConfig(vocab_size=100, hidden_size=16, intermediate_size=32,
                         num_layers=2, num_heads=2, penultimate_hidden=True,
                         projection_dim=24)
    model = CLIPTextEncoder(cfg)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 77), jnp.int32))
    sd = W.export_text_encoder(params, cfg)
    assert "text_projection.weight" in sd
    back = W.convert_text_encoder(sd, cfg)
    _tree_equal(jax.tree.map(np.asarray, dict(params)), back)


def test_unet_config_from_json_sdxl():
    """Parse the published SDXL-base unet config shape."""
    import stable_diffusion_videos_tpu.models.weights as W
    cfg = W._unet_config_from_json({
        "sample_size": 128, "in_channels": 4, "out_channels": 4,
        "block_out_channels": [320, 640, 1280], "layers_per_block": 2,
        "cross_attention_dim": 2048, "attention_head_dim": [5, 10, 20],
        "transformer_layers_per_block": [1, 2, 10],
        "addition_embed_type": "text_time", "addition_time_embed_dim": 256,
        "projection_class_embeddings_input_dim": 2816,
        "down_block_types": ["DownBlock2D", "CrossAttnDownBlock2D",
                             "CrossAttnDownBlock2D"],
    })
    assert cfg.attn_levels == (False, True, True)
    assert cfg.depth(2) == 10
    assert cfg.addition_embed_dim == 256
    assert cfg.addition_pooled_dim == 1280


def test_xl_clip_projection_parity_vs_transformers():
    """Penultimate hidden state + projected pooled output vs a real
    transformers CLIPTextModelWithProjection (the SDXL tower-2 contract:
    diffusers reads encoder_output.hidden_states[-2] and the projected
    pooled output)."""
    torch = pytest.importorskip("torch")
    import transformers

    import stable_diffusion_videos_tpu.models.weights as W

    # eos_token_id=99 = the vocab's top id, mirroring CLIP's real layout
    # (eos 49407 == vocab_size-1); transformers pools the first eos position,
    # this implementation pools argmax(ids) — identical when eos is the max
    # id, which both SDXL tokenizers guarantee (tokenizer pads with eos,
    # tokenizer_2 pads with 0)
    hf_cfg = transformers.CLIPTextConfig(
        vocab_size=100, hidden_size=32, intermediate_size=64,
        num_hidden_layers=3, num_attention_heads=2,
        max_position_embeddings=77, hidden_act="gelu", projection_dim=24,
        eos_token_id=99)
    torch.manual_seed(0)
    hf = transformers.CLIPTextModelWithProjection(hf_cfg).eval()

    ids = np.array([[10, 5, 9, 3, 99] + [0] * 72], np.int32)
    with torch.no_grad():
        out = hf(torch.tensor(ids, dtype=torch.long),
                 output_hidden_states=True)
        want_h = out.hidden_states[-2].numpy()
        want_pooled = out.text_embeds.numpy()

    cfg = CLIPTextConfig(vocab_size=100, hidden_size=32, intermediate_size=64,
                         num_layers=3, num_heads=2, hidden_act="gelu",
                         penultimate_hidden=True, projection_dim=24)
    sd = {k: v.numpy() for k, v in hf.state_dict().items()}
    params = W._to_jnp(W.convert_text_encoder(sd, cfg))
    got_h, got_pooled = CLIPTextEncoder(cfg).apply(params, jnp.asarray(ids))
    np.testing.assert_allclose(np.asarray(got_h), want_h,
                               atol=2e-5, rtol=2e-4)
    np.testing.assert_allclose(np.asarray(got_pooled), want_pooled,
                               atol=2e-5, rtol=2e-4)


def test_load_sdxl_checkpoint_dir(tmp_path):
    """A diffusers-layout SDXL directory (unet + vae + dual text towers)
    loads into an is_xl bundle that generates end to end."""
    import json as _json

    from safetensors.numpy import save_file

    import stable_diffusion_videos_tpu.models.weights as W
    from stable_diffusion_videos_tpu.models.vae import (AutoencoderKL,
                                                        VAEConfig)

    src = SDModels.tiny_xl()
    root = tmp_path / "ckpt"
    for sub in ("unet", "vae", "text_encoder", "text_encoder_2",
                "tokenizer", "scheduler"):
        (root / sub).mkdir(parents=True)

    def save(sub, sd, cfg_json):
        # export_* returns transposed VIEWS; safetensors writes raw buffers,
        # so non-contiguous arrays must be materialised first
        save_file({k: np.ascontiguousarray(v, np.float32)
                   for k, v in sd.items()},
                  str(root / sub / "model.safetensors"))
        (root / sub / "config.json").write_text(_json.dumps(cfg_json))

    ucfg = src.unet_config
    save("unet", W.export_unet(src.params["unet"], ucfg), {
        "sample_size": ucfg.sample_size, "in_channels": 4, "out_channels": 4,
        "block_out_channels": list(ucfg.block_out_channels),
        "layers_per_block": 1, "cross_attention_dim": 32,
        "attention_head_dim": [2, 2],
        "transformer_layers_per_block": [0, 2],
        "addition_embed_type": "text_time",
        "addition_time_embed_dim": ucfg.addition_embed_dim,
        "projection_class_embeddings_input_dim":
            ucfg.addition_pooled_dim + 6 * ucfg.addition_embed_dim,
        "down_block_types": ["DownBlock2D", "CrossAttnDownBlock2D"],
    })
    save("vae", W.export_vae(src.params["vae"], src.vae_config), {
        "block_out_channels": [32, 64], "layers_per_block": 1,
        "scaling_factor": 0.13025,
    })
    save("text_encoder",
         W.export_text_encoder(src.params["text_encoder"], src.text_config), {
             "vocab_size": 1000, "hidden_size": 16, "intermediate_size": 32,
             "num_hidden_layers": 2, "num_attention_heads": 2,
             "hidden_act": "quick_gelu"})
    save("text_encoder_2",
         W.export_text_encoder(src.params["text_encoder_2"],
                               src.text_config_2), {
             "vocab_size": 1000, "hidden_size": 16, "intermediate_size": 32,
             "num_hidden_layers": 2, "num_attention_heads": 2,
             "hidden_act": "gelu",
             "projection_dim": src.text_config_2.projection_dim})
    (root / "scheduler" / "scheduler_config.json").write_text(_json.dumps(
        {"num_train_timesteps": 1000}))
    vocab = {"<|startoftext|>": 0, "<|endoftext|>": 1, "a</w>": 2, "b</w>": 3}
    (root / "tokenizer" / "vocab.json").write_text(_json.dumps(vocab))
    (root / "tokenizer" / "merges.txt").write_text("#version: 0.2\n")

    models = SDModels.from_pretrained(str(root), dtype=jnp.float32,
                                      with_safety=False)
    assert models.is_xl
    assert models.vae_config.scaling_factor == pytest.approx(0.13025)
    assert models.text_config_2.projection_dim == \
        src.text_config_2.projection_dim
    _tree_equal(jax.tree.map(np.asarray, dict(src.params["unet"])),
                jax.tree.map(np.asarray, dict(models.params["unet"])))

    from stable_diffusion_videos_tpu.pipeline import StableDiffusionWalkPipeline
    pipe = StableDiffusionWalkPipeline(models, scheduler="ddim")
    imgs = pipe.generate(prompt="a b", num_inference_steps=2,
                         output_type="np", seed=1)
    assert imgs.shape[0] == 1 and np.isfinite(imgs).all()


def test_tokenizer_pad_token_id(tmp_path):
    """SDXL's tokenizer_2 pads with 0 instead of eos; pooled-embedding
    argmax still lands on the eos position either way."""
    import json as _json

    from stable_diffusion_videos_tpu.models.tokenizer import CLIPBPETokenizer
    vocab = {"<|startoftext|>": 0, "<|endoftext|>": 9, "a</w>": 2}
    (tmp_path / "vocab.json").write_text(_json.dumps(vocab))
    (tmp_path / "merges.txt").write_text("#version: 0.2\n")
    tok = CLIPBPETokenizer(tmp_path / "vocab.json", tmp_path / "merges.txt")
    tok2 = CLIPBPETokenizer(tmp_path / "vocab.json", tmp_path / "merges.txt",
                            pad_token_id=0)
    ids = tok(["a"])["input_ids"][0]
    ids2 = tok2(["a"])["input_ids"][0]
    assert list(ids[:3]) == [0, 2, 9] and (ids[3:] == 9).all()
    assert list(ids2[:3]) == [0, 2, 9] and (ids2[3:] == 0).all()
    assert ids.argmax() == ids2.argmax() == 2  # eos position for pooling


def test_xl_bundle_save_load_roundtrip(tmp_path):
    models = SDModels.tiny_xl()
    models.save(tmp_path / "bundle")
    back = SDModels.load(tmp_path / "bundle")
    assert back.is_xl
    assert back.text_config_2 == models.text_config_2
    assert back.unet_config == models.unet_config
    a = jax.tree.leaves(models.params["text_encoder_2"])
    b = jax.tree.leaves(back.params["text_encoder_2"])
    assert len(a) == len(b)
    np.testing.assert_array_equal(np.asarray(a[0]), np.asarray(b[0]))


def test_xl_generate_images(tmp_path, xl_pipe):
    from stable_diffusion_videos_tpu.pipeline.image_generation import \
        generate_images
    paths = generate_images(xl_pipe, "a cat", batch_size=2, num_batches=1,
                            seeds=[3, 4], num_inference_steps=2,
                            output_dir=str(tmp_path))
    assert len(paths) == 2
    from pathlib import Path
    assert all(Path(p).stat().st_size > 100 for p in paths)


def test_load_sdxl_refiner_layout(tmp_path):
    """The SDXL-refiner ships only the bigG tower and conditions on 5
    time_ids (aesthetic score instead of target size); the loader derives
    the pooled/num_ids split from tower 2's projection_dim and falls back
    to tokenizer_2/ for the vocab."""
    import json as _json

    from safetensors.numpy import save_file

    import stable_diffusion_videos_tpu.models.weights as W
    from stable_diffusion_videos_tpu.models.unet import UNetConfig
    from stable_diffusion_videos_tpu.models.vae import (AutoencoderKL,
                                                        VAEConfig)

    # tiny refiner-flavoured geometry: single 16-wide tower IS the context
    ucfg = UNetConfig(sample_size=8, block_out_channels=(32, 64),
                      layers_per_block=1, cross_attention_dim=16,
                      attention_head_dim=2, attn_levels=(False, True),
                      transformer_depth=(0, 2),
                      addition_embed_dim=8, addition_pooled_dim=16,
                      addition_num_ids=5)
    tcfg2 = CLIPTextConfig(vocab_size=1000, hidden_size=16,
                           intermediate_size=32, num_layers=2, num_heads=2,
                           penultimate_hidden=True, projection_dim=16)
    vcfg = VAEConfig.tiny()
    m = UNet2DCondition(ucfg)
    lat = jnp.zeros((1, 8, 8, 4))
    up = m.init(jax.random.PRNGKey(0), lat, jnp.zeros((1,)),
                jnp.zeros((1, 7, 16)), jnp.zeros((1, 16)),
                jnp.zeros((1, 5)))
    enc2 = CLIPTextEncoder(tcfg2)
    tp2 = enc2.init(jax.random.PRNGKey(1), jnp.zeros((1, 77), jnp.int32))
    vae = AutoencoderKL(vcfg)
    vp = vae.init(jax.random.PRNGKey(2), jnp.zeros((1, 32, 32, 3)))

    root = tmp_path / "refiner"
    for sub in ("unet", "vae", "text_encoder_2", "tokenizer_2", "scheduler"):
        (root / sub).mkdir(parents=True)

    def save(sub, sd, cfg_json):
        save_file({k: np.ascontiguousarray(v, np.float32)
                   for k, v in sd.items()},
                  str(root / sub / "model.safetensors"))
        (root / sub / "config.json").write_text(_json.dumps(cfg_json))

    save("unet", W.export_unet(up, ucfg), {
        "sample_size": 8, "in_channels": 4, "out_channels": 4,
        "block_out_channels": [32, 64], "layers_per_block": 1,
        "cross_attention_dim": 16, "attention_head_dim": [2, 2],
        "transformer_layers_per_block": [0, 2],
        "addition_embed_type": "text_time", "addition_time_embed_dim": 8,
        # refiner-style projection width: pooled 16 + 5 x 8
        "projection_class_embeddings_input_dim": 16 + 5 * 8,
        "down_block_types": ["DownBlock2D", "CrossAttnDownBlock2D"],
    })
    save("vae", W.export_vae(vp, vcfg),
         {"block_out_channels": [32, 64], "layers_per_block": 1})
    save("text_encoder_2", W.export_text_encoder(tp2, tcfg2), {
        "vocab_size": 1000, "hidden_size": 16, "intermediate_size": 32,
        "num_hidden_layers": 2, "num_attention_heads": 2,
        "hidden_act": "gelu", "projection_dim": 16})
    (root / "scheduler" / "scheduler_config.json").write_text("{}")
    vocab = {"<|startoftext|>": 0, "<|endoftext|>": 1, "a</w>": 2}
    (root / "tokenizer_2" / "vocab.json").write_text(_json.dumps(vocab))
    (root / "tokenizer_2" / "merges.txt").write_text("#version: 0.2\n")

    models = SDModels.from_pretrained(str(root), dtype=jnp.float32,
                                      with_safety=False)
    assert models.is_xl
    assert models.unet_config.addition_num_ids == 5
    assert models.unet_config.addition_pooled_dim == 16
    assert models.text_config == models.text_config_2  # tower 2 is primary

    from stable_diffusion_videos_tpu.pipeline import StableDiffusionWalkPipeline
    pipe = StableDiffusionWalkPipeline(models, scheduler="ddim")
    # refiner's real job: img2img over a base-model frame
    img = np.random.default_rng(0).random((32, 32, 3)).astype(np.float32)
    out = pipe.img2img(img, "a", strength=0.3, num_inference_steps=4,
                       output_type="np")
    assert out.shape == (1, 32, 32, 3) and np.isfinite(out).all()


def test_example_sdxl_walk_smoke(tmp_path, monkeypatch):
    """Drive examples/sdxl_walk.py's base path on the tiny XL bundle."""
    import sys
    from pathlib import Path
    sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "examples"))
    import sdxl_walk

    monkeypatch.setattr(sys, "argv", [
        "sdxl_walk.py", "--steps", "2", "--num-inference-steps", "3",
        "--batch-size", "2", "--output-dir", str(tmp_path),
        "--name", "xl_ex", "--fps", "5"])
    sdxl_walk.main()
    vids = list((tmp_path / "xl_ex").glob("xl_ex.*"))
    assert vids and vids[0].stat().st_size > 1000


def test_xl_on_tp_mesh():
    """SDXL bundle on a data x model (TP) mesh: tower-2 params shard or
    replicate cleanly and the pooled-conditioned program executes."""
    from stable_diffusion_videos_tpu.parallel.mesh import make_mesh
    from stable_diffusion_videos_tpu.runtime.engine import Engine
    mesh = make_mesh(data=4, model=2)
    eng = Engine(SDModels.tiny_xl(), mesh=mesh, scheduler="ddim")
    cond = jnp.zeros((4, 77, 32))
    noise = jnp.zeros((4, 8, 8, 4))
    pooled = jnp.zeros((4, 16))
    out = eng.denoise_frames(cond, cond, noise, num_inference_steps=2,
                             pooled=pooled, uncond_pooled=pooled[:1])
    assert out.shape[0] == 4
    assert eng.embed_text("hello").shape == (1, 77, 32)


def test_xl_img2img_and_inpaint(xl_pipe):
    size = xl_pipe.models.default_size
    img = np.random.default_rng(0).random((size, size, 3)).astype(np.float32)
    out = xl_pipe.img2img(img, "x", strength=0.5, num_inference_steps=4,
                          output_type="np")
    assert out.shape == (1, size, size, 3)
    mask = np.zeros((size, size), np.float32)
    mask[size // 4: size // 2, :] = 1.0
    out = xl_pipe.inpaint(img, mask, "y", num_inference_steps=4,
                          output_type="np")
    assert out.shape == (1, size, size, 3)


def test_sd_xl_refiner_config_geometry():
    """Refiner constructor: 4 levels, attention on the middle two at D=64,
    depth-4 transformers, bigG-only context, 5-id text_time conditioning."""
    cfg = UNetConfig.sd_xl_refiner()
    assert cfg.block_out_channels == (384, 768, 1536, 1536)
    assert cfg.attn_levels == (False, True, True, False)
    assert cfg.cross_attention_dim == 1280
    assert cfg.addition_num_ids == 5
    assert cfg.addition_pooled_dim == 1280
    # head counts = channels / 64 on the attention levels
    assert cfg.heads(1) * 64 == 768
    assert cfg.heads(2) * 64 == 1536
    assert cfg.depth(1) == cfg.depth(2) == 4
