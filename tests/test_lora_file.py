"""Community LoRA file loading tests (kohya / diffusers-peft formats).

The adapter files are synthesised with HAND-WRITTEN key names for the tiny
geometries — independent of ``models/lora_file.py``'s name-mapping code, so
a mapping bug in the loader cannot cancel against an identical bug here.
Reference formats: kohya-ss sd-scripts (``lora_unet_*.lora_down.weight`` /
``.lora_up.weight`` / ``.alpha``; SDXL uses LDM-scheme module names) and
diffusers/peft (``unet.<dotted>.lora_A.weight``).  The reference repo has
no LoRA support (customized models must be re-exported as full diffusers
checkpoints).
"""

import numpy as np
import pytest

from stable_diffusion_videos_tpu.models.bundle import SDModels
from stable_diffusion_videos_tpu.models.lora_file import (
    apply_lora, apply_loras, parse_lora_arg, parse_lora_file)

RNG = np.random.default_rng(0)


def _save(tmp_path, tensors, name="lora.safetensors"):
    from safetensors.numpy import save_file
    path = tmp_path / name
    save_file({k: np.ascontiguousarray(v, np.float32)
               for k, v in tensors.items()}, str(path))
    return path


def _pair(rank, n_in, n_out, spatial=None):
    """(down, up) torch-layout adapter tensors."""
    if spatial:
        down = RNG.standard_normal((rank, n_in, *spatial)) * 0.1
        up = RNG.standard_normal((n_out, rank, 1, 1)) * 0.1
    else:
        down = RNG.standard_normal((rank, n_in)) * 0.1
        up = RNG.standard_normal((n_out, rank)) * 0.1
    return down.astype(np.float32), up.astype(np.float32)


def _expected_linear(base, down, up, scale):
    # ours (in, out); torch delta = up @ down is (out, in)
    return np.asarray(base, np.float32) + scale * (up @ down).T


@pytest.fixture(scope="module")
def tiny():
    return SDModels.tiny()


@pytest.fixture(scope="module")
def tiny_xl():
    return SDModels.tiny_xl()


# ---------------------------------------------------------------------------
# kohya format, SD1-style diffusers module names
# ---------------------------------------------------------------------------

def test_kohya_linear_and_conv_merge(tiny, tmp_path):
    p = tiny.params["unet"]["params"]
    ctx = tiny.unet_config.cross_attention_dim
    w_q = np.asarray(p["down_0_attn_0"]["blocks_0"]["attn2"]["to_q"]["kernel"])
    w_ff = np.asarray(p["up_0_attn_1"]["blocks_0"]["ff"]["proj_in"]["kernel"])
    w_conv = np.asarray(p["down_0_res_0"]["conv1"]["kernel"])  # HWIO 3x3
    w_proj = np.asarray(p["mid_attn"]["proj_in"]["kernel"])    # HWIO 1x1

    r = 4
    dq, uq = _pair(r, w_q.shape[0], w_q.shape[1])
    dff, uff = _pair(r, w_ff.shape[0], w_ff.shape[1])
    dcv, ucv = _pair(r, w_conv.shape[2], w_conv.shape[3], spatial=(3, 3))
    dpj, upj = _pair(r, w_proj.shape[2], w_proj.shape[3], spatial=(1, 1))

    # hand-written kohya keys for the tiny geometry (n_levels=2, lp=1,
    # attn=(True, False): up_blocks.1 == our up level 0)
    f = _save(tmp_path, {
        "lora_unet_down_blocks_0_attentions_0_transformer_blocks_0_attn2"
        "_to_q.lora_down.weight": dq,
        "lora_unet_down_blocks_0_attentions_0_transformer_blocks_0_attn2"
        "_to_q.lora_up.weight": uq,
        "lora_unet_down_blocks_0_attentions_0_transformer_blocks_0_attn2"
        "_to_q.alpha": np.float32(2.0),  # factor 2/4 = 0.5
        "lora_unet_up_blocks_1_attentions_1_transformer_blocks_0_ff_net_0"
        "_proj.lora_down.weight": dff,
        "lora_unet_up_blocks_1_attentions_1_transformer_blocks_0_ff_net_0"
        "_proj.lora_up.weight": uff,
        "lora_unet_down_blocks_0_resnets_0_conv1.lora_down.weight": dcv,
        "lora_unet_down_blocks_0_resnets_0_conv1.lora_up.weight": ucv,
        "lora_unet_mid_block_attentions_0_proj_in.lora_down.weight": dpj,
        "lora_unet_mid_block_attentions_0_proj_in.lora_up.weight": upj,
    })

    scale = 0.7
    merged = apply_lora(tiny, f, scale=scale)
    q = merged.params["unet"]["params"]

    np.testing.assert_allclose(
        np.asarray(q["down_0_attn_0"]["blocks_0"]["attn2"]["to_q"]["kernel"]),
        _expected_linear(w_q, dq, uq, scale * 0.5), rtol=2e-6, atol=2e-6)
    np.testing.assert_allclose(
        np.asarray(q["up_0_attn_1"]["blocks_0"]["ff"]["proj_in"]["kernel"]),
        _expected_linear(w_ff, dff, uff, scale), rtol=2e-6, atol=2e-6)
    # conv3x3: delta_hwio[h,w,i,o] = sum_r up[o,r] * down[r,i,h,w]
    exp_conv = w_conv + scale * np.einsum(
        "or,rihw->hwio", ucv[:, :, 0, 0], dcv)
    np.testing.assert_allclose(
        np.asarray(q["down_0_res_0"]["conv1"]["kernel"]), exp_conv,
        rtol=2e-6, atol=2e-6)
    exp_proj = w_proj + scale * (upj[:, :, 0, 0] @ dpj[:, :, 0, 0]).T[
        None, None]
    np.testing.assert_allclose(
        np.asarray(q["mid_attn"]["proj_in"]["kernel"]), exp_proj,
        rtol=2e-6, atol=2e-6)
    # an unadapted kernel is untouched (same buffer contents)
    np.testing.assert_array_equal(
        np.asarray(q["conv_in"]["kernel"]),
        np.asarray(p["conv_in"]["kernel"]))
    # base bundle untouched
    np.testing.assert_array_equal(
        np.asarray(p["down_0_attn_0"]["blocks_0"]["attn2"]["to_q"]["kernel"]),
        w_q)
    assert ctx  # silence linters


def test_kohya_text_encoder_merge(tiny, tmp_path):
    p = tiny.params["text_encoder"]["params"]
    w = np.asarray(p["layers_1"]["q_proj"]["kernel"])
    w2 = np.asarray(p["layers_0"]["fc2"]["kernel"])
    r = 2
    d1, u1 = _pair(r, w.shape[0], w.shape[1])
    d2, u2 = _pair(r, w2.shape[0], w2.shape[1])
    f = _save(tmp_path, {
        "lora_te_text_model_encoder_layers_1_self_attn_q_proj"
        ".lora_down.weight": d1,
        "lora_te_text_model_encoder_layers_1_self_attn_q_proj"
        ".lora_up.weight": u1,
        "lora_te_text_model_encoder_layers_0_mlp_fc2.lora_down.weight": d2,
        "lora_te_text_model_encoder_layers_0_mlp_fc2.lora_up.weight": u2,
    })
    merged = apply_lora(tiny, f, scale=1.0)
    q = merged.params["text_encoder"]["params"]
    np.testing.assert_allclose(
        np.asarray(q["layers_1"]["q_proj"]["kernel"]),
        _expected_linear(w, d1, u1, 1.0), rtol=2e-6, atol=2e-6)
    np.testing.assert_allclose(
        np.asarray(q["layers_0"]["fc2"]["kernel"]),
        _expected_linear(w2, d2, u2, 1.0), rtol=2e-6, atol=2e-6)


# ---------------------------------------------------------------------------
# kohya SDXL: LDM-scheme unet names + te1/te2
# ---------------------------------------------------------------------------

def test_kohya_xl_ldm_names_and_dual_towers(tiny_xl, tmp_path):
    # tiny_xl geometry: levels (32, 64), lp=1, attn=(False, True), so the
    # LDM input section is: 1 = L0 res, 2 = downsample op, 3 = L1 res+attn;
    # output: 0..1 = up u0 (attn), upsample rides output_blocks_1 module 2
    p = tiny_xl.params["unet"]["params"]
    w_q = np.asarray(
        p["down_1_attn_0"]["blocks_1"]["attn1"]["to_q"]["kernel"])
    w_mid = np.asarray(
        p["mid_attn"]["blocks_0"]["attn2"]["to_k"]["kernel"])
    w_up = np.asarray(
        p["up_1_attn_1"]["blocks_0"]["attn1"]["to_v"]["kernel"])
    t1 = np.asarray(
        tiny_xl.params["text_encoder"]["params"]["layers_0"]["v_proj"]
        ["kernel"])
    t2 = np.asarray(
        tiny_xl.params["text_encoder_2"]["params"]["layers_1"]["out_proj"]
        ["kernel"])
    r = 2
    dq, uq = _pair(r, w_q.shape[0], w_q.shape[1])
    dm, um = _pair(r, w_mid.shape[0], w_mid.shape[1])
    du, uu = _pair(r, w_up.shape[0], w_up.shape[1])
    d1, u1 = _pair(r, t1.shape[0], t1.shape[1])
    d2, u2 = _pair(r, t2.shape[0], t2.shape[1])
    f = _save(tmp_path, {
        "lora_unet_input_blocks_3_1_transformer_blocks_1_attn1_to_q"
        ".lora_down.weight": dq,
        "lora_unet_input_blocks_3_1_transformer_blocks_1_attn1_to_q"
        ".lora_up.weight": uq,
        "lora_unet_middle_block_1_transformer_blocks_0_attn2_to_k"
        ".lora_down.weight": dm,
        "lora_unet_middle_block_1_transformer_blocks_0_attn2_to_k"
        ".lora_up.weight": um,
        # output_blocks_1 is up u=0 (our level 1), resnet/attn index 1
        "lora_unet_output_blocks_1_1_transformer_blocks_0_attn1_to_v"
        ".lora_down.weight": du,
        "lora_unet_output_blocks_1_1_transformer_blocks_0_attn1_to_v"
        ".lora_up.weight": uu,
        "lora_te1_text_model_encoder_layers_0_self_attn_v_proj"
        ".lora_down.weight": d1,
        "lora_te1_text_model_encoder_layers_0_self_attn_v_proj"
        ".lora_up.weight": u1,
        "lora_te2_text_model_encoder_layers_1_self_attn_out_proj"
        ".lora_down.weight": d2,
        "lora_te2_text_model_encoder_layers_1_self_attn_out_proj"
        ".lora_up.weight": u2,
    })
    merged = apply_lora(tiny_xl, f, scale=1.0)
    q = merged.params
    np.testing.assert_allclose(
        np.asarray(q["unet"]["params"]["down_1_attn_0"]["blocks_1"]["attn1"]
                   ["to_q"]["kernel"]),
        _expected_linear(w_q, dq, uq, 1.0), rtol=2e-6, atol=2e-6)
    np.testing.assert_allclose(
        np.asarray(q["unet"]["params"]["mid_attn"]["blocks_0"]["attn2"]
                   ["to_k"]["kernel"]),
        _expected_linear(w_mid, dm, um, 1.0), rtol=2e-6, atol=2e-6)
    np.testing.assert_allclose(
        np.asarray(q["unet"]["params"]["up_1_attn_1"]["blocks_0"]["attn1"]
                   ["to_v"]["kernel"]),
        _expected_linear(w_up, du, uu, 1.0), rtol=2e-6, atol=2e-6)
    np.testing.assert_allclose(
        np.asarray(q["text_encoder"]["params"]["layers_0"]["v_proj"]
                   ["kernel"]),
        _expected_linear(t1, d1, u1, 1.0), rtol=2e-6, atol=2e-6)
    np.testing.assert_allclose(
        np.asarray(q["text_encoder_2"]["params"]["layers_1"]["out_proj"]
                   ["kernel"]),
        _expected_linear(t2, d2, u2, 1.0), rtol=2e-6, atol=2e-6)


# ---------------------------------------------------------------------------
# diffusers/peft format
# ---------------------------------------------------------------------------

def test_diffusers_peft_format(tiny, tmp_path):
    p = tiny.params["unet"]["params"]
    w = np.asarray(p["down_0_attn_0"]["blocks_0"]["attn1"]["to_k"]["kernel"])
    r = 3
    d, u = _pair(r, w.shape[0], w.shape[1])
    f = _save(tmp_path, {
        "unet.down_blocks.0.attentions.0.transformer_blocks.0.attn1.to_k"
        ".lora_A.weight": d,
        "unet.down_blocks.0.attentions.0.transformer_blocks.0.attn1.to_k"
        ".lora_B.weight": u,
    })
    merged = apply_lora(tiny, f, scale=1.0)
    np.testing.assert_allclose(
        np.asarray(merged.params["unet"]["params"]["down_0_attn_0"]
                   ["blocks_0"]["attn1"]["to_k"]["kernel"]),
        _expected_linear(w, d, u, 1.0), rtol=2e-6, atol=2e-6)


# ---------------------------------------------------------------------------
# behavioural / plumbing
# ---------------------------------------------------------------------------

def test_forward_changes_and_scale_zero_noop(tiny, tmp_path):
    import jax.numpy as jnp
    p = tiny.params["unet"]["params"]
    w = np.asarray(p["mid_attn"]["blocks_0"]["attn1"]["to_q"]["kernel"])
    d, u = _pair(4, w.shape[0], w.shape[1])
    f = _save(tmp_path, {
        "lora_unet_mid_block_attentions_0_transformer_blocks_0_attn1_to_q"
        ".lora_down.weight": d,
        "lora_unet_mid_block_attentions_0_transformer_blocks_0_attn1_to_q"
        ".lora_up.weight": u,
    })
    unet = tiny.unet()
    cfg = tiny.unet_config
    x = jnp.asarray(RNG.standard_normal(
        (1, cfg.sample_size, cfg.sample_size, cfg.in_channels)), jnp.float32)
    ctx = jnp.asarray(RNG.standard_normal(
        (1, 7, cfg.cross_attention_dim)), jnp.float32)
    t = jnp.ones((1,))
    base_out = unet.apply(tiny.params["unet"], x, t, ctx)

    zero = apply_lora(tiny, f, scale=0.0)
    np.testing.assert_allclose(
        np.asarray(unet.apply(zero.params["unet"], x, t, ctx)),
        np.asarray(base_out), rtol=1e-6, atol=1e-6)

    one = apply_lora(tiny, f, scale=1.0)
    assert not np.allclose(np.asarray(unet.apply(one.params["unet"], x, t,
                                                 ctx)),
                           np.asarray(base_out), atol=1e-5)


def test_unmatched_modules_raise(tiny, tmp_path):
    d, u = _pair(2, 8, 8)
    f = _save(tmp_path, {
        "lora_unet_down_blocks_7_attentions_9_transformer_blocks_0_attn1"
        "_to_q.lora_down.weight": d,
        "lora_unet_down_blocks_7_attentions_9_transformer_blocks_0_attn1"
        "_to_q.lora_up.weight": u,
    })
    with pytest.raises(ValueError, match="no LoRA module matched"):
        apply_lora(tiny, f)


def test_not_a_lora_file_raises(tiny, tmp_path):
    f = _save(tmp_path, {"some_random_tensor": np.zeros((2, 2))})
    with pytest.raises(ValueError, match="no LoRA modules found"):
        parse_lora_file(f)


def test_trainer_npz_roundtrip(tiny, tmp_path):
    from stable_diffusion_videos_tpu.training.lora import (
        LoRATrainer, init_lora_params, merge_lora)
    lora = init_lora_params(tiny.params["unet"], rank=2, seed=3)
    # give B nonzero values so the delta is real
    import jax
    lora = jax.tree.map(lambda x: x + 0.05, lora)
    path = tmp_path / "trained.npz"
    t = object.__new__(LoRATrainer)
    t.lora, t.rank, t.alpha = lora, 2, 2.0
    t.save_lora(path)
    merged = apply_lora(tiny, path, scale=1.0)
    expect = merge_lora(tiny.params["unet"], lora, 1.0)
    np.testing.assert_allclose(
        np.asarray(jax.tree.leaves(merged.params["unet"])[0]),
        np.asarray(jax.tree.leaves(expect)[0]), rtol=1e-5, atol=1e-5)


def test_apply_loras_stacking_and_cli_arg(tiny, tmp_path):
    p = tiny.params["unet"]["params"]
    w = np.asarray(p["mid_attn"]["blocks_0"]["attn1"]["to_q"]["kernel"])
    d, u = _pair(2, w.shape[0], w.shape[1])
    key = ("lora_unet_mid_block_attentions_0_transformer_blocks_0_attn1"
           "_to_q")
    f1 = _save(tmp_path, {f"{key}.lora_down.weight": d,
                          f"{key}.lora_up.weight": u}, "a.safetensors")
    f2 = _save(tmp_path, {f"{key}.lora_down.weight": d,
                          f"{key}.lora_up.weight": u}, "b.safetensors")
    merged = apply_loras(tiny, [(f1, 0.25), (f2, 0.75)])
    np.testing.assert_allclose(
        np.asarray(merged.params["unet"]["params"]["mid_attn"]["blocks_0"]
                   ["attn1"]["to_q"]["kernel"]),
        _expected_linear(w, d, u, 1.0), rtol=2e-6, atol=2e-6)

    assert parse_lora_arg("x.safetensors") == ("x.safetensors", 1.0)
    assert parse_lora_arg("x.safetensors:0.5") == ("x.safetensors", 0.5)
    assert parse_lora_arg("dir/with:colon.safetensors:2") == \
        ("dir/with:colon.safetensors", 2.0)


def test_pipeline_from_pretrained_with_lora(tmp_path):
    """Integration: single-file checkpoint + LoRA through the product
    entry point."""
    import sys
    sys.path.insert(0, str(__import__("pathlib").Path(__file__).parent))
    from test_ldm import _sd1_flat, _save_single_file, _write_tokenizer
    from stable_diffusion_videos_tpu.pipeline import (
        StableDiffusionWalkPipeline)
    tiny = SDModels.tiny()
    ck = _save_single_file(tmp_path, _sd1_flat(tiny))
    w = np.asarray(tiny.params["unet"]["params"]["mid_attn"]["blocks_0"]
                   ["attn1"]["to_q"]["kernel"])
    d, u = _pair(2, w.shape[0], w.shape[1])
    key = ("lora_unet_mid_block_attentions_0_transformer_blocks_0_attn1"
           "_to_q")
    f = _save(tmp_path, {f"{key}.lora_down.weight": d,
                         f"{key}.lora_up.weight": u})
    pipe = StableDiffusionWalkPipeline.from_pretrained(
        str(ck), tokenizer_dir=str(_write_tokenizer(tmp_path)),
        lora=[(f, 0.5)], dtype=np.float32)
    np.testing.assert_allclose(
        np.asarray(pipe.models.params["unet"]["params"]["mid_attn"]
                   ["blocks_0"]["attn1"]["to_q"]["kernel"]),
        _expected_linear(w, d, u, 0.5), rtol=1e-4, atol=1e-4)
