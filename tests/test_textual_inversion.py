"""Textual-inversion loading tests.

Adapter files are synthesised with hand-written keys per ecosystem format
(diffusers ``learned_embeds``, Automatic1111 ``.pt``/``.safetensors``, SDXL
``clip_l``/``clip_g``), independent of the loader's own mapping code.  The
reference repo has no textual-inversion support.
"""

import numpy as np
import pytest

from stable_diffusion_videos_tpu.models.bundle import SDModels
from stable_diffusion_videos_tpu.models.textual_inversion import (
    apply_textual_inversion, apply_textual_inversions, parse_ti_arg,
    parse_ti_file)
from stable_diffusion_videos_tpu.models.tokenizer import (
    TextualInversionTokenizer)

RNG = np.random.default_rng(7)


def _save_st(tmp_path, tensors, name="emb.safetensors"):
    from safetensors.numpy import save_file
    path = tmp_path / name
    save_file({k: np.ascontiguousarray(v, np.float32)
               for k, v in tensors.items()}, str(path))
    return path


@pytest.fixture(scope="module")
def tiny():
    return SDModels.tiny()


@pytest.fixture(scope="module")
def tiny_xl():
    return SDModels.tiny_xl()


# ---------------------------------------------------------------------------
# file parsing
# ---------------------------------------------------------------------------

def test_parse_diffusers_single_key(tmp_path):
    vec = RNG.standard_normal((32,)).astype(np.float32)
    f = _save_st(tmp_path, {"<cat-toy>": vec})
    ti = parse_ti_file(f)
    assert ti.token == "<cat-toy>"
    assert ti.n_vectors == 1
    np.testing.assert_array_equal(ti.vectors["l"][0], vec)


def test_parse_a1111_pt(tmp_path):
    import torch
    vec = RNG.standard_normal((3, 32)).astype(np.float32)
    path = tmp_path / "mything.pt"
    torch.save({"string_to_param": {"*": torch.from_numpy(vec)},
                "name": "mything", "step": 500}, path)
    ti = parse_ti_file(path)
    assert ti.token == "mything"
    assert ti.n_vectors == 3
    np.testing.assert_allclose(ti.vectors["l"], vec)


def test_parse_a1111_safetensors_token_from_filename(tmp_path):
    vec = RNG.standard_normal((2, 32)).astype(np.float32)
    f = _save_st(tmp_path, {"emb_params": vec}, "easynegative.safetensors")
    ti = parse_ti_file(f)
    assert ti.token == "easynegative"
    assert ti.n_vectors == 2


def test_parse_sdxl_dual(tmp_path):
    l = RNG.standard_normal((2, 16)).astype(np.float32)
    g = RNG.standard_normal((2, 16)).astype(np.float32)
    f = _save_st(tmp_path, {"clip_l": l, "clip_g": g})
    ti = parse_ti_file(f, token="<style>")
    assert ti.token == "<style>"
    np.testing.assert_array_equal(ti.vectors["l"], l)
    np.testing.assert_array_equal(ti.vectors["g"], g)


def test_parse_rejects_garbage(tmp_path):
    f = _save_st(tmp_path, {"a": np.zeros((2, 2)), "b": np.zeros((3, 3))})
    with pytest.raises(ValueError, match="not a recognised"):
        parse_ti_file(f)


# ---------------------------------------------------------------------------
# merge into a single-tower bundle
# ---------------------------------------------------------------------------

def test_apply_extends_vocab_and_tokenizer(tiny, tmp_path):
    D = tiny.text_config.hidden_size
    V = tiny.text_config.vocab_size
    vec = RNG.standard_normal((2, D)).astype(np.float32)
    f = _save_st(tmp_path, {"<cat-toy>": vec})
    m = apply_textual_inversion(tiny, f)

    assert m.text_config.vocab_size == V + 2
    assert m.text_config.eos_token_id == tiny.tokenizer.eos_token_id
    emb = np.asarray(m.params["text_encoder"]["params"]["token_embedding"]
                     ["embedding"])
    assert emb.shape[0] == V + 2
    np.testing.assert_allclose(emb[V:], vec, rtol=1e-6)

    # trigger splices into the id stream, case-insensitively
    ids = m.tokenizer.encode("a photo of <CAT-toy> here")
    assert [V, V + 1] == [i for i in ids if i >= V]
    base_ids = tiny.tokenizer.encode("a photo of  here")
    assert [i for i in ids if i < V] == base_ids
    # prompts without the trigger are untouched
    assert m.tokenizer.encode("plain prompt") == \
        tiny.tokenizer.encode("plain prompt")
    # base bundle untouched
    assert tiny.text_config.vocab_size == V
    assert not isinstance(tiny.tokenizer, TextualInversionTokenizer)


def test_pooled_output_uses_real_eos_not_max_id(tiny, tmp_path):
    """With ids above EOS in the vocab, argmax-style pooling would pick the
    TI token; the pinned eos_token_id must keep pooling at the EOS slot."""
    import jax.numpy as jnp
    D = tiny.text_config.hidden_size
    vec = RNG.standard_normal((1, D)).astype(np.float32)
    f = _save_st(tmp_path, {"<x>": vec})
    m = apply_textual_inversion(tiny, f)
    enc = m.text_encoder()
    eos = tiny.tokenizer.eos_token_id
    bos = tiny.tokenizer.bos_token_id
    V = tiny.text_config.vocab_size
    ids = np.full((1, 77), eos, np.int32)
    ids[0, :4] = [bos, 5, V, eos]  # TI id at position 2, EOS at 3
    hidden, pooled = enc.apply(m.params["text_encoder"], jnp.asarray(ids))
    np.testing.assert_allclose(np.asarray(pooled), np.asarray(hidden)[:, 3],
                               rtol=1e-5, atol=1e-6)
    # and matches the base model's pooling convention on trigger-free ids
    ids0 = np.full((1, 77), eos, np.int32)
    ids0[0, :3] = [bos, 5, eos]
    _, pooled_base = tiny.text_encoder().apply(
        tiny.params["text_encoder"], jnp.asarray(ids0))
    _, pooled_ext = enc.apply(m.params["text_encoder"], jnp.asarray(ids0))
    np.testing.assert_allclose(np.asarray(pooled_ext),
                               np.asarray(pooled_base), rtol=1e-5, atol=1e-6)


def test_width_mismatch_raises(tiny, tmp_path):
    f = _save_st(tmp_path, {"<bad>": RNG.standard_normal((2, 48))})
    with pytest.raises(ValueError, match="hidden size"):
        apply_textual_inversion(tiny, f)


def test_multiple_embeddings_stack(tiny, tmp_path):
    D = tiny.text_config.hidden_size
    V = tiny.text_config.vocab_size
    f1 = _save_st(tmp_path, {"<a>": RNG.standard_normal((1, D))},
                  "a.safetensors")
    f2 = _save_st(tmp_path, {"<b>": RNG.standard_normal((2, D))},
                  "b.safetensors")
    m = apply_textual_inversions(tiny, [f1, (f2, "<bee>")])
    assert m.text_config.vocab_size == V + 3
    assert m.tokenizer.encode("<a>") == [V]
    assert m.tokenizer.encode("<bee>") == [V + 1, V + 2]


# ---------------------------------------------------------------------------
# SDXL dual tower
# ---------------------------------------------------------------------------

def test_apply_sdxl_dual(tiny_xl, tmp_path):
    D1 = tiny_xl.text_config.hidden_size
    D2 = tiny_xl.text_config_2.hidden_size
    V1 = tiny_xl.text_config.vocab_size
    V2 = tiny_xl.text_config_2.vocab_size
    l = RNG.standard_normal((2, D1)).astype(np.float32)
    g = RNG.standard_normal((2, D2)).astype(np.float32)
    f = _save_st(tmp_path, {"clip_l": l, "clip_g": g}, "style.safetensors")
    m = apply_textual_inversion(tiny_xl, f, token="<style>")

    assert m.text_config.vocab_size == V1 + 2
    assert m.text_config_2.vocab_size == V2 + 2
    np.testing.assert_allclose(
        np.asarray(m.params["text_encoder"]["params"]["token_embedding"]
                   ["embedding"])[V1:], l, rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(m.params["text_encoder_2"]["params"]["token_embedding"]
                   ["embedding"])[V2:], g, rtol=1e-6)
    assert m.tokenizer.encode("<style>") == [V1, V1 + 1]
    assert m.tokenizer_2 is not None
    assert m.tokenizer_2.encode("<style>") == [V2, V2 + 1]


def test_sdxl_requires_dual_file(tiny_xl, tmp_path):
    D1 = tiny_xl.text_config.hidden_size
    f = _save_st(tmp_path, {"<x>": RNG.standard_normal((1, D1))})
    with pytest.raises(ValueError, match="clip_l and clip_g"):
        apply_textual_inversion(tiny_xl, f)


# ---------------------------------------------------------------------------
# plumbing
# ---------------------------------------------------------------------------

def test_engine_embeds_trigger_prompt(tiny, tmp_path):
    D = tiny.text_config.hidden_size
    f = _save_st(tmp_path, {"<thing>": RNG.standard_normal((2, D))})
    m = apply_textual_inversion(tiny, f)
    from stable_diffusion_videos_tpu.runtime.engine import Engine
    eng = Engine(m)
    e1 = np.asarray(eng.embed_text("a <thing> on a table"))
    e0 = np.asarray(eng.embed_text("a  on a table"))
    assert e1.shape == e0.shape
    assert not np.allclose(e1, e0, atol=1e-5)


def test_bundle_save_load_roundtrip(tiny, tmp_path):
    D = tiny.text_config.hidden_size
    V = tiny.text_config.vocab_size
    f = _save_st(tmp_path, {"<cat-toy>": RNG.standard_normal((2, D))})
    m = apply_textual_inversion(tiny, f)
    m.save(tmp_path / "bundle")
    m2 = SDModels.load(tmp_path / "bundle")
    assert m2.text_config.vocab_size == V + 2
    assert m2.text_config.eos_token_id == tiny.tokenizer.eos_token_id
    assert m2.tokenizer.encode("a <cat-toy>!") == \
        m.tokenizer.encode("a <cat-toy>!")
    np.testing.assert_array_equal(
        np.asarray(m2.params["text_encoder"]["params"]["token_embedding"]
                   ["embedding"]),
        np.asarray(m.params["text_encoder"]["params"]["token_embedding"]
                   ["embedding"]))


def test_parse_ti_arg():
    assert parse_ti_arg("x.safetensors") == ("x.safetensors", None)
    assert parse_ti_arg("x.safetensors:<tok>") == ("x.safetensors", "<tok>")
    assert parse_ti_arg("dir/emb.pt:mytoken") == ("dir/emb.pt", "mytoken")
    assert parse_ti_arg("dir/with:colon.pt") == ("dir/with:colon.pt", None)


def test_pipeline_from_pretrained_with_ti(tmp_path):
    """Integration: single-file checkpoint + textual inversion through the
    product entry point, then an embed with the trigger."""
    import sys
    from pathlib import Path
    sys.path.insert(0, str(Path(__file__).parent))
    from test_ldm import _sd1_flat, _save_single_file, _write_tokenizer
    from stable_diffusion_videos_tpu.pipeline import (
        StableDiffusionWalkPipeline)
    tiny = SDModels.tiny()
    ck = _save_single_file(tmp_path, _sd1_flat(tiny))
    tok_dir = _write_tokenizer(tmp_path)

    # width must match the real tokenizer'd bundle's text tower
    base = SDModels.from_pretrained(str(ck), tokenizer_dir=str(tok_dir),
                                    dtype=np.float32)
    D = base.text_config.hidden_size
    V = base.text_config.vocab_size
    f = _save_st(tmp_path, {"<cat-toy>": RNG.standard_normal((1, D))})
    pipe = StableDiffusionWalkPipeline.from_pretrained(
        str(ck), tokenizer_dir=str(tok_dir), dtype=np.float32,
        textual_inversion=[(f, None)])
    assert pipe.models.text_config.vocab_size == V + 1
    ids = pipe.models.tokenizer.encode("a <cat-toy> photo")
    assert V in ids
