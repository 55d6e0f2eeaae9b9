"""Prompt emphasis weighting + long-prompt chunking.

A community-standard extension the reference lacks (prompts pass verbatim
through the 77-token CLIP window, ``stable_diffusion_pipeline.py:291-306``).
"""

import numpy as np
import pytest

from stable_diffusion_videos_tpu.core.prompt_weighting import (
    apply_token_weights, chunks_needed, encode_weighted,
    has_prompt_weighting, parse_prompt_attention, strip_prompt_weights)
from stable_diffusion_videos_tpu.models.tokenizer import HashTokenizer


# ---------------------------------------------------------------------------
# parser
# ---------------------------------------------------------------------------

def test_parse_plain():
    assert parse_prompt_attention("a dog on a hill") == \
        [("a dog on a hill", 1.0)]


def test_parse_emphasis_and_deemphasis():
    frags = parse_prompt_attention("a (red) [cat]")
    assert frags == [("a ", 1.0), ("red", pytest.approx(1.1)),
                     (" ", 1.0), ("cat", pytest.approx(1 / 1.1))]


def test_parse_explicit_weight():
    assert parse_prompt_attention("(red:1.5) car") == \
        [("red", 1.5), (" car", 1.0)]


def test_parse_nesting_composes():
    frags = parse_prompt_attention("((deep))")
    assert frags == [("deep", pytest.approx(1.1 * 1.1))]
    frags = parse_prompt_attention("(outer (inner:2.0) tail)")
    # the outer ')' multiplies everything in its range, inner included
    assert frags == [("outer ", pytest.approx(1.1)),
                     ("inner", pytest.approx(2.2)),
                     (" tail", pytest.approx(1.1))]


def test_parse_escapes_are_literal():
    assert parse_prompt_attention(r"photo \(2023\)") == \
        [("photo (2023)", 1.0)]


def test_parse_unbalanced_degrades_to_literal():
    # open without close: multiplier never applies, text survives
    assert parse_prompt_attention("(abc") == [("abc", 1.0)]
    # close without open: literal character
    assert parse_prompt_attention("abc)") == [("abc)", 1.0)]


def test_parse_break_marker():
    frags = parse_prompt_attention("left BREAK right")
    assert ("BREAK", -1.0) in frags
    texts = [t for t, w in frags if w > 0]
    assert texts == ["left", "right"]


def test_strip_and_detect():
    assert strip_prompt_weights("a (red:1.3) [cat]") == "a red cat"
    assert has_prompt_weighting("a (red) cat")
    assert has_prompt_weighting("a BREAK b")
    assert not has_prompt_weighting("a plain prompt")
    assert not has_prompt_weighting(r"literal \(parens\)")


# ---------------------------------------------------------------------------
# chunked encoding
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def tok():
    return HashTokenizer()


def test_encode_short_prompt(tok):
    ids, w = encode_weighted(tok, "a (red:2.0) cat")
    assert ids.shape == (1, 77) and w.shape == (1, 77)
    assert ids[0, 0] == tok.bos_token_id
    assert w[0, 0] == 1.0 and w[0, -1] == 1.0          # BOS / pad weight 1
    assert 2.0 in w[0]                                  # 'red' carries 2.0
    # the weighted ids match the plain tokenizer's ids for stripped text
    plain = tok(["a red cat"])["input_ids"]
    np.testing.assert_array_equal(ids[0], plain[0])


def test_encode_long_prompt_chunks(tok):
    long = " ".join(f"word{i}" for i in range(100))     # 100 tokens > 75
    ids, w = encode_weighted(tok, long)
    assert ids.shape == (2, 77)
    assert (ids[:, 0] == tok.bos_token_id).all()
    assert chunks_needed(tok, long) == 2
    assert chunks_needed(tok, "short") == 1


def test_encode_break_forces_boundary(tok):
    ids, _ = encode_weighted(tok, "left BREAK right")
    assert ids.shape == (2, 77)


def test_encode_num_chunks_pad_and_error(tok):
    ids, w = encode_weighted(tok, "tiny", num_chunks=3)
    assert ids.shape == (3, 77)
    long = " ".join(f"w{i}" for i in range(100))
    with pytest.raises(ValueError):
        encode_weighted(tok, long, num_chunks=1)


# ---------------------------------------------------------------------------
# weighting math
# ---------------------------------------------------------------------------

def test_apply_token_weights_identity():
    rng = np.random.default_rng(0)
    h = rng.normal(size=(2, 77, 16)).astype(np.float32)
    out = np.asarray(apply_token_weights(h, np.ones((2, 77), np.float32)))
    np.testing.assert_allclose(out, h, rtol=1e-6)


def test_apply_token_weights_preserves_mean():
    rng = np.random.default_rng(1)
    h = rng.normal(size=(3, 77, 8)).astype(np.float32) + 0.5
    w = np.ones((3, 77), np.float32)
    w[:, 5:10] = 1.4
    out = np.asarray(apply_token_weights(h, w))
    np.testing.assert_allclose(out.mean(axis=(1, 2)), h.mean(axis=(1, 2)),
                               rtol=1e-4)
    assert not np.allclose(out, h)


# ---------------------------------------------------------------------------
# engine + pipeline integration (tiny models)
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def pipeline():
    from stable_diffusion_videos_tpu.pipeline import (
        StableDiffusionWalkPipeline)
    return StableDiffusionWalkPipeline.tiny(prompt_weighting=True)


def test_engine_weighted_matches_plain_when_no_syntax(pipeline):
    eng = pipeline.engine
    plain = np.asarray(eng.embed_text("a dog"))
    weighted = np.asarray(eng.embed_text_weighted("a dog"))
    np.testing.assert_allclose(weighted, plain, rtol=2e-5, atol=2e-5)


def test_engine_weighted_emphasis_changes_embedding(pipeline):
    eng = pipeline.engine
    plain = np.asarray(eng.embed_text_weighted("a dog"))
    emph = np.asarray(eng.embed_text_weighted("a (dog:1.5)"))
    assert plain.shape == emph.shape
    assert not np.allclose(plain, emph)


def test_engine_weighted_long_prompt_extends_context(pipeline):
    eng = pipeline.engine
    long = " ".join(f"word{i}" for i in range(100))
    out = eng.embed_text_weighted(long)
    assert out.shape[1] == 2 * 77
    forced = eng.embed_text_weighted("short", num_chunks=2)
    assert forced.shape[1] == 2 * 77


def test_walk_with_prompt_weighting(pipeline, tmp_path):
    video = pipeline.walk(
        prompts=["a (red:1.4) ball", "a [blue] cube"], seeds=[1, 2],
        num_interpolation_steps=2, num_inference_steps=2, fps=2,
        output_dir=str(tmp_path), name="pw", batch_size=2)
    from pathlib import Path
    assert Path(video).exists()
    frames = sorted((tmp_path / "pw").glob("**/frame*.png"))
    assert len(frames) == 2


def test_img2img_with_prompt_weighting():
    from stable_diffusion_videos_tpu.pipeline import (
        StableDiffusionWalkPipeline)
    # ddim: img2img needs a warm-up-free sampler
    pipe = StableDiffusionWalkPipeline.tiny(prompt_weighting=True,
                                            scheduler="ddim")
    rng = np.random.default_rng(5)
    img = (rng.random((32, 32, 3)) * 255).astype(np.uint8)
    out = pipe.img2img(img, "a (sharp:1.3) photo",
                       num_inference_steps=3, strength=0.6,
                       seed=1, output_type="np")
    assert out.shape[1:3] == (32, 32)
    assert np.all(np.isfinite(out))


def test_walk_weighted_long_prompt_with_negative(pipeline, tmp_path):
    """cond spans 2 windows, uncond is short — both must harmonise."""
    long = " ".join(f"word{i}" for i in range(90))
    pipeline.walk(prompts=[long, "b"], seeds=[3, 4],
                  num_interpolation_steps=2, num_inference_steps=2,
                  fps=2, output_dir=str(tmp_path), name="pwl",
                  batch_size=2, make_video=False,
                  negative_prompt="(blurry:1.3)")
    frames = sorted((tmp_path / "pwl").glob("**/frame*.png"))
    assert len(frames) == 2
