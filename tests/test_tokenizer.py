"""CLIP BPE tokenizer tests on a synthetic vocab (no checkpoint needed)."""

import json

import numpy as np
import pytest

from stable_diffusion_videos_tpu.models.tokenizer import CLIPBPETokenizer


@pytest.fixture()
def tok(tmp_path):
    vocab = {"<|startoftext|>": 0, "<|endoftext|>": 1,
             "a": 2, "b": 3, "c": 4,
             "a</w>": 5, "b</w>": 6, "c</w>": 7,
             "ab</w>": 8, "ab": 9, "abc</w>": 10, "!</w>": 11}
    merges = "#version: 0.2\na b</w>\na b\nab c</w>\n"
    (tmp_path / "vocab.json").write_text(json.dumps(vocab))
    (tmp_path / "merges.txt").write_text(merges)
    return CLIPBPETokenizer(tmp_path / "vocab.json", tmp_path / "merges.txt")


def test_single_merge(tok):
    assert tok.encode("ab") == [8]          # a+b</w> -> ab</w>
    assert tok.encode("a b") == [5, 6]      # separate words
    assert tok.encode("ba") == [3, 5]       # no merge rule for b+a


def test_chained_merges(tok):
    # abc: a+b -> ab (inner), then ab+c</w> -> abc</w>
    assert tok.encode("abc") == [10]


def test_case_and_whitespace_normalisation(tok):
    assert tok.encode("  AB  ") == tok.encode("ab")


def test_punctuation_split(tok):
    # the regex splits 'ab!' into word 'ab' + punctuation '!'
    assert tok.encode("ab!") == [8, 11]
    assert tok.encode("ab !") == [8, 11]


def test_call_shape_and_special_tokens(tok):
    out = tok(["ab", "a b c"], max_length=8)["input_ids"]
    assert out.shape == (2, 8)
    assert out[0, 0] == 0 and out[0, 1] == 8 and out[0, 2] == 1
    assert (out[0, 3:] == 1).all()  # eos padding
    np.testing.assert_array_equal(out[1, :5], [0, 5, 6, 7, 1])


def test_truncation_keeps_eos(tok):
    out = tok("a b c a b c a b c", max_length=5)["input_ids"]
    assert out.shape == (1, 5)
    assert out[0, 0] == 0 and out[0, -1] == 1


def test_unknown_chars_skipped(tok):
    # characters absent from the vocab produce no ids rather than crashing
    assert tok.encode("zq") == []


def test_interface_requires_gradio():
    pytest.importorskip("gradio", reason="only run where gradio is absent")
    # (if gradio ever appears in this env the gated import works anyway)


def test_interface_import_error_message():
    try:
        import gradio  # noqa: F401
        pytest.skip("gradio installed")
    except ImportError:
        pass
    from stable_diffusion_videos_tpu.app import Interface
    with pytest.raises(ImportError, match="gradio"):
        Interface(pipeline=None)
