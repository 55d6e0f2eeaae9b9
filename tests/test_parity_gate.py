"""Dry-run of the real-weight parity gate plumbing (BASELINE.md clause).

No SD weights exist in this environment, so the gate is exercised with tiny
random-weight pipelines: a pipeline compared against its own recorded
frames must PASS; against a different model's frames must FAIL.  The same
code path runs unchanged with a real checkpoint + reference dump
(docs/parity.md "Real-weight parity gate")."""

import numpy as np
import pytest

from stable_diffusion_videos_tpu.models.bundle import SDModels
from stable_diffusion_videos_tpu.pipeline import StableDiffusionWalkPipeline
from stable_diffusion_videos_tpu.utils.parity_gate import (GATE_CONFIG,
                                                           GATE_PROMPTS,
                                                           GATE_SEEDS,
                                                           run_parity_gate)


@pytest.fixture(scope="module")
def gate_env(tmp_path_factory):
    root = tmp_path_factory.mktemp("gate")
    pipe = StableDiffusionWalkPipeline.tiny()
    # record the "reference" dump with the SAME fixed gate walk
    pipe.walk(prompts=list(GATE_PROMPTS), seeds=list(GATE_SEEDS),
              output_dir=str(root / "dumps"), name="reference_walk",
              make_video=False, **GATE_CONFIG)
    return root, pipe


def test_gate_passes_against_own_frames(gate_env):
    root, pipe = gate_env
    res = run_parity_gate(pipe, str(root / "dumps" / "reference_walk"),
                          str(root / "runs"))
    assert res["pass"], res
    n = (len(GATE_PROMPTS) - 1) * GATE_CONFIG["num_interpolation_steps"]
    assert res["frames"] == n
    assert res["ssim_mean"] > 0.999  # same model, same seeds -> identical
    assert "lpips_mean" not in res  # no weights supplied -> ssim gate
    assert "ssim" in res["gate"]


def test_gate_fails_against_different_model(gate_env, tmp_path):
    root, _ = gate_env
    other = StableDiffusionWalkPipeline(SDModels.tiny(seed=7))
    res = run_parity_gate(other, str(root / "dumps" / "reference_walk"),
                          str(tmp_path / "runs"))
    assert not res["pass"], res


def test_gate_missing_reference_dir(gate_env, tmp_path):
    _, pipe = gate_env
    with pytest.raises(FileNotFoundError):
        run_parity_gate(pipe, str(tmp_path / "nope"), str(tmp_path / "runs"))


def test_gate_cli_wiring():
    from stable_diffusion_videos_tpu.__main__ import build_parser
    args = build_parser().parse_args(
        ["parity-gate", "--reference-frames", "/dumps/ref",
         "--lpips-weights", "/w/lpips.pth"])
    assert args.reference_frames == "/dumps/ref"
    assert args.lpips_weights == "/w/lpips.pth"
    assert args.fn.__name__ == "cmd_parity_gate"
