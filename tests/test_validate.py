"""End-to-end dry-run of `sdv-tpu validate` on the tiny bundle (VERDICT r3
#5's done-criterion): every stage must run (or skip with a reason) TODAY so
the command is a proven playbook the day a real checkpoint lands."""

import json

import numpy as np
import pytest

from stable_diffusion_videos_tpu.models.bundle import SDModels
from stable_diffusion_videos_tpu.utils.validate import run_validation


@pytest.fixture(scope="module")
def bundle_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("validate")
    SDModels.tiny().save(root / "bundle")
    return root


def test_validate_tiny_bundle_end_to_end(bundle_dir):
    report = run_validation(str(bundle_dir / "bundle"),
                            output_dir=str(bundle_dir / "out"),
                            num_inference_steps=4, step_cache_ks=(2,))
    st = report["stages"]
    assert st["load"]["status"] == "ok"
    assert st["load"]["layout"] == "native bundle"
    assert st["load"]["family"] == "sd"
    assert st["load"]["param_counts"]["unet"] > 0
    assert st["smoke"]["status"] == "ok" and st["smoke"]["finite"]
    assert st["vae_roundtrip"]["status"] == "ok"
    assert isinstance(st["vae_roundtrip"]["psnr_db"], float)
    # optional-input stages skip with a reason instead of erroring
    assert st["walk_parity"]["status"] == "skipped"
    assert "reference-frames" in st["walk_parity"]["reason"]
    assert st["upsample"]["status"] == "skipped"
    assert st["step_cache_curve"]["status"] == "ok"
    assert "ssim_mean" in st["step_cache_curve"]["curve"]["k2"]
    assert report["pass"] is True
    # the report file is the deliverable
    on_disk = json.loads(
        (bundle_dir / "out" / "validation_report.json").read_text())
    assert on_disk["summary"] == report["summary"]
    assert (bundle_dir / "out" / "smoke_frame.png").exists()


def test_validate_with_self_reference_gate(bundle_dir):
    """Full pipeline incl. the parity-gate walk: a model validated against
    its OWN recorded dump passes the gate (the real-weight path unchanged)."""
    from stable_diffusion_videos_tpu.pipeline import (
        StableDiffusionWalkPipeline)
    from stable_diffusion_videos_tpu.utils.parity_gate import (GATE_CONFIG,
                                                               GATE_PROMPTS,
                                                               GATE_SEEDS)
    pipe = StableDiffusionWalkPipeline(SDModels.load(bundle_dir / "bundle"))
    pipe.walk(prompts=list(GATE_PROMPTS), seeds=list(GATE_SEEDS),
              output_dir=str(bundle_dir / "dumps"), name="reference_walk",
              make_video=False, **GATE_CONFIG)
    report = run_validation(
        str(bundle_dir / "bundle"), output_dir=str(bundle_dir / "out2"),
        reference_frames=str(bundle_dir / "dumps" / "reference_walk"),
        num_inference_steps=4, step_cache_ks=(2,))
    wp = report["stages"]["walk_parity"]
    assert wp["status"] == "ok", wp
    assert wp["pass"], wp
    assert report["pass"] is True


def test_validate_survives_broken_stage(bundle_dir, monkeypatch):
    """A stage error is recorded, later stages still run, pass=False."""
    from stable_diffusion_videos_tpu.runtime.engine import Engine
    monkeypatch.setattr(Engine, "encode_image",
                        lambda self, x: (_ for _ in ()).throw(
                            RuntimeError("boom")))
    report = run_validation(str(bundle_dir / "bundle"),
                            output_dir=str(bundle_dir / "out3"),
                            num_inference_steps=2, step_cache_ks=(2,))
    assert report["stages"]["vae_roundtrip"]["status"] == "error"
    assert "boom" in report["stages"]["vae_roundtrip"]["error"]
    assert report["stages"]["step_cache_curve"]["status"] == "ok"
    assert report["pass"] is False


def test_validate_cli_wiring():
    from stable_diffusion_videos_tpu.__main__ import build_parser
    args = build_parser().parse_args(
        ["validate", "/ckpts/sd-v1-4", "--reference-frames", "/dumps/ref",
         "--step-cache-ks", "2", "3", "--num-inference-steps", "8"])
    assert args.checkpoint == "/ckpts/sd-v1-4"
    assert args.step_cache_ks == [2, 3]
    assert args.fn.__name__ == "cmd_validate"
