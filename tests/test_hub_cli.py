"""Hub upload (mocked, offline) + CLI subcommand coverage.

The reference's upload path was dead code (``image_generation.py:215-218``
— after ``return``); here it is live and tested against a monkeypatched
huggingface_hub so the commit-chunking logic is exercised without egress.
"""

import json

import numpy as np
import pytest


def test_get_groups_of_n():
    from stable_diffusion_videos_tpu.hub import get_groups_of_n
    groups = list(get_groups_of_n(3, iter(range(8))))
    assert groups == [[0, 1, 2], [3, 4, 5], [6, 7]]
    with pytest.raises(ValueError):
        list(get_groups_of_n(0, iter(range(3))))


def test_upload_folder_chunked_mocked(monkeypatch, tmp_path):
    import huggingface_hub

    from stable_diffusion_videos_tpu.hub import upload_folder_chunked

    d = tmp_path / "frames"
    (d / "clip0").mkdir(parents=True)
    for i in range(5):
        (d / "clip0" / f"frame{i:06d}.png").write_bytes(b"x" * 10)

    commits = []
    monkeypatch.setattr(huggingface_hub, "create_repo",
                        lambda repo_id, **kw: f"https://hub/{repo_id}")
    monkeypatch.setattr(
        huggingface_hub, "CommitOperationAdd",
        lambda path_in_repo, path_or_fileobj: (path_in_repo, path_or_fileobj))
    monkeypatch.setattr(
        huggingface_hub, "create_commit",
        lambda repo_id, operations, commit_message, **kw: commits.append(
            (commit_message, len(operations))))

    upload_folder_chunked("user/frames", d, n=2)
    assert [n for _, n in commits] == [2, 2, 1]  # 5 files in chunks of 2
    with pytest.raises(ValueError, match="does not exist"):
        upload_folder_chunked("user/frames", tmp_path / "nope")


def test_cli_compare(tmp_path, capsys):
    from PIL import Image

    from stable_diffusion_videos_tpu.__main__ import main

    rng = np.random.default_rng(0)
    for d in ("a", "b"):
        (tmp_path / d).mkdir()
    img = rng.integers(0, 255, (16, 16, 3), np.uint8)
    for d in ("a", "b"):
        Image.fromarray(img).save(tmp_path / d / "frame000000.png")
    main(["compare", "--a", str(tmp_path / "a"), "--b", str(tmp_path / "b")])
    out = json.loads(capsys.readouterr().out)
    assert out["frames"] == 1
    assert out["ssim_mean"] == 1.0
    assert out["psnr_mean"] == float("inf") or out["psnr_mean"] > 99


def test_cli_schedulers_and_help(capsys):
    from stable_diffusion_videos_tpu.__main__ import main
    with pytest.raises(SystemExit) as e:
        main(["--help"])
    assert e.value.code == 0
    assert "walk" in capsys.readouterr().out
