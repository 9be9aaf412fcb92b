"""CLI integration tests: drive the actual command-line entry points in tiny
mode via subprocess (the reference's benchmark-as-test philosophy)."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DEMO_CACHE = "/root/reference/cache/cache_demo_v0.1_gpt-4-1106-preview.json"


def _env():
    env = dict(os.environ)
    env.update(
        LVD_TINY="1",
        LVD_PLATFORM="cpu",
        PYTHONPATH=REPO,
        JAX_PLATFORMS="cpu",
        # Subprocesses don't inherit conftest's persistent-cache config.
        JAX_COMPILATION_CACHE_DIR=os.path.join(REPO, "tests", ".jax_cache"),
        JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS="2",
        JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES="0",
    )
    return env


def _make_demo_cache(tmp_path):
    """Self-contained demo cache (no dependency on the reference mount)."""
    resp = (
        "Reasoning: the bear walks right.\n"
        + "\n".join(
            f"Frame {i + 1}: [{{'id': 0, 'name': 'bear', 'box': "
            f"[{20 + 70 * i}, 250, 140, 160]}}]"
            for i in range(6)
        )
        + "\nBackground keyword: forest"
    )
    path = tmp_path / "cache_demo.json"
    path.write_text(json.dumps({"A bear walks from the left to the right": [resp]}))
    return str(path)


@pytest.mark.parametrize(
    "run_model",
    [
        "lvd_modelscope256",
        "lvd-gligen_modelscope256",
        "lvd-plus_modelscope256",
        "modelscope_256",
    ],
)
def test_generate_cli_end_to_end(tmp_path, run_model):
    cache = _make_demo_cache(tmp_path)
    cmd = [
        sys.executable, "-m", "lvd_tpu.cli.generate",
        "--run-model", run_model,
        "--prompt-type", "demo",
        "--model", "gpt-4-1106-preview",
        "--template_version", "v0.1",
        "--cache-path", cache,
        "--num_frames", "4",
        "--num_inference_steps", "4",
        "--no-continue-on-error",
    ]
    if run_model.startswith("lvd_"):
        # guidance hyperparameters only apply to the guided runner
        cmd += ["--max_index_step", "2", "--max_iter", "1"]
    elif run_model.startswith("lvd-plus"):
        # both mechanisms: guidance + scheduled-sampling GLIGEN
        cmd += [
            "--max_index_step", "2", "--max_iter", "1",
            "--gligen_scheduled_sampling_beta", "0.75",
        ]
    elif run_model.startswith("lvd-gligen"):
        cmd += ["--gligen_scheduled_sampling_beta", "0.5"]
    result = subprocess.run(
        cmd, cwd=str(tmp_path), env=_env(), capture_output=True, text=True,
        timeout=1500,
    )
    assert result.returncode == 0, result.stdout[-2000:] + result.stderr[-2000:]
    out_dir = (
        tmp_path
        / f"img_generations/imgs_demo_templatev0.1_gpt-4-1106-preview_{run_model}/run0/0"
    )
    assert (out_dir / "video_0.gif").exists()
    assert (out_dir / "video_0.joblib").exists() or (out_dir / "video_0.npz").exists()

    # The gif decodes to the right geometry (tiny preset is 64x96).
    from PIL import Image

    im = Image.open(out_dir / "video_0.gif")
    assert im.size == (96, 64)
    frames = 0
    try:
        while True:
            im.seek(frames)
            frames += 1
    except EOFError:
        pass
    assert frames == 4


def test_eval_stage_one_cli(tmp_path):
    if not os.path.exists("/root/reference/cache/cache_lvd_v0.1_gpt-3.5-turbo.json"):
        pytest.skip("reference cache unavailable")
    cmd = [
        sys.executable, "-m", "lvd_tpu.cli.eval_stage_one",
        "--model", "gpt-3.5-turbo",
        "--template_version", "v0.1",
        "--cache-path", "/root/reference/cache/cache_lvd_v0.1_gpt-3.5-turbo.json",
    ]
    result = subprocess.run(
        cmd, cwd=str(tmp_path), env=_env(), capture_output=True, text=True,
        timeout=600,
    )
    assert result.returncode == 0, result.stderr[-2000:]
    assert "77.6%" in result.stdout


def test_upsample_cli_zsxl(tmp_path):
    """vid2vid upsampler over a generated run dir (tiny mode)."""
    from lvd_tpu.utils import vis

    run_dir = tmp_path / "run0" / "0"
    run_dir.mkdir(parents=True)
    frames = (np.random.default_rng(0).random((4, 32, 48, 3)) * 255).astype(np.uint8)
    vis.save_frames(str(run_dir / "video_0"), frames, formats="npz")

    cmd = [
        sys.executable, "-m", "lvd_tpu.cli.upsample",
        "--run-dir", str(tmp_path / "run0"),
        "--method", "zsxl",
        "--num_inference_steps", "3",
        "--strength", "0.5",
        "--prompt-type", "demo",
        "--save-formats", "gif", "npz",
    ]
    result = subprocess.run(
        cmd, cwd=str(tmp_path), env=_env(), capture_output=True, text=True,
        timeout=1500,
    )
    assert result.returncode == 0, result.stdout[-1500:] + result.stderr[-1500:]
    out = run_dir / "video_0_zsxl.npz"
    assert out.exists() and (run_dir / "video_0_zsxl.gif").exists()
    video = np.load(out)["frames"]
    assert video.shape == (4, 64, 96, 3)  # tiny preset resolution


def test_prompt_batch_cli_cache_hit(tmp_path):
    """Stage-1 driver on a pre-filled cache with layout visualization."""
    cache = _make_demo_cache(tmp_path)
    cmd = [
        sys.executable, "-m", "lvd_tpu.cli.prompt_batch",
        "--prompt-type", "demo",
        "--model", "gpt-4-1106-preview",
        "--template_version", "v0.1",
        "--cache-path", cache,
        "--visualize",
        "--img-dir", str(tmp_path / "imgs"),
    ]
    result = subprocess.run(
        cmd, cwd=str(tmp_path), env=_env(), capture_output=True, text=True,
        timeout=300,
    )
    assert result.returncode == 0, result.stderr[-1500:]
    assert "Cache hit" in result.stdout
    assert (tmp_path / "imgs" / "layout_0.gif").exists()
