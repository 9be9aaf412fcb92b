"""Video upsampling CLI: Zeroscope-XL vid2vid and (optionally) SDXL-refiner
per-frame img2img.

Parity target: /root/reference/scripts/upsample.py. Reads `video_*.joblib`
artifacts from a generation run directory, refines each at higher resolution,
writes gif/joblib/mp4 next to them, skipping existing outputs.

The Zeroscope-XL path (576x1024 vid2vid, default strength 0.35) is fully
implemented on this framework's pipeline. The SDXL per-frame refiner is a
different model family (SDXL UNet + dual text encoders) and is not yet
ported; requesting it raises with a clear message.
"""

from __future__ import annotations

import argparse
import glob
import os

import numpy as np

from ..utils import vis
from ..utils.platform import maybe_force_platform

_xl_pipe = None


def _get_xl_pipe():
    global _xl_pipe
    if _xl_pipe is None:
        import jax.numpy as jnp

        from ..models.loader import load_pipeline_models, tiny_pipeline_models
        from ..pipeline import TextToVideoPipeline

        if os.environ.get("LVD_TINY") == "1":
            models = tiny_pipeline_models()
            _xl_pipe = TextToVideoPipeline(models, dtype=jnp.float32)
        else:
            models = load_pipeline_models("zeroscope_xl")
            _xl_pipe = TextToVideoPipeline(models, dtype=jnp.bfloat16)
    return _xl_pipe


def _resize_video(video: np.ndarray, height: int, width: int) -> np.ndarray:
    """Nearest/bilinear resize via PIL (host-side prep for vid2vid init)."""
    from PIL import Image

    out = []
    for frame in video:
        img = Image.fromarray((np.clip(frame, 0, 1) * 255).astype(np.uint8))
        img = img.resize((width, height), Image.BILINEAR)
        out.append(np.asarray(img).astype(np.float32) / 255.0)
    return np.stack(out)


def upsample_video_zsxl(
    video,
    prompt: str,
    strength: float = 0.35,
    num_inference_steps: int = 50,
    seed: int = 0,
):
    """(F, H, W, 3) float [0,1] -> upsampled video via Zeroscope-XL vid2vid."""
    pipe = _get_xl_pipe()
    video = np.asarray(video, np.float32)
    if video.dtype == np.uint8:
        video = video.astype(np.float32) / 255.0
    resized = _resize_video(video, pipe.preset.height, pipe.preset.width)
    out = pipe.video_to_video(
        prompt,
        resized,
        strength=strength,
        num_inference_steps=num_inference_steps,
        seed=seed,
    )
    return np.asarray(out[0])


def main(argv=None):
    maybe_force_platform()
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--run-dir", required=True,
                   help="generation run directory (contains {ind}/video_*.joblib)")
    p.add_argument("--method", choices=["zsxl", "sdxl", "zsxl+sdxl"], default="zsxl")
    p.add_argument("--strength", type=float, default=0.35)
    p.add_argument("--num_inference_steps", type=int, default=50)
    p.add_argument("--prompt-type", type=str, default="lvd")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--save-formats", nargs="+", default=["gif", "joblib"])
    args = p.parse_args(argv)

    if "sdxl" in args.method:
        raise NotImplementedError(
            "The SDXL per-frame refiner is not ported yet; use --method zsxl "
            "(Zeroscope-XL vid2vid)."
        )

    from ..text.templates import canonical_prompt, get_prompts

    prompts = [canonical_prompt(pr) for pr in get_prompts(args.prompt_type)]

    videos = sorted(glob.glob(os.path.join(args.run_dir, "*", "video_*.joblib")))
    videos += sorted(glob.glob(os.path.join(args.run_dir, "*", "video_*.npz")))
    print(f"Found {len(videos)} videos under {args.run_dir}")

    for path in videos:
        ind = int(os.path.basename(os.path.dirname(path)))
        prompt = prompts[ind] if ind < len(prompts) else ""
        stem = path.rsplit(".", 1)[0] + "_zsxl"
        if os.path.exists(stem + ".gif"):
            print(f"Skipping existing {stem}.gif")
            continue
        video = vis.load_video(path)
        out = upsample_video_zsxl(
            video,
            prompt,
            strength=args.strength,
            num_inference_steps=args.num_inference_steps,
            seed=args.seed,
        )
        vis.save_frames(stem, out, formats=args.save_formats)
        print(f"Upsampled {path} -> {stem}.*")


if __name__ == "__main__":
    main()
