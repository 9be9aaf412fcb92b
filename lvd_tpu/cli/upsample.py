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
from ..utils.platform import enable_persistent_compile_cache, maybe_force_platform

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


_sdxl_pipe = None


def _get_sdxl_pipe():
    global _sdxl_pipe
    if _sdxl_pipe is None:
        import jax
        import jax.numpy as jnp

        from ..config import CLIPTextConfig, SchedulerConfig, VAEConfig
        from ..models import clip as clip_mod
        from ..models import unet2d as unet2d_mod
        from ..models import vae as vae_mod
        from ..models.loader import load_params
        from ..pipeline_sdxl import SDXLRefinerModels, SDXLRefinerPipeline
        from ..text.tokenizer import load_tokenizer

        tiny = os.environ.get("LVD_TINY") == "1"
        if tiny:
            unet_cfg = unet2d_mod.UNet2DConfig(
                block_out_channels=(16, 32, 32, 32),
                cross_attention_dim=32,
                num_heads=(2, 2, 2, 2),
                down_block_has_attn=(False, True, True, False),
                transformer_depth=(0, 2, 2, 0),
                mid_transformer_depth=2,
                norm_num_groups=8,
                addition_embed_type="text_time",
                addition_time_embed_dim=8,
                projection_class_embeddings_input_dim=32 + 5 * 8,
            )
            clip_cfg = CLIPTextConfig(
                hidden_size=32, intermediate_size=64, num_hidden_layers=2,
                num_attention_heads=2, projection_dim=32,
            )
            vae_cfg = VAEConfig(block_out_channels=(8, 16, 16, 16), norm_num_groups=4)
            k = jax.random.split(jax.random.PRNGKey(0), 3)
            models = SDXLRefinerModels(
                unet_cfg=unet_cfg,
                clip_cfg=clip_cfg,
                vae_cfg=vae_cfg,
                scheduler=SchedulerConfig(),
                unet_params=unet2d_mod.init_unet2d(k[0], unet_cfg),
                clip_params=clip_mod.init_clip_text(k[1], clip_cfg, with_projection=True),
                vae_params=vae_mod.init_vae(k[2], vae_cfg),
                tokenizer=load_tokenizer(None),
            )
            _sdxl_pipe = SDXLRefinerPipeline(models, dtype=jnp.float32)
        else:
            root = os.environ.get("LVD_CHECKPOINT_ROOT", "")
            ckpt = os.path.join(root, "stabilityai--stable-diffusion-xl-refiner-1.0")
            if not os.path.isdir(ckpt):
                raise FileNotFoundError(
                    "SDXL refiner checkpoint not converted; run "
                    "`python -m lvd_tpu.models.convert --src <sdxl-refiner> "
                    f"--dst {ckpt or '$LVD_CHECKPOINT_ROOT/...'} --sdxl-refiner`"
                )
            models = SDXLRefinerModels(
                unet_cfg=unet2d_mod.sdxl_refiner_config(),
                clip_cfg=CLIPTextConfig(
                    hidden_size=1280, intermediate_size=5120,
                    num_hidden_layers=32, num_attention_heads=20,
                    projection_dim=1280,
                ),
                vae_cfg=VAEConfig(scaling_factor=0.13025),
                scheduler=SchedulerConfig(),
                unet_params=load_params(os.path.join(ckpt, "unet.npz")),
                clip_params=load_params(os.path.join(ckpt, "clip.npz")),
                vae_params=load_params(os.path.join(ckpt, "vae.npz")),
                tokenizer=load_tokenizer(ckpt),
            )
            _sdxl_pipe = SDXLRefinerPipeline(models)
    return _sdxl_pipe


def upsample_video_sdxl(
    video,
    prompt: str,
    strength: float = 0.35,
    num_inference_steps: int = 50,
    seed: int = 0,
    target_hw=(576, 1024),
):
    """Per-frame SDXL-refiner img2img (reference scripts/upsample.py:104-158)."""
    pipe = _get_sdxl_pipe()
    video = np.asarray(video)
    if video.dtype == np.uint8:
        video = video.astype(np.float32) / 255.0
    if os.environ.get("LVD_TINY") == "1":
        target_hw = (64, 96)
    resized = _resize_video(video, *target_hw)
    out = [
        pipe(
            prompt,
            frame,
            strength=strength,
            num_inference_steps=num_inference_steps,
            seed=seed + i,
        )
        for i, frame in enumerate(resized)
    ]
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
    enable_persistent_compile_cache()
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

    from ..text.templates import canonical_prompt, get_prompts

    prompts = [canonical_prompt(pr) for pr in get_prompts(args.prompt_type)]

    videos = sorted(glob.glob(os.path.join(args.run_dir, "*", "video_*.joblib")))
    videos += sorted(glob.glob(os.path.join(args.run_dir, "*", "video_*.npz")))
    print(f"Found {len(videos)} videos under {args.run_dir}")

    for path in videos:
        ind = int(os.path.basename(os.path.dirname(path)))
        prompt = prompts[ind] if ind < len(prompts) else ""
        suffix = args.method.replace("+", "_")
        stem = path.rsplit(".", 1)[0] + f"_{suffix}"
        if os.path.exists(stem + ".gif"):
            print(f"Skipping existing {stem}.gif")
            continue
        out = vis.load_video(path)
        if "zsxl" in args.method:
            out = upsample_video_zsxl(
                out,
                prompt,
                strength=args.strength,
                num_inference_steps=args.num_inference_steps,
                seed=args.seed,
            )
        if "sdxl" in args.method:
            out = upsample_video_sdxl(
                out,
                prompt,
                strength=min(args.strength, 0.35),
                num_inference_steps=args.num_inference_steps,
                seed=args.seed,
            )
        vis.save_frames(stem, out, formats=args.save_formats)
        print(f"Upsampled {path} -> {stem}.*")


if __name__ == "__main__":
    main()
