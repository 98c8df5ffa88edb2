#!/usr/bin/env python
"""Zoo generation CLI: 'load checkpoint files -> generate' for every family.

The reference exposes each family through per-pipeline example scripts over
ModelManager-loaded files; this single entry covers them with the structural
auto-loader (goal_force_tpu/io/auto.py) and the vendored real tokenizers.

Examples:
  python scripts/generate.py flux --dit flux-dev.safetensors \
      --text-encoder clip.safetensors --text-encoder-2 t5.safetensors \
      --vae-encoder ae_enc.safetensors --vae-decoder ae_dec.safetensors \
      --prompt "a cat" -o out.png
  python scripts/generate.py sd --unet sd15.safetensors --prompt "a dog"
  python scripts/generate.py sdxl --unet sdxl.safetensors ... --steps 30
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def save_image(img: np.ndarray, path: str):
    arr = (np.clip(img, 0.0, 1.0) * 255).astype(np.uint8)
    try:
        from PIL import Image

        Image.fromarray(arr).save(path)
    except ImportError:
        import cv2

        cv2.imwrite(path, arr[..., ::-1])
    print(f"saved {path}")


def save_frames(video: np.ndarray, path: str, fps: int = 15):
    from goal_force_tpu.data.video_io import save_video

    save_video(video, path, fps=fps)
    print(f"saved {path}")


def main():
    p = argparse.ArgumentParser(description=__doc__)
    sub = p.add_subparsers(dest="family", required=True)

    def common(sp, video=False):
        sp.add_argument("--prompt", required=True)
        sp.add_argument("--negative-prompt", default="")
        sp.add_argument("--steps", type=int, default=None)
        sp.add_argument("--cfg", type=float, default=None)
        sp.add_argument("--height", type=int, default=None)
        sp.add_argument("--width", type=int, default=None)
        sp.add_argument("--seed", type=int, default=0)
        sp.add_argument("-o", "--output",
                        default="out.mp4" if video else "out.png")

    sp = sub.add_parser("flux")
    sp.add_argument("--dit", required=True)
    sp.add_argument("--text-encoder")
    sp.add_argument("--text-encoder-2")
    sp.add_argument("--vae-encoder")
    sp.add_argument("--vae-decoder")
    common(sp)

    sp = sub.add_parser("sd")
    sp.add_argument("--unet", required=True, help="civitai bundle or unet file")
    sp.add_argument("--text-encoder")
    sp.add_argument("--vae-encoder")
    sp.add_argument("--vae-decoder")
    common(sp)

    sp = sub.add_parser("sdxl")
    sp.add_argument("--unet", required=True)
    sp.add_argument("--text-encoder")
    sp.add_argument("--text-encoder-2")
    sp.add_argument("--vae-decoder")
    common(sp)

    sp = sub.add_parser("sd3")
    sp.add_argument("--dit", required=True)
    sp.add_argument("--text-encoder")
    sp.add_argument("--text-encoder-2")
    sp.add_argument("--text-encoder-3")
    sp.add_argument("--vae-encoder")
    sp.add_argument("--vae-decoder")
    common(sp)

    sp = sub.add_parser("kolors")
    sp.add_argument("--unet", required=True)
    sp.add_argument("--text-encoder")
    sp.add_argument("--vae-decoder")
    common(sp)

    sp = sub.add_parser("hunyuan-dit")
    sp.add_argument("--dit", required=True)
    sp.add_argument("--bert")
    sp.add_argument("--vae-decoder")
    common(sp)

    sp = sub.add_parser("cog")
    sp.add_argument("--dit", required=True)
    sp.add_argument("--text-encoder")
    sp.add_argument("--vae-decoder")
    sp.add_argument("--num-frames", type=int, default=49)
    common(sp, video=True)

    sp = sub.add_parser("hunyuan-video")
    sp.add_argument("--dit", required=True)
    sp.add_argument("--llama")
    sp.add_argument("--clip")
    sp.add_argument("--llama-tokenizer-dir")
    sp.add_argument("--vae-decoder")
    sp.add_argument("--num-frames", type=int, default=49)
    common(sp, video=True)

    a = p.parse_args()
    kw = {}
    for name, val in (("num_inference_steps", a.steps), ("cfg_scale", a.cfg),
                      ("height", a.height), ("width", a.width)):
        if val is not None:
            kw[name] = val

    if a.family == "flux":
        from goal_force_tpu.pipelines.flux import FluxPipeline

        pipe = FluxPipeline.from_pretrained(
            a.dit, text_encoder_path=a.text_encoder,
            text_encoder_2_path=a.text_encoder_2,
            vae_encoder_path=a.vae_encoder, vae_decoder_path=a.vae_decoder)
        img = pipe(a.prompt, a.negative_prompt, seed=a.seed, progress=True, **kw)
        save_image(img, a.output)
    elif a.family == "sd":
        from goal_force_tpu.pipelines.sd import SDPipeline

        pipe = SDPipeline.from_pretrained(
            a.unet, text_encoder_path=a.text_encoder,
            vae_encoder_path=a.vae_encoder, vae_decoder_path=a.vae_decoder)
        img = pipe(a.prompt, a.negative_prompt, seed=a.seed, **kw)
        save_image(img, a.output)
    elif a.family == "sdxl":
        from goal_force_tpu.pipelines.sdxl import SDXLPipeline

        pipe = SDXLPipeline.from_pretrained(
            a.unet, text_encoder_path=a.text_encoder,
            text_encoder_2_path=a.text_encoder_2,
            vae_decoder_path=a.vae_decoder)
        img = pipe(a.prompt, a.negative_prompt, seed=a.seed, **kw)
        save_image(img, a.output)
    elif a.family == "sd3":
        from goal_force_tpu.pipelines.sd3 import SD3Pipeline

        pipe = SD3Pipeline.from_pretrained(
            a.dit, text_encoder_path=a.text_encoder,
            text_encoder_2_path=a.text_encoder_2,
            text_encoder_3_path=a.text_encoder_3,
            vae_encoder_path=a.vae_encoder, vae_decoder_path=a.vae_decoder)
        img = pipe(a.prompt, a.negative_prompt, seed=a.seed, **kw)
        save_image(img, a.output)
    elif a.family == "kolors":
        from goal_force_tpu.pipelines.kolors import KolorsPipeline

        pipe = KolorsPipeline.from_pretrained(
            a.unet, text_encoder_path=a.text_encoder,
            vae_decoder_path=a.vae_decoder)
        img = pipe(a.prompt, a.negative_prompt, seed=a.seed, **kw)
        save_image(img, a.output)
    elif a.family == "hunyuan-dit":
        from goal_force_tpu.pipelines.hunyuan_image import HunyuanImagePipeline

        pipe = HunyuanImagePipeline.from_pretrained(
            a.dit, bert_path=a.bert, vae_decoder_path=a.vae_decoder)
        img = pipe(a.prompt, seed=a.seed, **kw)
        save_image(np.asarray(img), a.output)
    elif a.family == "cog":
        from goal_force_tpu.pipelines.cog_video import CogVideoPipeline

        pipe = CogVideoPipeline.from_pretrained(
            a.dit, text_encoder_path=a.text_encoder,
            vae_decoder_path=a.vae_decoder)
        vid = pipe(a.prompt, a.negative_prompt, num_frames=a.num_frames,
                   seed=a.seed, **kw)
        save_frames(np.asarray((np.asarray(vid) + 1.0) / 2.0)[0], a.output)
    elif a.family == "hunyuan-video":
        from goal_force_tpu.pipelines.hunyuan_video import HunyuanVideoPipeline

        pipe = HunyuanVideoPipeline.from_pretrained(
            a.dit, llama_path=a.llama, clip_path=a.clip,
            llama_tokenizer_dir=a.llama_tokenizer_dir,
            vae_decoder_path=a.vae_decoder)
        vid = pipe(a.prompt, num_frames=a.num_frames, seed=a.seed, **kw)
        save_frames(np.asarray(vid)[0] if np.asarray(vid).ndim == 5
                    else np.asarray(vid), a.output)


if __name__ == "__main__":
    main()
