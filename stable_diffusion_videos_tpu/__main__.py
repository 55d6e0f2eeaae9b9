"""CLI: ``python -m stable_diffusion_videos_tpu <command>``.

The reference declares the ``fire`` CLI dependency but never ships a CLI
(SURVEY.md §2.1 #1, ``pyproject.toml:16``); this is the real one.

Commands: walk, images, upsample, app, bench.
"""

from __future__ import annotations

import argparse
import sys


def _add_common(ap):
    ap.add_argument("--checkpoint", default=None,
                    help="local diffusers-layout dir, hub id, or a single "
                         "original-layout .ckpt/.safetensors file (omit "
                         "for tiny random model)")
    ap.add_argument("--tokenizer-dir", default=None, metavar="DIR",
                    help="vocab.json+merges.txt dir, required with a "
                         "single-file --checkpoint (they carry no vocab)")
    ap.add_argument("--prediction-type", default=None,
                    choices=["epsilon", "v_prediction"],
                    help="single-file checkpoints only: v_prediction for "
                         "v-models (SD2-768); default epsilon")
    ap.add_argument("--scheduler", default="pndm",
                    choices=["pndm", "ddim", "lms", "euler", "unipc",
                             "euler_ancestral", "dpm", "lcm"])
    ap.add_argument("--tiled", action="store_true",
                    help="circular convs -> seamlessly tileable frames")
    ap.add_argument("--batch-size", type=int, default=None,
                    help="frames per dispatch (default: the model "
                         "family's measured best — 8 for SD1/2, 1 for "
                         "SDXL at 1024^2)")
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--guidance-scale", type=float, default=7.5)
    ap.add_argument("--height", type=int, default=None)
    ap.add_argument("--width", type=int, default=None)
    ap.add_argument("--negative-prompt", default=None)
    ap.add_argument("--ip-adapter", default=None, metavar="CKPT[,ENCODER]",
                    help="IP-Adapter checkpoint (optionally ',<CLIP image "
                         "encoder dir>' for on-the-fly image embedding)")
    ap.add_argument("--ip-image", default=None,
                    help="image prompt (requires --ip-adapter with an "
                         "encoder)")
    ap.add_argument("--ip-scale", type=float, default=1.0)
    ap.add_argument("--prompt-weighting", action="store_true",
                    help="enable (emphasis:1.3) / [de-emphasis] prompt "
                         "syntax and >77-token prompt chunking (A1111 "
                         "grammar; BREAK forces a window boundary)")
    ap.add_argument("--guidance-rescale", type=float, default=0.0,
                    metavar="PHI",
                    help="std-rescaled CFG weight in [0,1] (Lin et al. "
                         "2024; 0.7 for zero-terminal-SNR v-prediction "
                         "checkpoints, 0 = plain CFG)")
    ap.add_argument("--guidance-interval", nargs=2, type=float,
                    default=None, metavar=("LO", "HI"),
                    help="limited-interval CFG (Kynkäänniemi et al. 2024): "
                         "run the guidance pair only for the [LO, HI) "
                         "fraction of steps; cond-only elsewhere (halves "
                         "the UNet batch outside the interval — real "
                         "speedup, e.g. 0.0 0.6)")
    ap.add_argument("--fast", action="store_true",
                    help="quality-gated fast preset: the bench-proven "
                         "step_cache x guidance_interval composite at the "
                         "measured-best dispatch batch for the model "
                         "family (~1.5-1.6x vs exact at SSIM 1.000 on the "
                         "bench gate; explicit flags override parts of it)")
    ap.add_argument("--step-cache", type=int, default=None, metavar="K",
                    help="DeepCache acceleration: recompute the deep UNet "
                         "trunk every K steps (approximate; ~1.4-1.7x at "
                         "K=2-3, see docs/performance.md)")
    ap.add_argument("--step-cache-policy", choices=("uniform", "ends"),
                    default="uniform",
                    help="full-trunk placement for --step-cache: 'uniform' "
                         "= every K-th step; 'ends' = same budget, "
                         "concentrated at the schedule boundaries where "
                         "deep features change fastest (non-uniform "
                         "DeepCache)")
    ap.add_argument("--frozen-noise", action="store_true",
                    help="broadcast ONE stochastic-transition noise field "
                         "across each dispatch batch (lcm/euler_ancestral/"
                         "ddim eta>0): adjacent walk frames share the "
                         "transition noise, removing sampler-noise flicker "
                         "from videos")
    ap.add_argument("--lora", action="append", default=None,
                    metavar="PATH[:SCALE]",
                    help="kohya/diffusers LoRA .safetensors (or trainer "
                         ".npz) merged into the model; repeatable")
    ap.add_argument("--textual-inversion", action="append", default=None,
                    metavar="PATH[:TOKEN]",
                    help="textual-inversion embedding file (diffusers "
                         "learned_embeds / A1111 .pt / SDXL clip_l+clip_g) "
                         "spliced into the tokenizer+text tower; repeatable")
    ap.add_argument("--controlnet", action="append", default=None,
                    metavar="PATH",
                    help="diffusers-layout ControlNetModel dir or weights "
                         "file; combine with --control-image (repeatable "
                         "for multi-ControlNet, one image per net)")
    ap.add_argument("--control-image", action="append", default=None,
                    metavar="IMG",
                    help="conditioning map (canny/depth/pose image) every "
                         "frame is structurally locked to; repeatable")
    ap.add_argument("--controlnet-scale", action="append", type=float,
                    default=None, metavar="S",
                    help="ControlNet residual weight (traced; no recompile; "
                         "repeatable per net, default 1.0)")
    ap.add_argument("--freeu", nargs="*", type=float, default=None,
                    metavar="B1 B2 S1 S2",
                    help="FreeU backbone/skip re-weighting: bare flag = the "
                         "published per-family factors, or 4 explicit values")
    ap.add_argument("--tome", nargs="+", type=float, default=None,
                    metavar="RATIO [MAX_LEVEL]",
                    help="ToMe-SD token merging: merge RATIO of the self-"
                         "attention tokens (0.3-0.5 typical) at resolution "
                         "levels <= MAX_LEVEL (default 0 = highest only)")


def _pipeline(args):
    from .pipeline import StableDiffusionWalkPipeline
    kw = dict(scheduler=args.scheduler,
              fast=getattr(args, "fast", False),
              step_cache=getattr(args, "step_cache", None),
              step_cache_policy=getattr(args, "step_cache_policy",
                                        "uniform"),
              guidance_rescale=getattr(args, "guidance_rescale", 0.0),
              frozen_noise=getattr(args, "frozen_noise", False),
              prompt_weighting=getattr(args, "prompt_weighting", False))
    gi = getattr(args, "guidance_interval", None)
    if gi is not None:
        kw["guidance_interval"] = tuple(gi)
    lora = getattr(args, "lora", None)
    if lora:
        from .models.lora_file import parse_lora_arg
        kw["lora"] = [parse_lora_arg(a) for a in lora]
    ti = getattr(args, "textual_inversion", None)
    if ti:
        from .models.textual_inversion import parse_ti_arg
        kw["textual_inversion"] = [parse_ti_arg(a) for a in ti]
    cn = getattr(args, "controlnet", None)
    if cn:
        kw["controlnet"] = cn if len(cn) > 1 else cn[0]
    ipa = getattr(args, "ip_adapter", None)
    if ipa:
        kw["ip_adapter"] = tuple(ipa.split(",", 1)) if "," in ipa else ipa
    if getattr(args, "ip_image", None) and not ipa:
        print("--ip-image requires --ip-adapter", file=sys.stderr)
        raise SystemExit(2)
    fu = getattr(args, "freeu", None)
    if fu is not None:
        if len(fu) not in (0, 4):
            print("--freeu takes 0 or 4 values (B1 B2 S1 S2)",
                  file=sys.stderr)
            raise SystemExit(2)
        kw["freeu"] = True if len(fu) == 0 else tuple(fu)
    tm = getattr(args, "tome", None)
    if tm:
        if len(tm) not in (1, 2):
            print("--tome takes RATIO [MAX_LEVEL]", file=sys.stderr)
            raise SystemExit(2)
        kw["tome"] = (tm[0], int(tm[1])) if len(tm) == 2 else tm[0]
    ci = getattr(args, "control_image", None)
    if ci and not cn:
        print("--control-image requires --controlnet", file=sys.stderr)
        raise SystemExit(2)
    if ci and cn and len(ci) != len(cn):
        print("need one --control-image per --controlnet", file=sys.stderr)
        raise SystemExit(2)
    if args.checkpoint is None:
        if lora or ti:
            print("--lora/--textual-inversion require --checkpoint "
                  "(adapters need a base model)", file=sys.stderr)
            raise SystemExit(2)
        print("no --checkpoint: using random tiny model (smoke mode)",
              file=sys.stderr)
        return StableDiffusionWalkPipeline.tiny(**kw)
    return StableDiffusionWalkPipeline.from_pretrained(
        args.checkpoint, tiled=args.tiled,
        tokenizer_dir=getattr(args, "tokenizer_dir", None),
        prediction_type=getattr(args, "prediction_type", None), **kw)


def _ctrl_image(args):
    ci = getattr(args, "control_image", None)
    if not ci:
        return None
    return ci if len(ci) > 1 else ci[0]


def _ctrl_scale(args):
    cs = getattr(args, "controlnet_scale", None)
    if not cs:
        return 1.0
    return cs if len(cs) > 1 else cs[0]


def cmd_walk(args):
    pipe = _pipeline(args)
    video = pipe.walk(
        prompts=args.prompts, seeds=args.seeds,
        num_interpolation_steps=(args.interpolation_steps[0]
                                 if len(args.interpolation_steps) == 1
                                 else args.interpolation_steps),
        output_dir=args.output_dir, name=args.name, fps=args.fps,
        num_inference_steps=args.steps, guidance_scale=args.guidance_scale,
        height=args.height, width=args.width, upsample=args.upsample,
        upsample_weights=args.upsample_weights,
        batch_size=args.batch_size, resume=args.resume,
        audio_filepath=args.audio, audio_start_sec=args.audio_start_sec,
        margin=args.margin, smooth=args.smooth,
        negative_prompt=args.negative_prompt,
        control_image=_ctrl_image(args),
        controlnet_scale=_ctrl_scale(args),
        ip_image=args.ip_image, ip_scale=args.ip_scale)
    print(video)


def cmd_vid2vid(args):
    cv = getattr(args, "control_video", None)
    cfs = getattr(args, "control_from_source", None)
    if (cv or cfs) and not getattr(args, "controlnet", None):
        print("--control-video/--control-from-source require --controlnet",
              file=sys.stderr)
        raise SystemExit(2)
    pipe = _pipeline(args)
    out = pipe.vid2vid(
        args.video, args.prompt, strength=args.strength,
        num_inference_steps=args.steps, guidance_scale=args.guidance_scale,
        negative_prompt=args.negative_prompt, seed=args.seed,
        height=args.height, width=args.width, fps=args.fps,
        batch_size=args.batch_size, frame_skip=args.frame_skip,
        max_frames=args.max_frames, output_filepath=args.output,
        audio_filepath=args.audio, control_video=cv,
        controlnet_scale=_ctrl_scale(args),
        control_from_source=cfs,
        canny_thresholds=tuple(args.canny_thresholds),
        ip_image=args.ip_image, ip_scale=args.ip_scale,
        shared_noise=not args.per_frame_noise)
    print(out)


def cmd_images(args):
    from .pipeline import generate_images
    pipe = _pipeline(args)
    paths = generate_images(
        pipe, args.prompt, batch_size=args.batch_size,
        num_batches=args.num_batches, seeds=args.seeds,
        num_inference_steps=args.steps, guidance_scale=args.guidance_scale,
        output_dir=args.output_dir, name=args.name, upsample=args.upsample,
        upsample_weights=args.upsample_weights,
        height=args.height, width=args.width,
        negative_prompt=args.negative_prompt,
        push_to_hub=args.push_to_hub, repo_id=args.repo_id,
        control_image=_ctrl_image(args),
        controlnet_scale=_ctrl_scale(args))
    print("\n".join(paths))


def cmd_upsample(args):
    from .pipeline import RealESRGANModel
    model = RealESRGANModel.from_pretrained(args.weights, tile=args.tile)
    model.upsample_imagefolder(args.input_dir, args.output_dir)


def cmd_app(args):
    from .app import Interface
    Interface(_pipeline(args)).launch(share=args.share)


def cmd_convert(args):
    from .models.bundle import SDModels
    models = SDModels.from_pretrained(
        args.checkpoint, with_safety=not args.no_safety,
        tokenizer_dir=getattr(args, "tokenizer_dir", None),
        prediction_type=getattr(args, "prediction_type", None))
    out = models.save(args.out)
    print(out)
    for k, n in models.param_count().items():
        print(f"  {k}: {n/1e6:.1f}M params")


def cmd_parity_gate(args):
    import json as _json

    from .utils.parity_gate import run_parity_gate
    pipe = _pipeline(args)
    res = run_parity_gate(pipe, args.reference_frames, args.output_dir,
                          lpips_weights=args.lpips_weights,
                          lpips_net=args.lpips_net,
                          height=args.height, width=args.width)
    print(_json.dumps(res, indent=2))
    raise SystemExit(0 if res["pass"] else 1)


def cmd_validate(args):
    import json as _json

    from .utils.validate import run_validation
    res = run_validation(
        args.checkpoint, output_dir=args.output_dir,
        reference_frames=args.reference_frames,
        lpips_weights=args.lpips_weights,
        upsample_weights=args.upsample_weights,
        scheduler=args.scheduler,
        num_inference_steps=args.num_inference_steps,
        height=args.height, width=args.width,
        step_cache_ks=tuple(args.step_cache_ks),
        tokenizer_dir=args.tokenizer_dir)
    print(_json.dumps(res, indent=2, default=str))
    raise SystemExit(0 if res["pass"] else 1)


def cmd_compare(args):
    import json as _json

    from .utils.metrics import compare_frame_dirs
    print(_json.dumps(compare_frame_dirs(args.a, args.b, glob=args.glob,
                                         lpips_weights=args.lpips_weights,
                                         lpips_net=args.lpips_net),
                      indent=2))


def cmd_serve(args):
    from .runtime.server import Server
    Server(_pipeline(args),
           output_root=args.output_root).serve_forever(host=args.host,
                                                       port=args.port)


def cmd_bench(args):
    import runpy
    from pathlib import Path
    bench = Path(__file__).resolve().parents[1] / "bench.py"
    runpy.run_path(str(bench), run_name="__main__")


def build_parser() -> argparse.ArgumentParser:
    ap = argparse.ArgumentParser(prog="stable_diffusion_videos_tpu")
    sub = ap.add_subparsers(dest="command", required=True)

    w = sub.add_parser("walk", help="prompt-walk video")
    _add_common(w)
    w.add_argument("--prompts", nargs="+", required=True)
    w.add_argument("--seeds", nargs="+", type=int, required=True)
    w.add_argument("--interpolation-steps", nargs="+", type=int, default=[30])
    w.add_argument("--output-dir", default="./dreams")
    w.add_argument("--name", default=None)
    w.add_argument("--fps", type=int, default=30)
    w.add_argument("--upsample", action="store_true")
    w.add_argument("--upsample-weights", default=None, metavar="PTH",
                   help="RealESRGAN_x4plus weights file for --upsample "
                        "(or set SDV_REALESRGAN)")
    w.add_argument("--resume", action="store_true")
    w.add_argument("--audio", default=None)
    w.add_argument("--audio-start-sec", type=float, default=None)
    w.add_argument("--margin", type=float, default=1.0)
    w.add_argument("--smooth", type=float, default=0.0)
    w.set_defaults(fn=cmd_walk)

    vv = sub.add_parser("vid2vid", help="restyle a video with img2img "
                                        "(temporally frozen noise)")
    _add_common(vv)
    vv.add_argument("--video", required=True,
                    help="input video file / frame directory")
    vv.add_argument("--prompt", required=True)
    vv.add_argument("--strength", type=float, default=0.5)
    vv.add_argument("--seed", type=int, default=0)
    vv.add_argument("--fps", type=float, default=None,
                    help="output fps (default: source fps)")
    vv.add_argument("--frame-skip", type=int, default=1)
    vv.add_argument("--max-frames", type=int, default=None)
    vv.add_argument("--output", default="vid2vid.mp4")
    vv.add_argument("--audio", default=None,
                    help="audio file to mux into the output")
    vv.add_argument("--control-video", default=None,
                    help="per-frame ControlNet maps: video file or dir "
                         "(requires --controlnet)")
    vv.add_argument("--control-from-source", default=None,
                    choices=["canny", "identity"],
                    help="derive ControlNet maps from the source frames "
                         "on the fly (requires --controlnet)")
    vv.add_argument("--canny-thresholds", nargs=2, type=int,
                    default=[100, 200], metavar=("LO", "HI"))
    vv.add_argument("--per-frame-noise", action="store_true",
                    help="fresh re-noising sample per frame (flickery; "
                         "default is one shared sample for the whole video)")
    vv.set_defaults(fn=cmd_vid2vid)

    im = sub.add_parser("images", help="batch image generation")
    _add_common(im)
    im.add_argument("--prompt", required=True)
    im.add_argument("--num-batches", type=int, default=1)
    im.add_argument("--seeds", nargs="+", type=int, default=None)
    im.add_argument("--output-dir", default="./images")
    im.add_argument("--name", default=None)
    im.add_argument("--upsample", action="store_true")
    im.add_argument("--upsample-weights", default=None, metavar="PTH",
                    help="RealESRGAN_x4plus weights file for --upsample "
                         "(or set SDV_REALESRGAN)")
    im.add_argument("--push-to-hub", action="store_true")
    im.add_argument("--repo-id", default=None)
    im.set_defaults(fn=cmd_images)

    up = sub.add_parser("upsample", help="4x Real-ESRGAN an image folder")
    up.add_argument("--weights", required=True,
                    help="RealESRGAN_x4plus.pth path")
    up.add_argument("--input-dir", required=True)
    up.add_argument("--output-dir", required=True)
    up.add_argument("--tile", type=int, default=0)
    up.set_defaults(fn=cmd_upsample)

    app = sub.add_parser("app", help="launch the gradio UI")
    _add_common(app)
    app.add_argument("--share", action="store_true")
    app.set_defaults(fn=cmd_app)

    cv = sub.add_parser("convert",
                        help="diffusers dir or single .ckpt/.safetensors "
                             "-> native bundle")
    cv.add_argument("--checkpoint", required=True)
    cv.add_argument("--out", required=True)
    cv.add_argument("--no-safety", action="store_true")
    cv.add_argument("--tokenizer-dir", default=None, metavar="DIR")
    cv.add_argument("--prediction-type", default=None,
                    choices=["epsilon", "v_prediction"])
    cv.set_defaults(fn=cmd_convert)

    cmp_ = sub.add_parser("compare",
                          help="PSNR/SSIM/LPIPS parity between two frame "
                               "dirs")
    cmp_.add_argument("--a", required=True)
    cmp_.add_argument("--b", required=True)
    cmp_.add_argument("--glob", default="**/frame*.png")
    cmp_.add_argument("--lpips-weights", default=None,
                      help="torch .pth/.npz of AlexNet|VGG + lin heads "
                           "(or env SDV_LPIPS_WEIGHTS)")
    cmp_.add_argument("--lpips-net", default="alex", choices=("alex", "vgg"))
    cmp_.set_defaults(fn=cmd_compare)

    pg = sub.add_parser(
        "parity-gate",
        help="BASELINE gate: fixed 2-prompt walk vs a reference-pipeline "
             "frame dump (PSNR/SSIM/LPIPS); exit 0 = PASS")
    _add_common(pg)
    pg.add_argument("--reference-frames", required=True,
                    help="dir of frames recorded with the reference "
                         "package at the gate config (docs/parity.md)")
    pg.add_argument("--output-dir", default="./parity_runs")
    pg.add_argument("--lpips-weights", default=None,
                    help="LPIPS weights .pth/.npz (or env SDV_LPIPS_WEIGHTS)")
    pg.add_argument("--lpips-net", default="alex", choices=("alex", "vgg"))
    pg.set_defaults(fn=cmd_parity_gate)

    va = sub.add_parser(
        "validate",
        help="one-shot checkpoint validation: load -> smoke frame -> VAE "
             "round-trip -> parity-gate walk -> step-cache quality curve "
             "-> Real-ESRGAN demo; writes validation_report.json, exit 0 "
             "= all run stages passed (the real-weight first-hour "
             "playbook, docs/parity.md)")
    va.add_argument("checkpoint",
                    help="diffusers dir / single .ckpt(.safetensors) / "
                         "native bundle dir")
    va.add_argument("--output-dir", default="./validate_out")
    va.add_argument("--reference-frames", default=None,
                    help="reference-pipeline frame dump for the LPIPS "
                         "parity gate (stage skipped if omitted)")
    va.add_argument("--lpips-weights", default=None)
    va.add_argument("--upsample-weights", default=None,
                    help="RealESRGAN_x4plus.pth (stage skipped if omitted)")
    va.add_argument("--scheduler", default="pndm")
    va.add_argument("--num-inference-steps", type=int, default=50)
    va.add_argument("--height", type=int, default=None)
    va.add_argument("--width", type=int, default=None)
    va.add_argument("--step-cache-ks", type=int, nargs="+", default=[2, 3])
    va.add_argument("--tokenizer-dir", default=None,
                    help="vocab dir for single-file checkpoints")
    va.set_defaults(fn=cmd_validate)

    srv = sub.add_parser("serve", help="HTTP JSON inference server")
    _add_common(srv)
    srv.add_argument("--host", default="127.0.0.1",
                     help="bind address (default loopback; pass 0.0.0.0 "
                          "explicitly to expose on the network)")
    srv.add_argument("--port", type=int, default=8000)
    srv.add_argument("--output-root", default="./dreams",
                     help="directory all /walk output is confined under")
    srv.set_defaults(fn=cmd_serve)

    b = sub.add_parser("bench", help="run the standard benchmark")
    b.set_defaults(fn=cmd_bench)
    return ap


def main(argv=None):
    args = build_parser().parse_args(argv)
    args.fn(args)


if __name__ == "__main__":
    main()
