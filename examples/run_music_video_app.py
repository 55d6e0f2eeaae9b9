"""Music-video wizard — step-by-step gradio Blocks app (cf. reference
``examples/run_music_video_app.py:275-363``).

Steps: (1) upload/slice audio, (2) preview the audio-reactive interpolation
curve T (matplotlib), (3) pick endpoint prompts + seeds by generating preview
images, (4) render the clip.  The reference's youtube-dl fetch
(``run_music_video_app.py:36-54``) exists as ``download_audio_clip`` —
gated on yt-dlp/youtube-dl being importable (this build env has no
egress); otherwise upload a local WAV.

Usage: python examples/run_music_video_app.py [--checkpoint DIR | --tiny]
"""

import argparse
import tempfile
from pathlib import Path

import numpy as np


def download_audio_clip(url: str, out_dir=None) -> str:
    """Fetch a clip's audio track via yt-dlp (or legacy youtube_dl) —
    the reference's ``download_example_clip``; raises a clear error when
    neither downloader is installed or the network is unreachable."""
    try:
        import yt_dlp as ydl_mod
    except ImportError:
        try:
            import youtube_dl as ydl_mod
        except ImportError as e:
            raise RuntimeError(
                "audio URL fetch needs yt-dlp (pip install yt-dlp) — not "
                "installed in this environment; upload a local WAV instead"
            ) from e
    out_dir = Path(out_dir or tempfile.mkdtemp())
    opts = {"format": "bestaudio/best",
            "outtmpl": str(out_dir / "%(id)s.%(ext)s"), "quiet": True}
    with ydl_mod.YoutubeDL(opts) as ydl:
        info = ydl.extract_info(url, download=True)
    return str(out_dir / f"{info['id']}.{info['ext']}")


def build_app(pipeline):
    import gradio as gr
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    from stable_diffusion_videos_tpu.audio import get_timesteps_arr, load_audio, save_wav

    state = {"wav": None, "duration": 0.0}

    def on_slice(audio_file, start_sec, duration, fps, margin, smooth):
        if audio_file is None:
            raise gr.Error("upload a WAV file first")
        y, sr = load_audio(audio_file, offset=start_sec, duration=duration)
        sliced = Path(tempfile.mkdtemp()) / "slice.wav"
        save_wav(sliced, y, sr)
        state["wav"], state["duration"] = str(sliced), duration

        T = get_timesteps_arr(state["wav"], 0, duration, fps=int(fps),
                              margin=margin, smooth=smooth)
        fig, ax = plt.subplots(figsize=(8, 3))
        ax.plot(np.linspace(0, duration, len(T)), T)
        ax.set_xlabel("seconds")
        ax.set_ylabel("interpolation position T")
        ax.set_title("audio-reactive interpolation curve")
        fig.tight_layout()
        return str(sliced), fig

    def on_preview(prompt_a, prompt_b, seed_a, seed_b, steps):
        imgs = []
        for prompt, seed in ((prompt_a, seed_a), (prompt_b, seed_b)):
            pil = pipeline(prompt=prompt, seed=int(seed),
                           num_inference_steps=int(steps))[0]
            imgs.append(pil)
        return imgs

    def on_generate(prompt_a, prompt_b, seed_a, seed_b, fps, steps,
                    batch_size, margin, smooth):
        if state["wav"] is None:
            raise gr.Error("slice audio first (step 1)")
        n = int(round(state["duration"] * int(fps)))
        return pipeline.walk(
            prompts=[prompt_a, prompt_b], seeds=[int(seed_a), int(seed_b)],
            num_interpolation_steps=n, fps=int(fps),
            num_inference_steps=int(steps), batch_size=int(batch_size),
            audio_filepath=state["wav"], audio_start_sec=0,
            margin=margin, smooth=smooth,
            output_dir="./music_videos")

    with gr.Blocks(title="TPU music video wizard") as demo:
        gr.Markdown("## 1 — audio")
        audio_in = gr.Audio(type="filepath", label="WAV file")
        with gr.Row():
            url_in = gr.Textbox(label="...or fetch audio from a URL "
                                      "(needs yt-dlp installed)")
            fetch_btn = gr.Button("Fetch")

        def on_fetch(url):
            if not url:
                raise gr.Error("enter a URL")
            try:
                return download_audio_clip(url)
            except Exception as e:  # surfaced in the UI
                raise gr.Error(str(e))

        fetch_btn.click(on_fetch, [url_in], [audio_in])
        with gr.Row():
            start_sec = gr.Number(0.0, label="start (s)")
            duration = gr.Number(5.0, label="duration (s)")
            fps = gr.Slider(5, 60, 30, step=1, label="fps")
        with gr.Row():
            margin = gr.Slider(1.0, 16.0, 1.0, step=0.5,
                               label="hpss margin (percussive isolation)")
            smooth = gr.Slider(0.0, 1.0, 0.0, step=0.05,
                               label="smooth (1 = linear)")
        slice_btn = gr.Button("Slice + preview curve")
        sliced_audio = gr.Audio(label="sliced audio")
        curve = gr.Plot(label="interpolation curve")
        slice_btn.click(on_slice,
                        [audio_in, start_sec, duration, fps, margin, smooth],
                        [sliced_audio, curve])

        gr.Markdown("## 2 — endpoints")
        with gr.Row():
            prompt_a = gr.Textbox("blueberry spaghetti", label="prompt A")
            seed_a = gr.Number(42, label="seed A", precision=0)
        with gr.Row():
            prompt_b = gr.Textbox("strawberry spaghetti", label="prompt B")
            seed_b = gr.Number(1337, label="seed B", precision=0)
        steps = gr.Slider(5, 100, 50, step=5, label="inference steps")
        preview_btn = gr.Button("Preview endpoint images")
        gallery = gr.Gallery(label="endpoints", columns=2)
        preview_btn.click(on_preview,
                          [prompt_a, prompt_b, seed_a, seed_b, steps],
                          gallery)

        gr.Markdown("## 3 — render")
        batch_size = gr.Slider(1, 32, 8, step=1, label="batch size")
        gen_btn = gr.Button("Generate music video", variant="primary")
        video_out = gr.Video(label="result")
        gen_btn.click(on_generate,
                      [prompt_a, prompt_b, seed_a, seed_b, fps, steps,
                       batch_size, margin, smooth], video_out)
    return demo


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--checkpoint", default=None)
    ap.add_argument("--tiny", action="store_true")
    ap.add_argument("--share", action="store_true")
    args = ap.parse_args()

    from stable_diffusion_videos_tpu import StableDiffusionWalkPipeline
    if args.tiny or args.checkpoint is None:
        pipeline = StableDiffusionWalkPipeline.tiny()
    else:
        pipeline = StableDiffusionWalkPipeline.from_pretrained(args.checkpoint)
    build_app(pipeline).launch(share=args.share, debug=True)


if __name__ == "__main__":
    main()
