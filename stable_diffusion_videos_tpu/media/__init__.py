"""Streaming media IO (video assembly, frame sinks)."""

from .video import FrameWriter, iter_frames, make_video, make_video_pyav

__all__ = ["FrameWriter", "iter_frames", "make_video", "make_video_pyav"]
