"""Sharded execution engine (single-dispatch denoise programs)."""

from .engine import Engine

__all__ = ["Engine"]
