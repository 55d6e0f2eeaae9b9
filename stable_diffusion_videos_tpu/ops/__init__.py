"""Hot compute ops: attention dispatch (XLA / Pallas flash)."""

from .attention import attention, masked_attention, set_attention_backend

__all__ = ["attention", "masked_attention", "set_attention_backend"]
