"""Quantized-tensor library (the TPU analog of `mistralrs-quant`)."""

from .qtensor import QTensor

__all__ = ["QTensor"]
