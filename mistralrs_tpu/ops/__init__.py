"""TPU compute ops: Pallas kernels + XLA reference paths."""

from .quant_matmul import quant_matmul

__all__ = ["quant_matmul"]
