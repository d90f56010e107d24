from .constants import GGMLType, GGUFValueType, type_traits, row_byte_size
from .reader import GGUFContent, GGUFFile, TensorInfo
from .writer import GGUFWriter
from .quants import dequantize, quantize, DEQUANTIZERS, QUANTIZERS

__all__ = [
    "GGMLType",
    "GGUFValueType",
    "type_traits",
    "row_byte_size",
    "GGUFContent",
    "GGUFFile",
    "TensorInfo",
    "GGUFWriter",
    "dequantize",
    "quantize",
    "DEQUANTIZERS",
    "QUANTIZERS",
]
