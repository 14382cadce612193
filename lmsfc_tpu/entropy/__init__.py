from .cdf import CdfTable, pmf_to_quantized_cdf
from .entropy_bottleneck import EntropyBottleneck
from .gaussian_conditional import SCALES_TABLE, GaussianConditional

__all__ = [
    "CdfTable",
    "pmf_to_quantized_cdf",
    "EntropyBottleneck",
    "GaussianConditional",
    "SCALES_TABLE",
]
