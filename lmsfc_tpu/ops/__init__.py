from .math import lower_bound, upper_bound
from .quant import (
    min_max_inv_normalization,
    min_max_normalization,
    noise_quantize,
    ste_round,
)
from .tiling import (
    compute_frame_resolution,
    pack_feature_dict_to_frames,
    tensor_to_tiled,
    tiled_to_tensor,
    unpack_frames_to_feature_dict,
)

__all__ = [
    "lower_bound",
    "upper_bound",
    "min_max_normalization",
    "min_max_inv_normalization",
    "ste_round",
    "noise_quantize",
    "compute_frame_resolution",
    "tensor_to_tiled",
    "tiled_to_tensor",
    "pack_feature_dict_to_frames",
    "unpack_frames_to_feature_dict",
]
