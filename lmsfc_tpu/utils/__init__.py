from .misc import metric_tracking, time_measure
from .readwrite import (
    read_bytes,
    read_float32,
    read_uchars,
    read_uints,
    write_bytes,
    write_float32,
    write_uchars,
    write_uints,
)

__all__ = [
    "time_measure",
    "metric_tracking",
    "read_bytes",
    "read_float32",
    "read_uchars",
    "read_uints",
    "write_bytes",
    "write_float32",
    "write_uchars",
    "write_uints",
]
