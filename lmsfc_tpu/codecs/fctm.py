"""FCTM bridge: MPEG's Feature Coding Test Model as a codec plugin.

Mirrors compressai_vision/codecs/fctm.py:32-61 — a thin adapter registered
only when the external `fctm` package is importable. The FCTM tool-chain
config (feature reduction, packing/conversion, inner VTM) passes straight
through the codec settings (ref cfgs/codec/fctm.yaml:1-55).
"""

from __future__ import annotations


from ..registry import register_codec

try:  # external MPEG package — absent in this environment
    import fctm  # type: ignore

    _HAS_FCTM = True
except ImportError:
    _HAS_FCTM = False


if _HAS_FCTM:

    @register_codec("fctm")
    class FCTM(fctm.feature_coding_model):  # pragma: no cover
        def __init__(self, vision_model=None, dataset=None, eval_encode="bpp",
                     qp=None, **kwargs):
            super().__init__(**kwargs)
            self.qp = qp
            self.eval_encode = eval_encode

        @property
        def qp_value(self):
            return self.qp

        @property
        def eval_encode_type(self):
            return self.eval_encode

else:

    class FCTM:  # placeholder so imports resolve; not registered
        """Unavailable: install the MPEG FCTM package to enable."""

        def __init__(self, *a, **k):
            raise ImportError("fctm package not installed")
