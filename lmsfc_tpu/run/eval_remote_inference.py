"""Remote-inference evaluation runner.

The reference ships this as a near-duplicate of the split runner
(compressai_vision/run/eval_remote_inference.py:73-214); here both share one
implementation — this module is the console entry point that defaults the
pipeline group to remote inference.
"""

from __future__ import annotations

from typing import List, Optional

from .eval_split_inference import main as _main


def main(argv: Optional[List[str]] = None) -> None:
    _main(argv)


if __name__ == "__main__":
    main()
