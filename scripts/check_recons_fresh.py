"""Exit 0 iff a codec-recons npz matches the checkpoint it was made from.

ADVICE r4 (medium): recon caches were gated on bare file existence, so a
retrained codec silently left heads fine-tuning on stale reconstructions
that no longer matched the sweep codec. The recons makers
(make_oiv6_codec_recons.py / make_jde_codec_recons.py) store a content
fingerprint of the checkpoint; this validates it.

Usage: python scripts/check_recons_fresh.py <recons.npz> <ckpt_dir>
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

import numpy as np

from make_oiv6_codec_recons import ckpt_fingerprint


def main() -> int:
    recons, ckpt = sys.argv[1], sys.argv[2]
    try:
        z = np.load(recons)
        stored = bytes(z["ckpt_fingerprint"]).decode()
    except Exception as e:
        print(f"recons stale: {e}", file=sys.stderr)
        return 1
    actual = ckpt_fingerprint(ckpt)
    if stored != actual:
        print(f"recons stale: fingerprint {stored} != checkpoint {actual}",
              file=sys.stderr)
        return 1
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
