#!/usr/bin/env python
"""Generate TRUE CompressAI golden fixtures for the rANS interop tests.

This script must run in an environment with the real `compressai` package
installed (it is NOT installable in the sealed build environment — zero
egress; see tests/test_rans_golden.py). Run it anywhere CompressAI works:

    pip install compressai
    python scripts/gen_compressai_fixtures.py

then vendor the produced ``tests/fixtures/rans/compressai/`` directory into
the repo. `tests/test_rans_golden.py::TestCompressAIInterop` auto-activates
when the directory exists and pins:

  - byte-identity: our C++ encoder reproduces CompressAI's exact stream for
    every committed case;
  - cross-decode: our decoder round-trips CompressAI's streams.

The cases replayed are exactly `tests/test_rans_golden.py::_cases()` — the
same symbols/indexes/CDF tables the in-repo fixtures pin — so a mismatch
isolates a true layout divergence, not a test-vector difference.

Interface replayed: compressai.ans.RansEncoder.encode_with_indexes /
RansDecoder.decode_with_indexes (the API the reference calls at
pipelines/fo_vcm/pipeline/compressai.py:140-142).
"""

import hashlib
import json
import subprocess
import sys
from datetime import datetime, timezone
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))
OUT = REPO / "tests" / "fixtures" / "rans" / "compressai"


def main() -> None:
    try:
        import compressai
        from compressai import ans
    except ImportError:
        sys.exit(
            "compressai is not installed. This generator is meant to run "
            "OFFLINE in an environment with CompressAI (pip install "
            "compressai), producing fixtures to vendor into the repo."
        )

    from tests.test_rans_golden import _cases

    OUT.mkdir(parents=True, exist_ok=True)
    enc = ans.RansEncoder()
    dec = ans.RansDecoder()
    manifest = {}
    for name, sym, idx, cdfs, lengths, offsets in _cases():
        data = enc.encode_with_indexes(
            list(map(int, sym)), list(map(int, idx)),
            [list(map(int, row)) for row in cdfs],
            list(map(int, lengths)), list(map(int, offsets)),
        )
        back = dec.decode_with_indexes(
            data, list(map(int, idx)),
            [list(map(int, row)) for row in cdfs],
            list(map(int, lengths)), list(map(int, offsets)),
        )
        assert list(back) == list(map(int, sym)), f"{name}: compressai self-check"
        (OUT / f"{name}.bin").write_bytes(data)
        manifest[name] = {
            "bytes": len(data),
            "sha256": hashlib.sha256(data).hexdigest(),
        }
        print(f"{name}: {len(data)} bytes")

    git_rev = subprocess.run(
        ["git", "-C", str(REPO), "rev-parse", "HEAD"],
        capture_output=True, text=True,
    ).stdout.strip() or "unknown"
    (OUT / "provenance.json").write_text(
        json.dumps(
            {
                "generator": "scripts/gen_compressai_fixtures.py",
                "compressai_version": compressai.__version__,
                "python": sys.version.split()[0],
                "generated_utc": datetime.now(timezone.utc).isoformat(),
                "repo_rev": git_rev,
                "cases": manifest,
            },
            indent=2,
        )
    )
    print(f"wrote {OUT}/provenance.json — vendor the directory into the repo")


if __name__ == "__main__":
    main()
