"""Regenerate the committed rANS golden fixtures (tests/fixtures/rans/).

Run from the repo root:  python tests/gen_rans_fixtures.py

Streams are produced by the pure-Python reference (tests/rans_reference.py),
NOT by the C++ coder under test — the fixtures pin the public rans64/
CompressAI layout independently of lmsfc_tpu/native/rans.cpp.
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from tests import rans_reference as pyref  # noqa: E402
from tests.test_rans_golden import FIXTURE_DIR, _cases  # noqa: E402


def main() -> None:
    FIXTURE_DIR.mkdir(parents=True, exist_ok=True)
    for name, sym, idx, cdfs, lengths, offsets in _cases():
        data = pyref.encode_with_indexes(sym, idx, cdfs, lengths, offsets)
        (FIXTURE_DIR / f"{name}.bin").write_bytes(data)
        print(f"{name}: {len(data)} bytes")


if __name__ == "__main__":
    main()
