"""Exit 0 iff BENCH_inround_r4.json exists and is a good (non-partial) snapshot.

Kept as a file (not an inline heredoc) because the chain's stages run
exported bash functions through a ``bash -c`` shim, and ``export -f``
mangles heredocs when the function is re-parsed (stage-1 rc failure,
round 4).
"""
import json
import sys

path = sys.argv[1] if len(sys.argv) > 1 else "BENCH_inround_r4.json"
try:
    d = json.load(open(path))
except Exception:
    sys.exit(1)
sys.exit(0 if d.get("value") is not None else 1)
