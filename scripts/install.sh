#!/usr/bin/env bash
# Environment setup — the equivalent of the reference's scripts/install.sh
# (which pinned Detectron2/JDE SHAs, patched JDE, and downloaded weights;
# ref install.sh:17,61-190). This framework needs none of those Python
# dependencies: the models are reimplemented in JAX. What remains external:
#
#   1. native rANS library (built here from lmsfc_tpu/native/rans.cpp)
#   2. OPTIONAL anchor-codec binaries (VTM EncoderAppStatic/DecoderAppStatic/
#      parcatStatic, HM TAppEncoder/TAppDecoder, vvenc/vvdec, ffmpeg with
#      libx264/libx265) — build from their upstream releases and point the
#      codec settings (codec.settings.encoder_path etc.) at them
#   3. OPTIONAL pretrained torch weights for accuracy parity:
#        Detectron2 model zoo pickles (model_final_280758.pkl faster_rcnn,
#        model_final_f10217.pkl mask_rcnn) -> vision_model.<arch>.weights
#        JDE jde.1088x608.uncertainty.pt -> vision_model.jde_1088x608.weights
#      converted on load by models/wrappers/torch_weights*.py
set -euo pipefail
cd "$(dirname "$0")/.."

python - <<'PY'
from lmsfc_tpu.native import ensure_built
print("librans:", ensure_built(force=True))
PY

python -m pytest tests/test_rans.py -q
echo "install ok"
