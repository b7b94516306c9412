#!/bin/sh
# Batch per-subject generation + scoring — the `scripts/test-subjects-plain.sh`
# analog (fish loop over evaluation/info-*.sh ranges). POSIX shell.
#
# Usage: scripts/test_subjects.sh INFO_FILE DATA_ROOT LOGROOT OUTROOT [RANGE] [EXTRA...]
#   INFO_FILE  fish-syntax subject file (set -g subjects ...)
#   LOGROOT    per-subject training logdirs (embeddings_last.npz inside)
#   RANGE      1-offset like "1-5,8" (default: all)
#   EXTRA      forwarded to scripts/txt2img.py (e.g. --ckpt sd-v1-5.ckpt)
set -e
INFO=${1:?info file}
DATA_ROOT=${2:?data root}
LOGROOT=${3:?log root}
OUTROOT=${4:?out root}
RANGE=${5:-}
shift $(( $# > 5 ? 5 : $# ))

SUBJECTS=$(python - "$INFO" "$RANGE" <<'EOF'
import sys
sys.path.insert(0, "adaface_tpu/..")
from adaface_tpu.evaluation.eval_utils import parse_range_str, parse_subject_file
info, _ = parse_subject_file(sys.argv[1])
sel = parse_range_str(sys.argv[2] or None) or info["sel_set"]
print(" ".join(info["subjects"][i] for i in sel))
EOF
)

for SUBJ in $SUBJECTS; do
  echo "=== generating $SUBJ ==="
  python scripts/txt2img.py \
    --embedding_paths "$LOGROOT/$SUBJ/embeddings_last.npz" \
    --prompt "a photo of a z" \
    --compare_with "$DATA_ROOT/$SUBJ" \
    --out "$OUTROOT/$SUBJ" "$@"
done
