#!/bin/sh
# Batch per-subject training — the `scripts/train-subjects.sh` analog
# (fish loop over evaluation/info-*.sh subject ranges). POSIX shell here.
#
# Usage: scripts/train_subjects.sh INFO_FILE DATA_ROOT LOGROOT [RANGE] [EXTRA...]
#   INFO_FILE  fish-syntax subject file (set -g subjects ...)
#   RANGE      1-offset like "1-5,8" (default: all)
set -e
INFO=${1:?info file}
DATA_ROOT=${2:?data root}
LOGROOT=${3:?log root}
RANGE=${4:-}
shift $(( $# > 4 ? 4 : $# ))

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
  echo "=== training $SUBJ ==="
  python scripts/train.py --data_root "$DATA_ROOT/$SUBJ" \
    --logdir "$LOGROOT/$SUBJ" "$@"
done
