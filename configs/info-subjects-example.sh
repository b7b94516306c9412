# Example subject info file (the evaluation/info-*.sh format the batch
# drivers parse; fish `set -g` syntax, see
# adaface_tpu/evaluation/eval_utils.py:parse_subject_file).
set -g subjects            alice bob rex
set -g class_names         "woman" "man" "dog"
set -g cls_delta_strings   "young woman" "young man" "corgi dog"
set -g data_folder         subjects
set -g broad_classes       1 1 1
set -g are_faces           1 1 0
set -g maxiters            2000 2000 1500
