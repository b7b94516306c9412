"""Typed persisted web-UI settings (`webuiParamClass.py` DictI/DictT +
`webui-setting-config.yaml` round-trip analog)."""

import dataclasses

from adaface_tpu.webui_params import (
    InferenceSettings,
    TrainSettings,
    from_dict,
    load_settings,
    save_settings,
    update_settings,
)

# the reference's field surfaces (`webuiParamClass.py:5-40, 62-90` +
# `webui-setting-config.yaml`), minus CUDA-only members with no analog
DICTI_FIELDS = {
    "outdir", "indiv_subdir", "skip_grid", "ddim_steps", "plms",
    "skip_save", "fixed_code", "ddim_eta", "n_repeat", "H", "W", "C", "f",
    "n_samples", "bs", "n_rows", "scale", "from_file", "config", "ckpt",
    "seed", "precision", "embedding_paths", "subj_scale", "init_img",
    "mask_weight", "no_preview", "broad_class", "calc_face_sim", "gpu",
    "compare_with", "class_prompt", "clip_last_layers_skip_weights",
    "debug",
}
CONFIG_YAML_FIELDS = {
    "add_image_number", "calc_face_sim", "compare_with", "file_format",
    "file_format_grid", "from_file", "image_file_pattern", "init_img",
    "ref_prompt", "ref_prompt_mix_weight", "scores_csv", "seed",
    "skip_grid", "skip_save",
}
DICTT_FIELDS = {
    "name", "resume", "base", "train", "no_test", "project", "debug",
    "seed", "postfix", "logdir", "lr", "scale_lr", "datadir_in_name",
    "data_roots", "embedding_manager_ckpt", "subject_string",
    "cls_delta_string", "subj_init_word_weights", "layerwise_lora_rank",
    "embedding_reg_weight", "composition_delta_reg_weight",
    "min_rand_scaling", "max_rand_scaling", "num_compositions_per_image",
    "broad_class", "clip_last_layers_skip_weights", "no_wandb",
}


def test_field_surface_covers_reference():
    inf = {f.name for f in dataclasses.fields(InferenceSettings)}
    tr = {f.name for f in dataclasses.fields(TrainSettings)}
    assert DICTI_FIELDS - {"laion400m"} <= inf
    assert CONFIG_YAML_FIELDS - {"entended_info"} <= inf
    # `actural_resume` (sic) is accepted on load, stored as actual_resume
    assert DICTT_FIELDS <= tr
    assert "actual_resume" in tr


def test_roundtrip_and_update(tmp_path):
    path = str(tmp_path / "webui-settings.yaml")
    inf, tr = load_settings(path)  # no file -> defaults
    assert inf.seed == 42 and inf.ddim_steps == 20 and tr.seed == 23
    inf.seed = 777
    inf.prompt = "a z riding a bike"
    tr.layerwise_lora_rank = 10
    save_settings(inf, tr, path)
    inf2, tr2 = load_settings(path)
    assert inf2 == inf and tr2 == tr

    update_settings(path, seed=9, ddim_steps=30, logdir="logs/x")
    inf3, tr3 = load_settings(path)
    assert inf3.seed == 9 and inf3.ddim_steps == 30
    assert tr3.logdir == "logs/x"
    assert inf3.prompt == "a z riding a bike"  # untouched fields survive


def test_type_coercion_and_unknown_keys():
    inf = from_dict(InferenceSettings, {
        "seed": "123", "plms": "true", "scale": "7.5",
        "clip_last_layers_skip_weights": "0.3 0.7",
        "bogus_key": 1, "entended_info": False})
    assert inf.seed == 123 and inf.plms is True and inf.scale == 7.5
    assert inf.clip_last_layers_skip_weights == [0.3, 0.7]
    tr = from_dict(TrainSettings, {"actural_resume": "sd.ckpt",
                                   "subj_init_word_weights": [1, 2]})
    assert tr.actual_resume == "sd.ckpt"
    assert tr.subj_init_word_weights == [1.0, 2.0]


def test_flat_reference_file_loads(tmp_path):
    # the reference's flat webui-setting-config.yaml shape
    p = tmp_path / "webui-setting-config.yaml"
    p.write_text("seed: 61311\nskip_grid: false\nref_prompt: None\n")
    inf, _ = load_settings(str(p))
    assert inf.seed == 61311 and inf.skip_grid is False


def test_update_settings_train_prefix(tmp_path):
    """Fields present on BOTH dataclasses (seed, debug, ...) reach the
    TrainSettings copy via a `train.`-prefixed key; bare keys keep the
    inference-first routing."""
    path = str(tmp_path / "s.yaml")
    inf, tr = update_settings(path, seed=7, **{"train.seed": 99})
    assert inf.seed == 7 and tr.seed == 99
    # train-only bare keys still route to TrainSettings
    inf2, tr2 = update_settings(path, logdir="logs/q")
    assert tr2.logdir == "logs/q" and inf2.seed == 7
