from adaface_tpu.samplers.ddim import ddim_sample, make_cfg_eps_fn, stochastic_encode, ddim_decode
from adaface_tpu.samplers.plms import plms_sample
