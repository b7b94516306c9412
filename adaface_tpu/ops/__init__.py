from adaface_tpu.ops.schedule import (
    DiffusionSchedule,
    DDIMSchedule,
    make_beta_schedule,
    make_ddim_timesteps,
    make_diffusion_schedule,
    make_ddim_schedule,
)
from adaface_tpu.ops.basic import (
    timestep_embedding,
    group_norm,
    layer_norm,
    quick_gelu,
    geglu,
)
from adaface_tpu.ops.attention import (
    multi_head_attention,
    attention_weights,
)
