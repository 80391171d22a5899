from .schedule import (DiffusionSchedule, FAST_BETA_6, diffusion_schedule,
                       fast_beta_list, schedule_from_cfg)
from .loss import training_loss
from .sampling import sampling, sampling_pipelined, make_sampling_step
