from .schedule import DiffusionSchedule, diffusion_schedule, schedule_from_cfg
from .loss import training_loss
from .sampling import sampling, sampling_pipelined, make_sampling_step
