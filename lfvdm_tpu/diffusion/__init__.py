from .schedules import get_named_beta_schedule, betas_for_alpha_bar, space_timesteps
from .gaussian import (
    GaussianDiffusion,
    ModelMeanType,
    ModelVarType,
    LossType,
    mean_flat,
)
from .dpm_solver import dpm_solver_pp_coefficients, dpm_solver_pp_sample_loop
from .resample import (
    ScheduleSampler,
    UniformSampler,
    LossAwareSampler,
    LossSecondMomentResampler,
    create_named_schedule_sampler,
)
