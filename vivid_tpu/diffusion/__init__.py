from .sampler import edm_sampler, sigma_schedule, make_denoiser
from .loss import NVLoss, SRNVLoss, down_up_resize
from .lr import learning_rate_schedule
from .phema import (PowerFunctionEMA, TraditionalEMA, exp_to_std, std_to_exp,
                    power_function_beta, solve_posthoc_coefficients)
