from .mp import (normalize, mp_silu, mp_sum, mp_cat, resample,
                 mp_fourier_init, mp_fourier_apply,
                 mp_conv_init, mp_conv_apply, force_weight_normalize)
