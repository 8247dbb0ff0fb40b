"""EDM2 inverse-sqrt learning-rate schedule with linear warmup.

Parity surface: training_loop.py:101-107 —
lr = ref_lr / sqrt(max(nimg / (ref_batches * batch_size), 1)) * min(nimg / rampup, 1).
Traceable (pure jnp) so it can live inside the jitted train step.
"""

import jax.numpy as jnp


def learning_rate_schedule(cur_nimg, batch_size, ref_lr=100e-4,
                           ref_batches=70e3, rampup_Mimg=10.0):
    cur_nimg = jnp.asarray(cur_nimg, jnp.float32)
    lr = jnp.asarray(ref_lr, jnp.float32)
    if ref_batches > 0:
        lr = lr / jnp.sqrt(jnp.maximum(cur_nimg / (ref_batches * batch_size), 1.0))
    if rampup_Mimg > 0:
        lr = lr * jnp.minimum(cur_nimg / (rampup_Mimg * 1e6), 1.0)
    return lr
