"""Worker process for the 2-process multi-host test (test_multihost.py).

Not collected by pytest (no test_ prefix). Validates the process_count>1
branches that single-process tests never reach: jax.distributed init,
make_array_from_process_local_data batch assembly, cross-process stats
allgather, checkpoint save barrier, and param-consistency fingerprints —
the jax.distributed analogue of the reference's 8-rank DDP protocol
(torch_utils/distributed.py:23-48).
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--coordinator", required=True)
    ap.add_argument("--process-id", type=int, required=True)
    ap.add_argument("--num-processes", type=int, default=2)
    ap.add_argument("--workdir", required=True)
    args = ap.parse_args()

    # Platform/devices must be fixed before first backend use.
    flags = [f for f in os.environ.get("XLA_FLAGS", "").split()
             if "host_platform_device_count" not in f]
    flags.append("--xla_force_host_platform_device_count=4")
    os.environ["XLA_FLAGS"] = " ".join(flags)
    import jax
    jax.config.update("jax_platforms", "cpu")

    import numpy as np
    import jax.numpy as jnp

    from vivid_tpu.core import dist
    from vivid_tpu.core import stats as training_stats
    from vivid_tpu.core.checkpoint import CheckpointIO
    from vivid_tpu.core.consistency import check_param_consistency
    from vivid_tpu.core.sharding import make_mesh, replicate, shard_batch
    from vivid_tpu.diffusion.loss import NVLoss
    from vivid_tpu.diffusion.phema import std_to_exp
    from vivid_tpu.nn.precond import PrecondConfig, precond_init
    from vivid_tpu.train.step import (TrainConfig, init_train_state,
                                      make_train_step)

    dist.init(coordinator_address=args.coordinator,
              num_processes=args.num_processes, process_id=args.process_id)
    assert jax.process_count() == args.num_processes, jax.process_count()
    n_dev = 4 * args.num_processes
    assert jax.device_count() == n_dev, jax.device_count()
    assert dist.get_rank() == args.process_id
    dist.barrier("start")

    cfg = PrecondConfig(img_resolution=32, num_sources=2, model_channels=16,
                        channel_mult=(1, 2), num_blocks=1,
                        attn_resolutions=(16,), channels_per_head=8,
                        use_bf16=False)
    params = precond_init(jax.random.PRNGKey(0), cfg)
    global_batch = n_dev * 2
    tcfg = TrainConfig(batch_size=global_batch, ref_lr=1e-3, rampup_Mimg=0,
                       nimg_mult=6)
    exps = tuple(float(std_to_exp(s) + 1) for s in tcfg.ema_stds)
    step = jax.jit(make_train_step(NVLoss(P_mean=-0.8, P_std=1.6), cfg, tcfg,
                                   exps), donate_argnums=0)

    mesh = make_mesh(n_data=n_dev)
    state = replicate(mesh, init_train_state(params, tcfg))

    local = global_batch // args.num_processes
    rng = np.random.RandomState(100 + args.process_id)
    loss = None
    for i in range(2):
        batch = shard_batch(mesh, {
            "src": rng.randn(local, 2, 32, 32, 3).astype(np.float32),
            "tgt": rng.randn(local, 32, 32, 3).astype(np.float32),
            "geometry": rng.randn(local, 2, 20).astype(np.float32),
        })
        state, st = step(state, batch, jax.random.PRNGKey(5 + i))
        loss = float(st["Loss/loss"])
        assert np.isfinite(loss), loss
        training_stats.report("Loss/loss", loss)

    # Cross-process stats reduction: each process reported 2 values; the
    # collector's allgather must see all 4.
    collector = training_stats.Collector(training_stats.default_stats)
    collector.update()
    agg = collector.as_dict()
    assert agg["Loss/loss"].num == 2 * args.num_processes, agg

    # Identical global data -> every process must hold byte-identical params.
    check_param_consistency(jax.device_get(state.params), "params")

    # Checkpoint save: rank 0 writes, everyone passes the barrier.
    ckpt = CheckpointIO(state={"params": state.params,
                               "cur_nimg": state.cur_nimg})
    path = os.path.join(args.workdir, "training-state-0000001.pt")
    ckpt.save(path)
    assert os.path.exists(path)

    assert int(state.cur_nimg) == global_batch * 6 * 2

    # FSDP phase: ZeRO-3 state sharded ACROSS the two processes — exercises
    # the multi-process make_array_from_callback placement, the
    # reduce-scatter/all-gather step, and the collective unshard_tree gather
    # that snapshots/checkpoints use.
    from vivid_tpu.core.sharding import unshard_tree
    from vivid_tpu.train.step import jit_train_step
    params2 = precond_init(jax.random.PRNGKey(0), cfg)
    fstep, fstate = jit_train_step(
        make_train_step(NVLoss(P_mean=-0.8, P_std=1.6), cfg, tcfg, exps),
        mesh, init_train_state(params2, tcfg),
        fsdp_axis="data", fsdp_min_size=0)
    assert any(not x.sharding.is_fully_replicated
               for x in jax.tree.leaves(fstate.params))
    rng2 = np.random.RandomState(200 + args.process_id)
    fbatch = shard_batch(mesh, {
        "src": rng2.randn(local, 2, 32, 32, 3).astype(np.float32),
        "tgt": rng2.randn(local, 32, 32, 3).astype(np.float32),
        "geometry": rng2.randn(local, 2, 20).astype(np.float32),
    })
    fstate, fst = fstep(fstate, fbatch, jax.random.PRNGKey(9))
    floss = float(fst["Loss/loss"])
    assert np.isfinite(floss), floss
    gathered = unshard_tree(mesh, fstate.params)
    check_param_consistency(jax.device_get(gathered), "fsdp params")

    print(f"MULTIHOST-OK p{args.process_id} loss={loss:.4f} "
          f"fsdp_loss={floss:.4f} stats_num={agg['Loss/loss'].num}", flush=True)


if __name__ == "__main__":
    main()
