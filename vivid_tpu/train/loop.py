"""Training orchestration loop.

Parity surface: training/training_loop.py:168-594 — resume-from-latest,
status ticks with stats.jsonl, periodic sample grids through the real
sampler, periodic small-N metric evals, per-EMA-std snapshot pickles,
training-state checkpoints, slice/suspend contract — re-built around a
single jitted train step on a device mesh.

Differences by design (TPU-first):
  * one process per host; devices inside a host are mesh columns, so
    "batch_gpu"/accumulation math happens on the mesh, not via DDP ranks;
  * the per-step (seed, rank, nimg) reseed becomes fold_in(seed_key, nimg);
  * startup FLOPs analysis uses XLA cost analysis instead of a profiler hook.
"""

import json
import os
import time
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from vivid_tpu.core import dist, stats as stats_mod
from vivid_tpu.core.checkpoint import CheckpointIO, latest_checkpoint
from vivid_tpu.core.easydict import EasyDict
from vivid_tpu.core.logger import format_time
from vivid_tpu.core.rngs import base_key, step_key
from vivid_tpu.core.sharding import make_mesh, shard_batch
from vivid_tpu.data.collate import BatchLoader, DualSourceCollate, VanillaCollate
from vivid_tpu.data.encoders import StandardRGBEncoder
from vivid_tpu.data.scenes import SceneDataset
from vivid_tpu.diffusion.loss import NVLoss, SRNVLoss
from vivid_tpu.diffusion.phema import std_to_exp
from vivid_tpu.diffusion.sampler import edm_sampler, make_denoiser
from vivid_tpu.nn.precond import PrecondConfig, precond_init
from vivid_tpu.train.snapshots import save_snapshot
from vivid_tpu.train.step import (TrainConfig, TrainState, init_train_state,
                                  jit_train_step, make_train_step)


def _state_to_dict(state: TrainState) -> dict:
    return dict(params=state.params, adam_m=state.adam_m, adam_v=state.adam_v,
                adam_step=state.adam_step, emas=list(state.emas),
                cur_nimg=state.cur_nimg)


def _state_from_dict(d: dict) -> TrainState:
    return TrainState(params=d["params"], adam_m=d["adam_m"], adam_v=d["adam_v"],
                      adam_step=jnp.asarray(d["adam_step"]),
                      emas=tuple(d["emas"]),
                      cur_nimg=jnp.asarray(d["cur_nimg"]))


def analyze_flops(step_fn, state, batch, rng):
    """Startup FLOPs report via XLA cost analysis (the DeepSpeed profiler
    analogue, training_loop.py:109-166). `step_fn` must be the already-jitted
    step so the compiled executable is cached and reused by training."""
    try:
        lowered = step_fn.lower(state, batch, rng)
        cost = lowered.compile().cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        gflops = float(cost.get("flops", 0.0)) / 1e9
        dist.print0(f"Train-step compute: {gflops:.2f} GFLOPs "
                    f"(XLA cost analysis, fused step incl. backward+Adam+EMA)")
        return gflops
    except Exception as err:  # cost analysis is best-effort
        dist.print0(f"FLOPs analysis unavailable: {err}")
        return None


def training_loop(
    run_dir: str,
    dataset_kwargs: Optional[dict] = None,
    test_dataset_path: Optional[str] = None,
    encoder_kwargs: Optional[dict] = None,
    network_kwargs: Optional[dict] = None,
    loss_kwargs: Optional[dict] = None,
    lr_kwargs: Optional[dict] = None,
    ema_stds=(0.050, 0.100),
    seed: int = 0,
    batch_size: int = 64,
    batch_gpu: Optional[int] = None,
    total_nimg: int = 192_000_000,
    slice_nimg: Optional[int] = None,
    status_nimg: Optional[int] = 960,
    samples_nimg: Optional[int] = 9600,
    metrics_nimg: Optional[int] = None,
    snapshot_nimg: Optional[int] = 10000,
    checkpoint_nimg: Optional[int] = 10000,
    loss_scaling: float = 1.0,
    force_finite: bool = True,
    eval_samples: int = 8,
    sr_training: bool = False,
    vanilla_mode: bool = False,
    plain_mse: bool = False,
    single_image_mix: Optional[float] = None,
    single_image_mix_path: Optional[str] = None,
    sr_model=None,
    depth_model=None,
    metrics_fn=None,
    metrics_list=None,
    max_steps: Optional[int] = None,
    debug: Optional[bool] = None,
    fsdp: bool = False,
    deterministic: bool = False,
):
    """Train an NVS diffusion model. Interval arguments are in nimg like the
    reference; `max_steps` additionally bounds the number of optimizer steps
    (tests / smoke runs)."""
    start_time = time.time()
    dist.init()
    # Data axis = largest divisor of the global batch that fits the device
    # count (the reference asserts strict divisibility, training_loop.py:217;
    # we degrade to fewer devices for small smoke batches).
    n_data = jax.device_count()
    while batch_size % n_data != 0:
        n_data -= 1
    if n_data != jax.device_count():
        dist.print0(f"Note: batch {batch_size} not divisible by "
                    f"{jax.device_count()} devices; using {n_data}.")
    mesh = make_mesh(n_data=n_data)
    os.makedirs(run_dir, exist_ok=True)
    os.makedirs(os.path.join(run_dir, "results"), exist_ok=True)

    num_sources = 1 if vanilla_mode else 2

    # Model (its resolution drives the data pipeline size).
    net_kwargs = dict(network_kwargs or {})
    net_kwargs.setdefault("img_resolution", 256 if sr_training else 64)
    net_kwargs.setdefault("num_sources", num_sources)
    net_kwargs.setdefault("source_label_dim", 20)
    net_kwargs.setdefault("target_label_dim", 20 * num_sources)
    net_kwargs.setdefault("super_res", sr_training)
    model_cfg = PrecondConfig(**net_kwargs)
    target_resolution = model_cfg.img_resolution
    dist.print0(f"Constructing network (resolution {target_resolution})...")

    # Data.
    dataset_kwargs = dict(dataset_kwargs or {})
    dist.print0(f"Setting up {target_resolution}x{target_resolution} training data...")
    from vivid_tpu.data.re10k_scenes import open_scene_dataset
    dataset = open_scene_dataset(
        dataset_kwargs["path"], seed=seed,
        process_index=dist.get_rank(), process_count=dist.get_world_size(),
        **{k: v for k, v in dataset_kwargs.items()
           if k not in ("path", "class_name")})
    collate_cls = VanillaCollate if vanilla_mode else DualSourceCollate
    collate = collate_cls(imsize=target_resolution, seed=seed)
    per_process_batch = batch_size // dist.get_world_size()

    # Single-image co-training: a fixed fraction of each batch is synthesized
    # from single images via homography rotations (training_loop.py:230-234).
    single_loader = None
    main_batch = per_process_batch
    single_ds = None
    if single_image_mix:
        n_single = min(per_process_batch - 1,
                       max(1, int(per_process_batch * single_image_mix)))
        from vivid_tpu.data.single_images import SingleImages
        single_ds = SingleImages(single_image_mix_path or dataset_kwargs["path"],
                                 imsize=target_resolution,
                                 num_sources=num_sources, seed=seed + 2)
        main_batch = per_process_batch - n_single
    # Loader construction is deferred past the resume block: in
    # deterministic mode the resumed loader fast-forwards the sampling
    # stream by the rows the checkpointed run already consumed, making a
    # killed+resumed run bitwise-identical to an unkilled one (the
    # reference's stream restarts from scratch at resume).

    if sr_model is not None and isinstance(sr_model, str):
        from vivid_tpu.train.snapshots import load_snapshot
        sr_model = load_snapshot(sr_model)
    sr_eval_size = sr_model.cfg.img_resolution if sr_model is not None else None

    test_loader = None
    if test_dataset_path and eval_samples and dist.get_rank() == 0:
        test_dataset = open_scene_dataset(test_dataset_path, seed=seed + 1,
                                          split=dataset_kwargs.get("split", "test"))
        test_loader = BatchLoader(iter(test_dataset),
                                  collate_cls(imsize=target_resolution,
                                              sr_size=sr_eval_size, seed=seed + 1),
                                  batch_size=eval_samples, prefetch=1, num_threads=1)
    params = precond_init(base_key(seed), model_cfg)
    n_params = sum(int(x.size) for x in jax.tree.leaves(params))
    # Per-module parameter table at startup (the reference prints a full
    # module summary before training, torch_utils/misc.py:205-272).
    from vivid_tpu.core.summary import param_table
    dist.print0(param_table(params))
    dist.print0(f"Parameters: {n_params / 1e6:.2f} M")

    if encoder_kwargs:
        from vivid_tpu.core.registry import construct_class_by_name
        encoder = construct_class_by_name(**dict(encoder_kwargs))
    else:
        encoder = StandardRGBEncoder()
    loss_cls = SRNVLoss if sr_training else NVLoss
    loss_fn = loss_cls(plain_mse=plain_mse, **dict(loss_kwargs or {}))

    # Gradient accumulation: batch_gpu limits the per-device microbatch
    # (reference batch_gpu_total / num_accumulation_rounds math,
    # training_loop.py:213-217); rounds run as a lax.scan inside the step.
    num_accum = 1
    if batch_gpu is not None and batch_gpu > 0:
        per_device = batch_size // max(jax.device_count(), 1)
        if batch_gpu < per_device:
            assert per_device % batch_gpu == 0, \
                f"batch/device {per_device} not divisible by batch_gpu {batch_gpu}"
            num_accum = per_device // batch_gpu

    lr_args = dict(lr_kwargs or {})
    train_cfg = TrainConfig(
        batch_size=batch_size,
        loss_scaling=loss_scaling,
        force_finite=force_finite,
        ref_lr=lr_args.get("ref_lr", 100e-4),
        ref_batches=lr_args.get("ref_batches", 70e3),
        rampup_Mimg=lr_args.get("rampup_Mimg", 10.0),
        ema_stds=tuple(ema_stds),
        nimg_mult=(collate.nimg_mult if not vanilla_mode else 1),
        loss_clamp_3sigma=not plain_mse,
        force_wn=bool(net_kwargs.get("force_wn", False)),
        num_accum=num_accum,
    )
    ema_exponents = tuple(float(std_to_exp(std) + 1) for std in train_cfg.ema_stds)
    state = init_train_state(params, train_cfg)
    del params

    # Resume.
    resumed = latest_checkpoint(run_dir)
    if resumed is not None:
        dist.print0(f"Resuming from {resumed} ...")
        with open(resumed, "rb") as f:
            import pickle
            data = pickle.load(f)
        state = _state_from_dict(jax.tree.map(jnp.asarray, data["state"]))

    stop_at_nimg = total_nimg
    if slice_nimg is not None:
        granularity = checkpoint_nimg or snapshot_nimg or batch_size
        stop_at_nimg = min(stop_at_nimg,
                           (int(state.cur_nimg) + slice_nimg) // granularity * granularity)
    assert stop_at_nimg > int(state.cur_nimg), "nothing to train"
    nimg_per_step = batch_size * train_cfg.nimg_mult
    dist.print0(f"Training from {int(state.cur_nimg) // 1000} kimg to "
                f"{stop_at_nimg // 1000} kimg "
                f"({(stop_at_nimg - int(state.cur_nimg)) // nimg_per_step} steps):")

    # Data loaders (after resume so deterministic mode can fast-forward by
    # the exact per-process rows already delivered: one main_batch per
    # completed step — prefetched-but-unconsumed batches of a killed run
    # never advanced cur_nimg, so they are correctly regenerated).
    steps_prev = int(state.cur_nimg) // nimg_per_step
    loader = BatchLoader(
        iter(dataset), collate, batch_size=main_batch,
        num_threads=1 if deterministic else None,
        skip_rows=steps_prev * main_batch if deterministic else 0)
    if single_ds is not None:
        # The single-image stream has its own plan/materialize split, so in
        # deterministic mode it fast-forwards by its rows-consumed (one
        # n_single group per completed step) exactly like the main loader.
        single_loader = BatchLoader(iter(single_ds), single_ds,
                                    batch_size=n_single, prefetch=1,
                                    num_threads=1,
                                    skip_rows=steps_prev * n_single
                                    if deterministic else 0)

    # FSDP (ZeRO-3) shards params/optimizer/EMA state over the 'data' axis;
    # default keeps the reference's DDP memory model (replicated state).
    step_fn, state = jit_train_step(
        make_train_step(loss_fn, model_cfg, train_cfg, ema_exponents),
        mesh, state, fsdp_axis="data" if fsdp else None,
        accum=train_cfg.num_accum > 1,
        auto_layout=os.environ.get("VIVID_AUTO_LAYOUT", "0") == "1")
    if fsdp:
        dist.print0(f"FSDP: state sharded over {n_data} devices")
    seed_key = base_key(seed)

    def host_state():
        """State with every leaf host-readable (all-gathered under FSDP)."""
        if not fsdp:
            return state
        from vivid_tpu.core.sharding import unshard_tree
        return unshard_tree(mesh, state)

    # Optional wandb mirroring of the stats stream (reference
    # training_loop.py:370-378); silently disabled when not installed.
    wandb_run = None
    if dist.get_rank() == 0 and not debug and os.environ.get("WANDB_PROJECT"):
        try:
            import wandb
            wandb_run = wandb.init(project=os.environ["WANDB_PROJECT"],
                                   dir=run_dir, config=dict(
                                       batch_size=batch_size, seed=seed,
                                       network=net_kwargs))
        except ImportError:
            dist.print0("wandb not installed; skipping wandb logging")

    # Default in-training metric eval (calculate_metrics.get_metrics analogue,
    # training_loop.py:473-483) over the test dataset.
    if metrics_fn is None and metrics_nimg is not None and test_dataset_path:
        def metrics_fn(ema_params, cfg_):
            from vivid_tpu.core.easydict import EasyDict as ED
            from vivid_tpu.metrics.api import get_metrics
            net_obj = ED(params=ema_params, cfg=cfg_)
            return get_metrics(net_obj, encoder=encoder, num_images=100,
                               metrics=metrics_list,
                               datakwargs={"path": test_dataset_path},
                               max_batch_size=25)

    from vivid_tpu.geometry.depth import add_depth, resolve_depth_model
    depth_model = resolve_depth_model(depth_model)

    def with_depth(src_latents, raw_src):
        """Append predicted depth per source view (training_loop.py:531-532)."""
        if depth_model is None:
            return src_latents
        b, s = src_latents.shape[:2]
        flat = src_latents.reshape((b * s,) + src_latents.shape[2:])
        flat_raw = jnp.asarray(raw_src).reshape((b * s,) + raw_src.shape[2:])
        out = add_depth(depth_model, flat_raw, flat, inv_norm=model_cfg.depth_input)
        return out.reshape((b, s) + out.shape[1:])

    # Pixel->latent encode runs ON DEVICE in one jitted program (host-side
    # eager encode_latents cost two dispatches + an f32 upload per step).
    # VIVID_UPLOAD_DTYPE=float16|uint8 additionally compacts the host->device
    # image transfer (2x/4x fewer bytes; float16 is exact for box-filtered
    # uint8 pixels — quarters up to 512 — uint8 rounds). Default float32
    # keeps today's bit-exact behavior.
    upload_dtype = os.environ.get("VIVID_UPLOAD_DTYPE", "float32")

    def _compact_img(x):
        if upload_dtype == "float16":
            return np.asarray(x, np.float16)
        if upload_dtype == "uint8":
            return np.asarray(np.clip(np.rint(x), 0, 255), np.uint8)
        return np.asarray(x)

    @jax.jit
    def _encode_batch(src_raw, tgt_raw, geometry):
        return {"src": encoder.encode_latents(src_raw),
                "tgt": encoder.encode_latents(tgt_raw),
                "geometry": geometry}

    def device_batch(raw):
        if single_loader is not None:
            extra = next(single_loader)
            raw = {k: np.concatenate([raw[k], extra[k]], axis=0) for k in raw}
        if depth_model is not None:
            # Depth conditioning path: keep the host-side encode (add_depth
            # mixes host/device work and is not worth fusing here).
            src = encoder.encode_latents(raw["src_image"])
            src = with_depth(src, raw["src_image"])
            batch = {
                "src": src,
                "tgt": encoder.encode_latents(raw["tgt_image"]),
                "geometry": jnp.asarray(raw["geometry"]),
            }
        else:
            batch = {
                "src": _compact_img(raw["src_image"]),
                "tgt": _compact_img(raw["tgt_image"]),
                "geometry": np.asarray(raw["geometry"]),
            }
        if train_cfg.num_accum > 1:
            # [B, ...] -> [rounds, B/rounds, ...]; each round stays sharded
            # over the data axis of the smaller microbatch.
            batch = jax.tree.map(
                lambda x: x.reshape((train_cfg.num_accum,
                                     x.shape[0] // train_cfg.num_accum)
                                    + x.shape[1:]), batch)
            from jax.sharding import NamedSharding, PartitionSpec as P
            sh = NamedSharding(mesh, P(None, "data"))
            batch = jax.tree.map(lambda x: jax.device_put(x, sh), batch)
        else:
            batch = shard_batch(mesh, batch)
        if depth_model is None:
            batch = _encode_batch(batch["src"], batch["tgt"], batch["geometry"])
        return batch

    # Startup FLOPs report (compiles the step once; cache reused by training).
    first_batch = device_batch(next(loader))
    analyze_flops(step_fn, state, first_batch,
                  step_key(seed_key, int(state.cur_nimg)))

    # Live progress bar with a loss postfix, like the reference's tqdm loop
    # (training_loop.py:337, 568). The postfix refreshes at status ticks only
    # (per-step loss would force a host sync every step); import-gated.
    pbar = None
    if dist.get_rank() == 0 and not debug:
        try:
            from tqdm.auto import tqdm
            pbar = tqdm(total=stop_at_nimg, initial=int(state.cur_nimg),
                        unit="img", unit_scale=True, dynamic_ncols=True,
                        desc="train")
        except ImportError:
            pass

    stats_jsonl = None
    pending_stats = []  # device-side stat dicts; pulled only at status ticks
    prev_status_time = time.time()
    prev_status_nimg = int(state.cur_nimg)
    cumulative_training_time = 0.0
    start_nimg = int(state.cur_nimg)
    steps_done = 0
    pending_batch = first_batch
    loader_wait = [0.0, 0]  # [seconds blocked on next(loader), rows fetched]

    def fetch_batch():
        """next(loader) with wait-time accounting: >0 wait means the host
        loader could not keep ahead of the device (resource telemetry the
        reference reports via psutil, training_loop.py:343-359)."""
        t0 = time.time()
        b = next(loader)
        loader_wait[0] += time.time() - t0
        loader_wait[1] += len(jax.tree.leaves(b)[0])
        return device_batch(b)

    ckpt_holder = {"io": None}

    # Overlapped checkpointing: at a checkpoint tick the live state is cloned
    # device-side (one jitted identity program — HBM-to-HBM, milliseconds),
    # then the 5 GB-class device->host gather + pickle run in a background
    # thread while stepping continues. The clone is mandatory for overlap:
    # jit_train_step donates the state buffers, so the NEXT step invalidates
    # every live leaf. VIVID_SYNC_CKPT=1 restores the synchronous gather
    # (HBM-tight runs where a transient extra state copy would OOM).
    overlap_ckpt = os.environ.get("VIVID_SYNC_CKPT", "0") != "1"
    snapshot_state = jax.jit(lambda s: jax.tree.map(jnp.copy, s))

    def save_training_state(cur_nimg, st):
        fname = os.path.join(run_dir, f"training-state-{cur_nimg // 1000:07d}.pt")
        if ckpt_holder["io"] is not None:
            ckpt_holder["io"].wait()  # one in-flight async write at a time
        snap, consume = None, False
        if overlap_ckpt:
            try:
                snap = snapshot_state(st)
                # Force the clone to execute NOW (the tunnel runs programs
                # lazily); afterwards the live buffers are free to be donated.
                np.asarray(snap.adam_step)
                consume = True
            except Exception as err:  # e.g. no HBM headroom for the clone
                dist.print0(f"Checkpoint clone failed ({err}); "
                            f"falling back to synchronous gather")
                snap = None
        if snap is not None:
            holder = CheckpointIO(state=_state_to_dict(snap))
            holder.save(fname, async_=True, gather_async=True, consume=consume)
        else:
            holder = CheckpointIO(state=_state_to_dict(st))
            holder.save(fname, async_=True)
        ckpt_holder["io"] = holder
        # Divergence detector after every checkpoint save, like the
        # reference's check_ddp_consistency (training_loop.py:501).
        if dist.get_world_size() > 1:
            from vivid_tpu.core.consistency import check_param_consistency
            check_param_consistency(st.params, "net params")
        dist.print0(f"Saved {fname}"
                    + (" (gather+write overlapped with training)"
                       if snap is not None else ""))

    def save_snapshots(cur_nimg, st):
        if dist.get_rank() != 0:
            return
        for std, ema in zip(train_cfg.ema_stds, st.emas):
            fname = os.path.join(
                run_dir, f"network-snapshot-{cur_nimg // 1000:07d}-{std:.3f}.pkl")
            save_snapshot(fname, ema, model_cfg,
                          dataset_kwargs=dataset_kwargs,
                          loss_kwargs=dict(loss_kwargs or {}))
            dist.print0(f"Saved {fname}")

    # One compiled eval sampler reused across ticks. Params MUST be jit
    # arguments: closing over them would embed ~250MB of weights as HLO
    # constants (and overflow the remote-compile transport).
    @jax.jit
    def _eval_sample(ema_params, src, geometry, noise, rng, conditioning_image=None):
        denoise = make_denoiser(ema_params, model_cfg, src=src,
                                geometry=geometry, rng=rng,
                                conditioning_image=conditioning_image)
        return edm_sampler(denoise, noise, num_steps=32)

    sr_net = None
    if sr_model is not None:
        sr_net = sr_model

        @jax.jit
        def _sr_sample(sr_params, src, geometry, noise, rng, conditioning_image):
            denoise = make_denoiser(sr_params, sr_net.cfg, src=src,
                                    geometry=geometry, rng=rng,
                                    conditioning_image=conditioning_image)
            return edm_sampler(denoise, noise, num_steps=32)

    def generate_sample_grid(cur_nimg, st):
        if test_loader is None or dist.get_rank() != 0:
            return
        raw = next(test_loader)
        src = encoder.encode_latents(raw["src_image"])
        src = with_depth(src, raw["src_image"])
        geometry = jnp.asarray(raw["geometry"])
        rng = step_key(seed_key, cur_nimg + 1)
        noise = jax.random.normal(rng, raw["tgt_image"].shape[:1]
                                  + raw["tgt_image"].shape[1:])
        kwargs = {}
        if model_cfg.super_res:
            from vivid_tpu.diffusion.loss import down_up_resize
            kwargs["conditioning_image"] = down_up_resize(
                encoder.encode_latents(raw["tgt_image"]), 4)
        latents = _eval_sample(st.emas[0], src, geometry, noise, rng, **kwargs)
        if sr_net is not None and "sr_src_image" in raw:
            sr_res = sr_net.cfg.img_resolution
            sr_src = encoder.encode_latents(raw["sr_src_image"])
            sr_geometry = jnp.asarray(raw["sr_geometry"])
            low_res = jax.image.resize(
                latents, latents.shape[:1] + (sr_res, sr_res, latents.shape[-1]),
                method="bilinear")
            sr_noise = jax.random.normal(jax.random.fold_in(rng, 1),
                                         latents.shape[:1] + (sr_res, sr_res, 3))
            latents = _sr_sample(sr_net.params, sr_src, sr_geometry, sr_noise,
                                 rng, low_res)
            raw = dict(raw, src_image=raw["sr_src_image"],
                       tgt_image=raw["sr_tgt_image"])
        images = np.asarray(encoder.decode(latents))
        src_img = np.clip(raw["src_image"][:, 0], 0, 255).astype(np.uint8)
        tgt_img = np.clip(raw["tgt_image"], 0, 255).astype(np.uint8)
        grid = np.concatenate([np.concatenate(list(row), axis=1)
                               for row in (src_img, images, tgt_img)], axis=0)
        import PIL.Image
        out = os.path.join(run_dir, "results",
                           f"generated-samples-{cur_nimg // 1000:07d}.png")
        PIL.Image.fromarray(grid, "RGB").save(out)
        dist.print0(f"Saved {out}")
        if wandb_run is not None:
            # Mirror the sample grid to wandb, like the reference
            # (training_loop.py:453-454).
            import wandb
            wandb_run.log({"samples": wandb.Image(grid)}, step=cur_nimg)

    def interval_hit(interval, cur, prev):
        """True when an interval boundary was crossed since the previous step."""
        if interval is None:
            return False
        return cur // interval != prev // interval or cur == start_nimg == 0

    # nimg is tracked host-side (it advances by exactly nimg_per_step per
    # step): reading the device counter every iteration would force a
    # host<->device sync per step, serializing dispatch — with the host
    # counter the loop runs ahead and uploads/steps pipeline until the next
    # tick's stats fetch. The device-side state.cur_nimg stays authoritative
    # for checkpoints/resume. Run-ahead is BOUNDED: once more than
    # VIVID_RUNAHEAD steps are in flight, the loop fetches one scalar from
    # the oldest un-synced step, forcing device execution up to there. An
    # unbounded lazy queue is fragile on high-latency transports (and grows
    # host memory with queued uploads); depth 8 keeps upload/compute/fetch
    # fully overlapped while never queueing a whole tick's worth of work.
    runahead = int(os.environ.get("VIVID_RUNAHEAD", "8"))
    unsynced = 0
    suspend_save = False  # set at a suspend/stop tick; forces a checkpoint
    cur_nimg = int(state.cur_nimg)
    try:
        while True:
            done = cur_nimg >= stop_at_nimg or (max_steps is not None
                                                and steps_done >= max_steps)
            prev_nimg = cur_nimg - nimg_per_step

            if interval_hit(status_nimg, cur_nimg, prev_nimg) or done:
                if pending_stats:
                    # ONE stacked fetch for the whole tick: per-scalar fetches
                    # cost a host<->device round trip each (100 steps x 4
                    # stats dominated tick time on high-latency transports).
                    stacked = jax.tree.map(lambda *xs: jnp.stack(xs),
                                           *pending_stats)
                    host_vals = jax.device_get(stacked)
                    for i in range(len(pending_stats)):
                        stats_mod.report_dict(
                            {k: v[i] for k, v in host_vals.items()})
                pending_stats = []
                unsynced = 0  # the tick fetch synced every in-flight step
                cur_time = time.time()
                tick_time = cur_time - prev_status_time
                stats_mod.report0("Progress/kimg", cur_nimg / 1e3)
                stats_mod.report0("Progress/iter", cur_nimg / max(nimg_per_step, 1))
                stats_mod.report0("Timing/total_sec", cur_time - start_time)
                stats_mod.report0("Timing/sec_per_tick", tick_time)
                stats_mod.report0("Timing/sec_per_kimg",
                                  cumulative_training_time
                                  / max(cur_nimg - prev_status_nimg, 1) * 1e3)
                stats_mod.report0("Timing/maintenance_sec",
                                  tick_time - cumulative_training_time)
                stats_mod.report0("Timing/loader_wait_sec", loader_wait[0])
                stats_mod.report0(
                    "Timing/loader_rows_per_s",
                    loader_wait[1] / max(tick_time, 1e-9))
                loader_wait[0] = 0.0
                loader_wait[1] = 0
                # Resource telemetry (reference training_loop.py:352-354).
                import resource
                stats_mod.report0(
                    "Resources/cpu_mem_gb",
                    resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 2**20)
                mem = jax.local_devices()[0].memory_stats()
                if mem:  # None through proxy backends (e.g. the axon tunnel)
                    stats_mod.report0("Resources/peak_hbm_gb",
                                      mem.get("peak_bytes_in_use", 0) / 2**30)
                    stats_mod.report0("Resources/hbm_gb",
                                      mem.get("bytes_in_use", 0) / 2**30)
                stats_mod.default_collector.update()
                snap = stats_mod.default_collector.as_dict()
                loss_val = snap.get("Loss/loss", EasyDict(mean=float("nan"))).mean
                if pbar is not None:
                    pbar.set_postfix(loss=f"{loss_val:.4f}", refresh=False)
                dist.print0(
                    f"Status: kimg {cur_nimg / 1e3:<9.1f} loss {loss_val:<8.4f} "
                    f"time {format_time(cur_time - start_time):<12s} "
                    f"sec/tick {tick_time:<8.2f}")
                if dist.get_rank() == 0 and not debug:
                    if stats_jsonl is None:
                        stats_jsonl = open(os.path.join(run_dir, "stats.jsonl"), "at")
                    items = {name: v.mean for name, v in snap.items()}
                    items["timestamp"] = time.time()
                    stats_jsonl.write(json.dumps(items) + "\n")
                    stats_jsonl.flush()
                    if wandb_run is not None:
                        wandb_run.log({k.replace("/", "_"): v
                                       for k, v in items.items()}, step=cur_nimg)
                cumulative_training_time = 0.0
                prev_status_nimg = cur_nimg
                prev_status_time = cur_time
                dist.update_progress(cur_nimg // 1000, stop_at_nimg // 1000)
                if cur_nimg >= stop_at_nimg and cur_nimg < total_nimg:
                    dist.request_suspend()
                if dist.should_stop() or dist.should_suspend():
                    done = True
                    # Preemption tolerance: a SIGTERM-suspend (or slice end)
                    # saves a training-state checkpoint at the exact exit
                    # point instead of losing everything since the last
                    # interval checkpoint. Respects --checkpoint=0 (disabled).
                    suspend_save = checkpoint_nimg is not None

            # Periodic work reads the state host-side; under FSDP the gather
            # (host_state) is collective, so run it BEFORE any rank gating.
            hits = dict(
                samples=interval_hit(samples_nimg, cur_nimg, prev_nimg)
                and cur_nimg != start_nimg,
                metrics=metrics_fn is not None
                and interval_hit(metrics_nimg, cur_nimg, prev_nimg)
                and cur_nimg != start_nimg,
                snapshot=interval_hit(snapshot_nimg, cur_nimg, prev_nimg)
                and cur_nimg != start_nimg,
                checkpoint=(interval_hit(checkpoint_nimg, cur_nimg, prev_nimg)
                            or suspend_save)
                and cur_nimg != start_nimg,
            )
            hs = host_state() if any(hits.values()) else state
            if hits["samples"]:
                generate_sample_grid(cur_nimg, hs)
            if hits["metrics"]:
                results = metrics_fn(hs.emas[0], model_cfg)
                dist.print0(f"Metrics: {results}")
                # Record into training_stats (next status row of stats.jsonl)
                # and a dedicated run-dir metrics.jsonl — durable eval curves,
                # not just log-file prose (training_loop.py:481-483).
                for k, v in results.items():
                    stats_mod.report0(f"Metrics/{k}", float(v))
                if run_dir is not None and dist.get_rank() == 0:
                    with open(os.path.join(run_dir, "metrics.jsonl"), "at") as f:
                        f.write(json.dumps(
                            {"nimg": int(cur_nimg), "timestamp": time.time(),
                             **{k: float(v) for k, v in results.items()}})
                            + "\n")
                if wandb_run is not None:
                    # Mirror metric results (training_loop.py:481-483).
                    wandb_run.log({f"metrics_{k}": float(v)
                                   for k, v in results.items()},
                                  step=cur_nimg)
            if hits["snapshot"]:
                save_snapshots(cur_nimg, hs)
            if hits["checkpoint"]:
                save_training_state(cur_nimg, hs)

            if done:
                break

            batch_start = time.time()
            if pending_batch is None:
                pending_batch = fetch_batch()
            rng = step_key(seed_key, cur_nimg)
            state, step_stats = step_fn(state, pending_batch, rng)
            # Overlap: stage the next batch onto the device while the step
            # executes (dispatch is async; the transfer rides alongside).
            pending_batch = fetch_batch()
            pending_stats.append(step_stats)
            unsynced += 1
            if runahead > 0 and unsynced > runahead:
                # Tiny scalar fetch: blocks only until step (i - runahead)
                # has executed; dispatch of newer steps rides on top.
                np.asarray(pending_stats[-1 - runahead]["Loss/loss"])
                unsynced -= 1
            steps_done += 1
            cur_nimg += nimg_per_step
            cumulative_training_time += time.time() - batch_start
            if pbar is not None:
                pbar.update(nimg_per_step)
    finally:
        if pbar is not None:
            pbar.close()
        if ckpt_holder["io"] is not None:
            ckpt_holder["io"].wait()
        loader.close()
        if single_loader is not None:
            single_loader.close()
        if test_loader is not None:
            test_loader.close()
        if stats_jsonl is not None:
            stats_jsonl.close()
        if wandb_run is not None:
            wandb_run.finish()

    dist.print0("Training done.")
    return state
