"""Image generation pipeline: load snapshots, sample novel views, optional
base->SR cascade, write PNGs.

Parity surface: generate_images.py:139-343 (`generate_images_nvs` and its
lazy ImageIterable contract: yields EasyDict(images, src, tgt, labels, noise,
seeds, ...) per batch, writes src_/tgt_/sample_{seed:06d}.png when outdir is
set, shards seeds across processes).

TPU shape: one jitted sampler program per (model, batch shape); the guidance
strength is a traced argument (no recompile per guidance value); per-seed
noise comes from fold_in streams so results are independent of batching and
process count (StackedRandomGenerator contract).
"""

import os
import time
from functools import partial
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp
import PIL.Image

from vivid_tpu.core import dist
from vivid_tpu.core.easydict import EasyDict
from vivid_tpu.core.rngs import seeded_normal
from vivid_tpu.data.collate import BatchLoader, DualSourceCollate, VanillaCollate
from vivid_tpu.data.encoders import StandardRGBEncoder
from vivid_tpu.data.scenes import SceneDataset
from vivid_tpu.diffusion.sampler import edm_sampler, make_denoiser
from vivid_tpu.train.snapshots import load_snapshot, resolve_model

config_presets = {
    "vivid": EasyDict(net="vivid-base.pkl", sr_model="vivid-sr.pkl",
                      gnet="vivid-uncond.pkl", guidance=1.5,
                      range_selection="mid"),
}


def _build_sampler(cfg, gcfg, sampler_kwargs, super_res, mesh=None):
    """One compiled sampler per (model cfg, shapes). Guidance is traced.

    With a data-parallel `mesh`, the whole sampling computation runs inside
    jax.shard_map over the 'data' axis: the sampler has no cross-sample
    communication, and the Pallas attention kernels are custom calls GSPMD
    cannot partition — under plain jit on a pod they would be replicated
    (all-gathering every activation). Per-shard execution keeps them on the
    fast path with zero collectives. Batches not divisible by the data axis
    fall back to plain tracing (decided statically per shape)."""
    kw = dict(sampler_kwargs)
    kw.pop("guidance", None)

    def sample_impl(params, gparams, src, geometry, noise, guidance, rng,
                    conditioning_image, seeds, use_gnet):
        denoise = make_denoiser(params, cfg, src=src, geometry=geometry,
                                conditioning_image=conditioning_image, rng=rng)
        gden = None
        if use_gnet and gcfg is not None:
            g_src = None if gcfg.uncond else src
            g_geo = None if gcfg.uncond else geometry
            gden = make_denoiser(gparams, gcfg, src=g_src, geometry=g_geo,
                                 conditioning_image=None, rng=rng)
        return edm_sampler(denoise, noise, gnet_denoise=gden,
                           guidance=guidance, rng=rng, seeds=seeds, **kw)

    @partial(jax.jit, static_argnames=("use_gnet",))
    def sample(params, gparams, src, geometry, noise, guidance, rng,
               conditioning_image=None, use_gnet=True, seeds=None):
        n_data = mesh.shape.get("data", 1) if mesh is not None else 1
        if mesh is None or n_data <= 1 or noise.shape[0] % n_data != 0:
            return sample_impl(params, gparams, src, geometry, noise,
                               guidance, rng, conditioning_image, seeds,
                               use_gnet)
        from jax.sharding import PartitionSpec as P
        rep, dat = P(), P("data")

        def shard_body(params, gparams, src, geometry, noise, guidance, rng,
                       conditioning_image, seeds):
            # Decorrelate the shards' base rng (noisy_sr conditioning noise
            # draws would otherwise repeat identically on every shard). The
            # per-SAMPLE streams (churn noise) come from `seeds`, which is
            # sharded, and stay batch-invariant.
            rng = jax.random.fold_in(rng, jax.lax.axis_index("data"))
            return sample_impl(params, gparams, src, geometry, noise,
                               guidance, rng, conditioning_image, seeds,
                               use_gnet)

        # check_vma=False: the packed Pallas kernels run inside this
        # shard_map and their custom calls don't thread varying-manual-axes
        # metadata through every primitive (JAX's suggested workaround).
        fn = jax.shard_map(
            shard_body, mesh=mesh,
            in_specs=(rep, rep, dat, dat, dat, rep, rep, dat, dat),
            out_specs=dat, check_vma=False)
        return fn(params, gparams, src, geometry, noise, guidance, rng,
                  conditioning_image, seeds)

    return sample


def generate_images_nvs(
    net,                                  # snapshot path or loaded EasyDict
    gnet=None,                            # guidance net (autoguidance reference)
    encoder=None,
    outdir: Optional[str] = None,
    subdirs: bool = False,
    seeds=range(16, 24),
    class_idx=None,                       # accepted for CLI parity; unused
    max_batch_size: int = 32,
    encoder_batch_size=None,
    verbose: bool = True,
    datakwargs: Optional[dict] = None,
    range_selection=None,                 # plumbed to file datasets only
    sr_model=None,
    depth_model=None,
    vanilla_mode: bool = False,
    guidance: float = 1.0,
    rng_seed: int = 0,
    tp: int = 0,                          # tensor-parallel ways (model axis)
    **sampler_kwargs,
):
    # Rank 0 loads first (cache warm), others follow — reference barrier idiom.
    if dist.get_rank() != 0:
        dist.barrier("load-net")
    net = resolve_model(net, name="network")
    gnet = resolve_model(gnet, name="guidance")
    sr_model = resolve_model(sr_model, name="SR")
    if dist.get_rank() == 0:
        dist.barrier("load-net")
    if encoder is None:
        encoder = StandardRGBEncoder()
    from vivid_tpu.geometry.depth import add_depth, resolve_depth_model
    depth_model = resolve_depth_model(depth_model)

    cfg = net.cfg
    params = net.params
    super_res = cfg.img_resolution == 256
    num_sources = 1 if vanilla_mode else cfg.num_sources

    # Seed sharding across processes (generate_images.py:199-200).
    num_batches = max((len(seeds) - 1) // (max_batch_size * dist.get_world_size())
                      + 1, 1) * dist.get_world_size()
    rank_batches = np.array_split(np.arange(len(seeds)), num_batches)[
        dist.get_rank()::dist.get_world_size()]

    datakwargs = dict(datakwargs or {})
    imsize = cfg.img_resolution
    collate_cls = VanillaCollate if vanilla_mode else DualSourceCollate
    sr_size = (sr_model.cfg.img_resolution if sr_model is not None else
               (256 if super_res else None))
    collate = collate_cls(imsize=64 if (super_res or sr_model is not None) else imsize,
                          sr_size=sr_size, seed=rng_seed)
    from vivid_tpu.data.re10k_scenes import open_scene_dataset
    if range_selection is not None:
        datakwargs.setdefault("range_selection", range_selection)
    dataset = open_scene_dataset(
        datakwargs["path"], seed=rng_seed,
        process_index=dist.get_rank(), process_count=dist.get_world_size(),
        **{k: v for k, v in datakwargs.items() if k not in ("path", "class_name")})
    loader = BatchLoader(iter(dataset), collate, batch_size=max_batch_size,
                         prefetch=2, num_threads=2)

    # Shard sampling over this process's devices: data-parallel by default;
    # `tp` ways of tensor parallelism over the 'model' axis when requested
    # (the serving-latency lever once one chip is too slow for a batch —
    # attention heads / conv channels split via act_sharding constraints).
    import contextlib
    from vivid_tpu.core.sharding import act_sharding, make_mesh
    local = jax.local_devices()
    n_dev = len(local)
    act_ctx = contextlib.nullcontext
    n_data = n_dev
    # The mesh spans THIS PROCESS's devices only: seed sharding already
    # splits work across processes (rank_batches), so each process runs an
    # independent local-DP/TP program on its own chips — a global mesh here
    # would place every process's local batches on rank 0's devices.
    if tp and tp > 1:
        assert n_dev % tp == 0, f"tp={tp} does not divide {n_dev} devices"
        n_data = n_dev // tp
        mesh = make_mesh(n_data=n_data, n_model=tp, devices=local)
        act_ctx = lambda: act_sharding(mesh, tp="model")
    elif n_dev > 1:
        mesh = make_mesh(n_data=n_dev, devices=local)
    else:
        mesh = None

    # Pure-DP meshes run the samplers per-shard inside shard_map (see
    # _build_sampler); under tp the act_sharding context + GSPMD partition
    # the whole program instead.
    dp_mesh = mesh if (mesh is not None and not (tp and tp > 1)) else None
    sample_fn = _build_sampler(cfg, gnet.cfg if gnet is not None else None,
                               sampler_kwargs, super_res, mesh=dp_mesh)
    sr_sample_fn = None
    if sr_model is not None:
        # No guidance in the SR stage (generate_images.py:230-232).
        sr_sample_fn = _build_sampler(sr_model.cfg, None, sampler_kwargs, True,
                                      mesh=dp_mesh)

    def maybe_shard(tree):
        if mesh is None:
            return tree
        b_ = jax.tree.leaves(tree)[0].shape[0]
        if b_ % n_data != 0:
            return tree
        # Local-device placement, NOT shard_batch's multi-process global
        # assembly: the batch axis here is per-process by construction.
        from jax.sharding import NamedSharding, PartitionSpec as P
        sh = NamedSharding(mesh, P("data"))
        return jax.tree.map(lambda x: jax.device_put(jnp.asarray(x), sh), tree)

    if verbose:
        dist.print0(f"Generating {len(seeds)} images...")

    class ImageIterable:
        def __len__(self):
            return len(rank_batches)

        def __iter__(self):
            for batch_idx, indices in enumerate(rank_batches):
                r = EasyDict(images=None, src=None, tgt=None, labels=None,
                             noise=None, batch_idx=batch_idx,
                             num_batches=len(rank_batches), indices=indices)
                r.seeds = [seeds[int(i)] for i in indices]
                if len(r.seeds) > 0:
                    raw = next(loader)
                    # Tail batches of a finite dataset are padded with
                    # duplicated rows for static shapes; "valid" marks the
                    # real ones — don't emit duplicates as samples.
                    n_real = int(raw.get("valid",
                                         np.ones(raw["src_image"].shape[0],
                                                 bool)).sum())
                    n = min(len(r.seeds), n_real)
                    r.seeds = r.seeds[:n]
                    key = "src_image" if not super_res else "sr_src_image"
                    src_raw = raw[key][:n]
                    tgt_key = "tgt_image" if not super_res else "sr_tgt_image"
                    geo_key = "geometry" if not super_res else "sr_geometry"
                    tgt_raw = raw[tgt_key][:n]
                    geometry = jnp.asarray(raw[geo_key][:n])
                    src = encoder.encode_latents(src_raw)
                    if depth_model is not None:
                        # Depth inference per source view on the raw pixels
                        # (generate_images.py:293-295 analogue).
                        bs, ns = src.shape[:2]
                        flat = src.reshape((bs * ns,) + src.shape[2:])
                        flat_raw = jnp.asarray(src_raw).reshape(
                            (bs * ns,) + src_raw.shape[2:])
                        flat = add_depth(depth_model, flat_raw, flat,
                                         inv_norm=cfg.depth_input)
                        src = flat.reshape((bs, ns) + flat.shape[1:])

                    noise = seeded_normal(
                        r.seeds, (imsize, imsize, cfg.img_channels))
                    seed_arr = jnp.asarray(r.seeds, jnp.uint32)
                    src, geometry, noise, seed_arr = maybe_shard(
                        (src, geometry, noise, seed_arr))
                    rng = jax.random.fold_in(jax.random.PRNGKey(rng_seed),
                                             batch_idx)
                    cond = None
                    if super_res:
                        from vivid_tpu.diffusion.loss import down_up_resize
                        cond = down_up_resize(encoder.encode_latents(tgt_raw), 4)
                    with act_ctx():  # trace-time: constraints bake into the jit
                        latents = sample_fn(params,
                                            gnet.params if gnet is not None else params,
                                            src, geometry, noise,
                                            jnp.asarray(guidance, jnp.float32), rng,
                                            conditioning_image=cond,
                                            use_gnet=(gnet is not None and guidance != 1),
                                            seeds=seed_arr)
                    r.images = np.asarray(encoder.decode(latents))
                    r.src = src_raw[:, 0] if src_raw.ndim == 5 else src_raw
                    r.tgt = tgt_raw

                    if sr_model is not None:
                        sr_src_raw = raw["sr_src_image"][:n]
                        sr_tgt_raw = raw["sr_tgt_image"][:n]
                        sr_geometry_raw = raw["sr_geometry"][:n]
                        # The collate emits SR conditioning with the BASE
                        # model's source count; the shipped vivid-sr is
                        # single-source (experiments/log.txt:720-792), so a
                        # dual base + vanilla SR cascade must condition the
                        # SR stage on the first source view only — the same
                        # view the vanilla collate itself would pick. The
                        # target label width follows (per-source geometry
                        # concat: 2x20 -> 1x20).
                        sr_ns = sr_model.cfg.num_sources
                        if sr_src_raw.shape[1] != sr_ns:
                            if sr_src_raw.shape[1] < sr_ns:
                                raise ValueError(
                                    f"SR model wants {sr_ns} source views but the "
                                    f"collate provides {sr_src_raw.shape[1]}")
                            sr_src_raw = sr_src_raw[:, :sr_ns]
                            sr_geometry_raw = sr_geometry_raw[:, :sr_ns]
                        sr_geometry = jnp.asarray(sr_geometry_raw)
                        sr_res = sr_model.cfg.img_resolution
                        sr_src = encoder.encode_latents(sr_src_raw)
                        sr_noise = seeded_normal(
                            r.seeds, (sr_res, sr_res, sr_model.cfg.img_channels))
                        low_res = jax.image.resize(
                            latents, latents.shape[:1] + (sr_res, sr_res,
                                                          latents.shape[-1]),
                            method="bilinear")
                        sr_src, sr_geometry, sr_noise, low_res, sr_seeds = \
                            maybe_shard((sr_src, sr_geometry, sr_noise,
                                         low_res,
                                         jnp.asarray(r.seeds, jnp.uint32)))
                        with act_ctx():
                            sr_latents = sr_sample_fn(
                                sr_model.params, sr_model.params, sr_src,
                                sr_geometry, sr_noise,
                                jnp.asarray(1.0, jnp.float32), rng,
                                conditioning_image=low_res, use_gnet=False,
                                seeds=sr_seeds)
                        r.images = np.asarray(encoder.decode(sr_latents))
                        r.src = sr_src_raw[:, 0] if sr_src_raw.ndim == 5 else sr_src_raw
                        r.tgt = sr_tgt_raw

                    if outdir is not None:
                        for seed, _src, _tgt, image in zip(
                                r.seeds,
                                np.clip(r.src, 0, 255).astype(np.uint8),
                                np.clip(r.tgt, 0, 255).astype(np.uint8),
                                r.images):
                            image_dir = (os.path.join(outdir, f"{seed // 1000 * 1000:06d}")
                                         if subdirs else outdir)
                            os.makedirs(image_dir, exist_ok=True)
                            PIL.Image.fromarray(_src, "RGB").save(
                                os.path.join(image_dir, f"src_{seed:06d}.png"))
                            PIL.Image.fromarray(_tgt, "RGB").save(
                                os.path.join(image_dir, f"tgt_{seed:06d}.png"))
                            PIL.Image.fromarray(image, "RGB").save(
                                os.path.join(image_dir, f"sample_{seed:06d}.png"))
                dist.barrier("gen-batch")
                yield r
            loader.close()

    return ImageIterable()
