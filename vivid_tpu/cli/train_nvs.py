"""Training CLI.

Parity surface: train_nvs.py — same presets (vivid-base / vivid-uncond /
vivid-sr with identical hyperparameters, train_nvs.py:27-31), same flag
names including the Ki/Mi/Gi nimg suffix parser (:161-170), dry-run, run-dir
creation with training_options.json dump. The reference's module-global mode
switches (VANILLA_MODE / PLAIN_MSE) are proper flags here
(--vanilla-mode / --plain-mse).
"""

import json
import os

import click

from vivid_tpu.core import dist, util
from vivid_tpu.core.easydict import EasyDict
from vivid_tpu.core.logger import Logger

config_presets = {
    "vivid-base": EasyDict(duration=500000, batch=1024, channels=128, lr=0.0120,
                           decay=35000, dropout=0.00, P_mean=-0.8, P_std=1.6,
                           extra_attn=1),
    "vivid-uncond": EasyDict(duration=1024 << 19, batch=1024, channels=128,
                             lr=0.0120, decay=35000, dropout=0.00, P_mean=-0.8,
                             P_std=1.6, extra_attn=1, uncond=True),
    # The SHIPPED vivid-sr (experiments/log.txt:791: 57,549,187 params) is
    # vanilla single-source with labels 20/20 and extra_attn=1 — NOT what the
    # reference's live preset builds (train_nvs.py:30 leaves extra_attn unset
    # and num_sources at 2; its CLI in fact crashes on opts.extra_attn before
    # building anything — PARITY.md "SR architecture archaeology"). This
    # preset builds the shipped architecture; pass explicit flags to deviate.
    "vivid-sr": EasyDict(duration=256 << 20, batch=128, channels=64, lr=0.0200,
                         decay=35000, dropout=0.00, P_mean=-0.8, P_std=1.6,
                         noisy_sr=0.25, sr_training=True, extra_attn=1,
                         vanilla_mode=True),
}


def parse_nimg(s):
    """Integer with optional power-of-two suffix: Ki=2^10, Mi=2^20, Gi=2^30."""
    if isinstance(s, int):
        return s
    for suffix, shift in (("Ki", 10), ("Mi", 20), ("Gi", 30)):
        if s.endswith(suffix):
            return int(s[:-2]) << shift
    return int(s)


def _parse_remat(value):
    if isinstance(value, str):
        low = value.lower()
        if low in ("true", "1", "yes"):
            return True
        if low in ("false", "0", "no"):
            return False
        if low == "save_dots":
            return "save_dots"
        raise click.ClickException(f"invalid --remat value {value!r}")
    return bool(value)


def setup_training_config(preset="vivid-base", **opts):
    opts = EasyDict(opts)
    c = EasyDict()
    if preset not in config_presets:
        raise click.ClickException(f'Invalid configuration preset "{preset}"')
    for key, value in config_presets[preset].items():
        if opts.get(key, None) in (None, False):
            opts[key] = value

    c.dataset_kwargs = EasyDict(path=opts.data)
    c.test_dataset_path = opts.get("test_data_path") or None
    c.vanilla_mode = bool(opts.get("vanilla_mode"))
    c.plain_mse = bool(opts.get("plain_mse"))
    num_sources = 1 if c.vanilla_mode else 2

    c.update(total_nimg=opts.duration, batch_size=opts.batch)
    c.network_kwargs = EasyDict(
        model_channels=opts.channels,
        dropout=opts.get("dropout", 0.0),
        extra_attn=opts.get("extra_attn"),
        epipolar_attention_bias=bool(opts.get("epipolar_attn_bias")),
        super_res=bool(opts.get("sr_training")),
        no_time_enc=bool(opts.get("no_time_enc")),
        depth_input=bool(opts.get("depth_input")),
        warp_depth_coor=bool(opts.get("warp_depth_coor")),
        uncond=bool(opts.get("uncond")),
        noisy_sr=opts.get("noisy_sr") or 0.25,
        num_sources=num_sources,
        source_label_dim=20,
        target_label_dim=20 * num_sources,
        use_bf16=bool(opts.get("bf16", True)),
        force_wn=bool(opts.get("force_wn", False)),
        remat=_parse_remat(opts.get("remat", True)),
    )
    c.loss_kwargs = EasyDict(P_mean=opts.P_mean, P_std=opts.P_std)
    c.lr_kwargs = EasyDict(ref_lr=opts.lr, ref_batches=opts.decay)
    c.loss_scaling = opts.get("ls", 1)
    c.batch_gpu = opts.get("batch_gpu") or None
    c.fsdp = bool(opts.get("fsdp"))
    c.sr_training = bool(opts.get("sr_training"))
    c.status_nimg = opts.get("status") or None
    c.samples_nimg = opts.get("samples") or None
    c.metrics_nimg = opts.get("metrics") or None
    c.metrics_list = ([m for m in opts.get("metrics_list", "").split(",") if m]
                      or None)
    c.snapshot_nimg = opts.get("snapshot") or None
    c.checkpoint_nimg = opts.get("checkpoint") or None
    c.seed = opts.get("seed", 0)
    c.debug = opts.get("debug") or None
    c.sr_model = opts.get("sr_model") or None
    c.depth_model = opts.get("depth_model") or None
    c.single_image_mix = opts.get("single_image_mix") or None
    c.single_image_mix_path = opts.get("single_image_path") or None
    c.slice_nimg = opts.get("slice") or None
    c.deterministic = bool(opts.get("deterministic"))
    return c


def print_training_config(run_dir, c):
    dist.print0()
    dist.print0("Training config:")
    dist.print0(json.dumps(c, indent=2))
    dist.print0()
    dist.print0(f"Output directory:        {run_dir}")
    dist.print0(f"Number of processes:     {dist.get_world_size()}")
    dist.print0(f"Number of devices:       {dist.num_devices()}")
    dist.print0(f"Batch size:              {c.batch_size}")
    dist.print0()


def save_code_snapshot(run_dir):
    """Run-provenance snapshot at launch (the reference copies every .py into
    run_dir/code/, train_nvs.py:123-130): records provenance.json (argv, git
    revision + dirty flag, jax version) and a source tarball of the vivid_tpu
    package so any run can be reproduced from its run dir alone."""
    import sys
    import tarfile
    import time as _time

    code_dir = os.path.join(run_dir, "code")
    os.makedirs(code_dir, exist_ok=True)
    import vivid_tpu
    pkg_dir = os.path.dirname(os.path.abspath(vivid_tpu.__file__))
    prov = {"argv": list(sys.argv), "launch_time": _time.time(),
            "python": sys.version.split()[0]}
    try:
        import jax
        prov["jax_version"] = jax.__version__
    except Exception:
        pass
    try:
        import subprocess
        repo = os.path.dirname(pkg_dir)
        rev = subprocess.run(["git", "-C", repo, "rev-parse", "HEAD"],
                             capture_output=True, text=True, timeout=10)
        if rev.returncode == 0:
            prov["git_rev"] = rev.stdout.strip()
            dirty = subprocess.run(["git", "-C", repo, "status", "--porcelain"],
                                   capture_output=True, text=True, timeout=10)
            prov["git_dirty"] = bool(dirty.stdout.strip())
    except Exception:
        pass
    with open(os.path.join(code_dir, "provenance.json"), "wt") as f:
        json.dump(prov, f, indent=2)

    def _keep(info):
        name = os.path.basename(info.name)
        if "__pycache__" in info.name or name.endswith((".pyc", ".so")):
            return None
        return info

    with tarfile.open(os.path.join(code_dir, "source.tar.gz"), "w:gz") as tar:
        tar.add(pkg_dir, arcname="vivid_tpu", filter=_keep)
        for entry in ("train_nvs.py", "generate_images.py",
                      "calculate_metrics.py", "bench.py"):
            p = os.path.join(os.path.dirname(pkg_dir), entry)
            if os.path.isfile(p):
                tar.add(p, arcname=entry)


def launch_training(run_dir, c):
    if dist.get_rank() == 0 and not os.path.isdir(run_dir):
        dist.print0("Creating output directory...")
        os.makedirs(run_dir)
    if dist.get_rank() == 0:
        with open(os.path.join(run_dir, "training_options.json"), "wt") as f:
            json.dump(c, f, indent=2)
        save_code_snapshot(run_dir)
    dist.barrier("launch")
    Logger(file_name=os.path.join(run_dir, "log.txt"), file_mode="a",
           should_flush=True)
    from vivid_tpu.train.loop import training_loop
    return training_loop(run_dir=run_dir, **c)


@click.command()
# Main options.
@click.option("--outdir", help="Where to save the results", metavar="DIR", type=str, default="output_nonvanilla/")
@click.option("--data", help="Path to scene dataset (.npz dir)", metavar="DIR", type=str, required=True)
@click.option("--preset", help="Configuration preset", metavar="STR", type=str, default="vivid-base", show_default=True)
@click.option("--sr-training", help="Toggles training of SR model", is_flag=True)
# Hyperparameters.
@click.option("--duration", help="Training duration", metavar="NIMG", type=parse_nimg, default=None)
@click.option("--batch", help="Total batch size", metavar="NIMG", type=parse_nimg, default=None)
@click.option("--channels", help="Channel multiplier", metavar="INT", type=click.IntRange(min=16), default=None)
@click.option("--dropout", help="Dropout probability", metavar="FLOAT", type=click.FloatRange(min=0, max=1), default=None)
@click.option("--P_mean", "P_mean", help="Noise level mean", metavar="FLOAT", type=float, default=None)
@click.option("--P_std", "P_std", help="Noise level standard deviation", metavar="FLOAT", type=click.FloatRange(min=0, min_open=True), default=None)
@click.option("--lr", help="Learning rate max. (alpha_ref)", metavar="FLOAT", type=click.FloatRange(min=0, min_open=True), default=None)
@click.option("--decay", help="Learning rate decay (t_ref)", metavar="BATCHES", type=click.FloatRange(min=0), default=None)
@click.option("--extra-attn", help="Force attention on block k per level", metavar="INT", type=int, default=None)
# NVS params.
@click.option("--epipolar-attn-bias", help="Use epipolar attn bias", is_flag=True)
@click.option("--no-time-enc", help="Nullify time input in Encoder model", is_flag=True)
@click.option("--depth-model", help="Depth model type", metavar="small|base|large", type=str, default=None)
@click.option("--depth-input", help="Adds depth in input", is_flag=True)
@click.option("--warp-depth-coor", help="Add coordinates and warped coordinates as input", is_flag=True)
@click.option("--single-image-mix", help="Use single image augmentations, percent of batch", type=float, default=None)
@click.option("--single-image-path", help="Directory of single images for the mix", metavar="DIR", type=str, default=None)
@click.option("--uncond", help="Regular (unconditional) diffusion", is_flag=True)
@click.option("--noisy-sr", help="Adds noise to low-res image", type=float, default=None)
@click.option("--sr-model", help="Path to SR model to use for evaluation", metavar="STR", type=str, required=False)
@click.option("--test-data-path", help="Path to the test dataset", metavar="DIR", type=str, default=None)
@click.option("--vanilla-mode", help="Single-source conditioning (VANILLA_MODE)", is_flag=True)
@click.option("--plain-mse", help="Plain MSE loss instead of learned variance (PLAIN_MSE)", is_flag=True)
# Performance-related options.
@click.option("--batch-gpu", help="Limit batch size per device (gradient accumulation)", metavar="NIMG", type=parse_nimg, default=None)
@click.option("--fsdp", help="Shard params/optimizer/EMA state over the data axis (ZeRO-3)", is_flag=True)
@click.option("--deterministic", help="Bit-reproducible data pipeline: single-threaded batch assembly; kill+resume replays the exact sample stream", is_flag=True)
@click.option("--bf16", help="Enable bfloat16 compute", metavar="BOOL", type=bool, default=True, show_default=True)
@click.option("--force-wn", help="Forced weight normalization (EDM2 Eq. 66)", metavar="BOOL", type=bool, default=False, show_default=True)
@click.option("--remat", help="Rematerialize heavy blocks in backward: true, false, or save_dots (keep conv/attn outputs, recompute elementwise)", metavar="BOOL|save_dots", type=str, default="true", show_default=True)
@click.option("--ls", help="Loss scaling", metavar="FLOAT", type=click.FloatRange(min=0, min_open=True), default=1, show_default=True)
# I/O-related options.
@click.option("--status", help="Interval of status prints", metavar="NIMG", type=parse_nimg, default="960", show_default=True)
@click.option("--samples", help="Interval of sample generation", metavar="NIMG", type=parse_nimg, default="9600", show_default=True)
@click.option("--metrics", help="Interval of metrics prints", metavar="NIMG", type=parse_nimg, default=None)
@click.option("--metrics-list", help="Comma-separated metrics for in-training evals (default: fid,fd_dinov2,joint_fid,joint_fd_dinov2,psnr)", metavar="LIST", type=str, default="")
@click.option("--snapshot", help="Interval of network snapshots", metavar="NIMG", type=parse_nimg, default="10000", show_default=True)
@click.option("--checkpoint", help="Interval of training checkpoints", metavar="NIMG", type=parse_nimg, default="10000", show_default=True)
@click.option("--slice", help="Train in slices of this many nimg", metavar="NIMG", type=parse_nimg, default=None)
@click.option("--seed", help="Random seed", metavar="INT", type=int, default=0, show_default=True)
@click.option("--debug-nans", help="Enable jax NaN debugging (slow)", is_flag=True)
@click.option("--dry-run", help="Print training options and exit", is_flag=True)
def cmdline(outdir, dry_run, debug_nans, **opts):
    util.enable_persistent_compilation_cache()
    if debug_nans:
        import jax
        jax.config.update("jax_debug_nans", True)
    _cmdline_inner(outdir, dry_run, **opts)


def _cmdline_inner(outdir, dry_run, **opts):
    """Train a VIVID NVS diffusion model on TPU.

    Examples:

    \b
    python train_nvs.py --preset=vivid-base --data=/path/to/scenes --outdir=runs/
    """
    dist.init()
    dist.print0("Setting up training config...")
    c = setup_training_config(**opts)
    run_dir = os.path.join(outdir, "experiments")
    print_training_config(run_dir=run_dir, c=c)
    if dry_run:
        dist.print0("Dry run; exiting.")
    else:
        launch_training(run_dir=run_dir, c=c)


if __name__ == "__main__":
    cmdline()
