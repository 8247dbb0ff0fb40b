"""Build randomly-initialized snapshots at the EXACT shipped archs for the
README serving-protocol wall-clock run (reference README.md:81-87,
generate_images.py:375): flagship ch=128 dual-source base + uncond guidance
net + the log-parity 57.5M single-source SR (experiments/log.txt:720-792).

Real trained weights are egress-blocked in this environment; the protocol's
COMPUTE shape — what the wall-clock measures — is arch-exact. Also writes a
256px synthetic scenes dir for conditioning.
"""

import argparse
import os

import jax


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--outdir", default="/tmp/r5_protocol")
    ap.add_argument("--scenes", type=int, default=32)
    args = ap.parse_args()

    from vivid_tpu.core.util import enable_persistent_compilation_cache
    enable_persistent_compilation_cache()
    from vivid_tpu.data.scenes import make_synthetic_dataset
    from vivid_tpu.nn.precond import PrecondConfig, precond_init
    from vivid_tpu.train.snapshots import save_snapshot
    import tools.bench_serve as bench_serve

    os.makedirs(args.outdir, exist_ok=True)
    data = os.path.join(args.outdir, "scenes256")
    if not os.path.isdir(data):
        make_synthetic_dataset(data, num_scenes=args.scenes, num_views=8,
                               imsize=256)
    print("scenes:", data)

    base_cfg = PrecondConfig(img_resolution=64, num_sources=2,
                             model_channels=128, extra_attn=1, use_bf16=True,
                             remat=False, source_label_dim=20,
                             target_label_dim=40)
    gcfg = PrecondConfig(img_resolution=64, num_sources=2, model_channels=128,
                         extra_attn=1, use_bf16=True, remat=False, uncond=True)
    sr_cfg = bench_serve.sr_config("log")

    for name, cfg, seed in (("base", base_cfg, 0), ("gnet", gcfg, 1),
                            ("sr", sr_cfg, 2)):
        path = os.path.join(args.outdir, f"{name}.pkl")
        if os.path.exists(path):
            print("exists:", path)
            continue
        params = precond_init(jax.random.PRNGKey(seed), cfg)
        n = sum(x.size for x in jax.tree.leaves(params))
        save_snapshot(path, params, cfg)
        print(f"wrote {path}: {n/1e6:.2f}M params")


if __name__ == "__main__":
    main()
