#!/usr/bin/env python
"""Repo-root entry point: `python generate_images.py ...` (reference CLI surface)."""
from vivid_tpu.cli.generate_images import cmdline
from vivid_tpu.diffusion.sampler import edm_sampler  # re-export (reference API)
from vivid_tpu.generate import generate_images_nvs  # re-export (reference API)

if __name__ == "__main__":
    cmdline()
