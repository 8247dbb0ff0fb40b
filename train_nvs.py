#!/usr/bin/env python
"""Repo-root entry point: `python train_nvs.py ...` (reference CLI surface)."""
from vivid_tpu.cli.train_nvs import cmdline

if __name__ == "__main__":
    cmdline()
