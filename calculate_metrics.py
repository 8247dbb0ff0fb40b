#!/usr/bin/env python
"""Repo-root entry point: `python calculate_metrics.py ...` (reference CLI surface)."""
from vivid_tpu.cli.calculate_metrics import cmdline
from vivid_tpu.metrics.api import get_metrics  # re-export (reference API)

if __name__ == "__main__":
    cmdline()
