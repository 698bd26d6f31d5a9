#!/usr/bin/env python
"""Root-level CLI shim — the reference's public entry point
(`python train.py ...`); the implementation lives in
mono_depth_estimation_tpu/cli/train.py."""
from mono_depth_estimation_tpu.cli.train import main

if __name__ == "__main__":
    main()
