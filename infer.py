#!/usr/bin/env python
"""Root-level CLI shim — the reference's public entry point
(`python infer.py ...`); the implementation lives in
mono_depth_estimation_tpu/cli/infer.py."""
from mono_depth_estimation_tpu.cli.infer import main

if __name__ == "__main__":
    main()
