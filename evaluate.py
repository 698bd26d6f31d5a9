#!/usr/bin/env python
"""Root-level CLI shim — the reference's public entry point
(`python evaluate.py ...`); the implementation lives in
mono_depth_estimation_tpu/cli/evaluate.py."""
from mono_depth_estimation_tpu.cli.evaluate import main

if __name__ == "__main__":
    main()
