#!/usr/bin/env python
"""Root-level CLI shim — the reference's public entry point
(`python test.py ...`); the implementation lives in
mono_depth_estimation_tpu/cli/test.py."""
from mono_depth_estimation_tpu.cli.test import main

if __name__ == "__main__":
    main()
