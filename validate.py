#!/usr/bin/env python3
"""Validation entry point (reference validate.py surface)."""
from dual_space_nerf_tpu.cli.validate import main

if __name__ == "__main__":
    main()
