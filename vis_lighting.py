#!/usr/bin/env python3
"""Relighting sweep entry point (reference vis_lighting.py surface)."""
from dual_space_nerf_tpu.cli.vis_lighting import main

if __name__ == "__main__":
    main()
