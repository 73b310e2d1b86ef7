#!/usr/bin/env python3
"""Novel-pose motion-transfer entry point (reference novel_pose_vis.py surface)."""
from dual_space_nerf_tpu.cli.novel_pose_vis import main

if __name__ == "__main__":
    main()
