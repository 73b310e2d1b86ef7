#!/usr/bin/env python3
"""Train entry point. CLI-compatible with the reference's main.py:

    python3 main.py -c configs/zju_mocap/313.yml --exp 313
"""
from dual_space_nerf_tpu.cli.train import main

if __name__ == "__main__":
    main()
