#!/usr/bin/env python3
"""Formal test entry point (reference test.py surface):

    python3 test.py -c configs/zju_mocap/313.yml --exp 313 --ckpt PATH
"""
from dual_space_nerf_tpu.cli.test import main

if __name__ == "__main__":
    main()
