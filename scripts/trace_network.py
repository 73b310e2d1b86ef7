#!/usr/bin/env python3
"""Capture a jax.profiler trace of the network fwd+bwd and print the top ops
by device self-time (parsed from the perfetto trace JSON — no TensorBoard)."""

from __future__ import annotations

import glob
import gzip
import json
import os
import sys
from collections import defaultdict

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

if __name__ == "__main__":
    import jax

    jax.config.update("jax_compilation_cache_dir", ".jax_cache_tpu")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    import jax.numpy as jnp

    from dual_space_nerf_tpu.models import DualSpaceNeRF
    from dual_space_nerf_tpu.renderer.pipeline import _point_network

    n = 5500 * 64
    rng = np.random.default_rng(0)
    pts = jnp.asarray(rng.standard_normal((n, 3)).astype(np.float32))
    tris = jnp.asarray(
        rng.standard_normal((n, 3, 3)).astype(np.float32) * 0.01
    )
    model = DualSpaceNeRF()
    params = model.init(
        jax.random.key(0), jnp.zeros((4, 3)), jnp.zeros((4,), jnp.int32),
        jnp.zeros((4, 16)),
    )
    pose_feat = jnp.zeros((n, 16), jnp.float32)
    frame_flat = jnp.zeros((n,), jnp.int32)

    def net_loss(params, pc):
        color, sigma = _point_network(
            params, model, pts, pc, pts, frame_flat, pose_feat,
            jnp.float32(1.0), tris + pc[:, None, :], tris + pc[:, None, :],
        )
        return jnp.mean(color**2) + jnp.mean(sigma**2)

    netgrad = jax.jit(lambda p, pc: jax.grad(net_loss)(p, pc))
    for _ in range(3):
        out = netgrad(params, pts)
    np.asarray(jax.tree.leaves(out)[0])

    trace_dir = "/tmp/nettrace"
    os.system(f"rm -rf {trace_dir}")
    with jax.profiler.trace(trace_dir):
        for _ in range(3):
            out = netgrad(params, pts)
        np.asarray(jax.tree.leaves(out)[0])

    files = glob.glob(f"{trace_dir}/**/*.trace.json.gz", recursive=True)
    assert files, os.popen(f"find {trace_dir} -type f").read()
    with gzip.open(files[0], "rt") as f:
        trace = json.load(f)

    # device-lane complete events only (TPU op track)
    by_name = defaultdict(float)
    pid_names = {}
    for ev in trace["traceEvents"]:
        if ev.get("ph") == "M" and ev.get("name") == "process_name":
            pid_names[ev["pid"]] = ev["args"].get("name", "")
    for ev in trace["traceEvents"]:
        if ev.get("ph") != "X":
            continue
        pname = pid_names.get(ev.get("pid"), "")
        if "TPU" not in pname and "/device" not in pname.lower():
            continue
        by_name[ev["name"]] += ev.get("dur", 0.0)

    total = sum(by_name.values())
    print(f"total device op time: {total / 1e3 / 3:.2f} ms/iter over 3 iters")
    for name, dur in sorted(by_name.items(), key=lambda kv: -kv[1])[:30]:
        print(f"{dur / 1e3 / 3:9.3f} ms  {name[:110]}")
