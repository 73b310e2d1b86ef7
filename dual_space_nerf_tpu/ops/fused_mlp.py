"""Fused SpaceNet MLP as Pallas TPU kernels, with a hand-derived backward.

Why: the density/essence MLP chain (reference `model/spacenet.py:18-148`,
here `models/spacenet.py::SpaceNet`) is 8 256-wide matmuls per point, plus a
full reverse pass for the autodiff surface normal, plus the training
backward *through* that reverse pass (second order). Under XLA each matmul
is its own kernel and every (N, 256) activation round-trips HBM — measured
~13 ms of a 39 ms train step on v5e against ~4.6 ms of MXU ideal. These
kernels keep the whole chain (weights ~2 MB + one block of activations) in
VMEM: per point only the 128-lane input, the small outputs, and the
cotangents cross HBM.

Exactness: ReLU has zero second derivative almost everywhere, so with fixed
activation masks the normal `n = d(sigma)/d(pos)` is a product of masked
weight matrices and its parameter-gradient is an exact, closed-form second
matmul chain (derived below). The backward here matches `jax.grad` through
`jax.vjp` bit-for-bit in structure (masks from the same `z > 0` predicate,
mask derivatives dropped exactly like JAX drops `relu''`).

Layer naming (flax param scope -> math):
  K1 = nerf/Dense_0 (87, 256)    stage1 in     z1 = x  @ K1 + b1, h = relu
  K2..K4 = Dense_1..3 (256, 256)
  K5 = Dense_4 (319, 256)        skip: s = [h4, pe]
  K6, K7 = Dense_5..6 (256, 256)
  K8 = Dense_7 (256, 1)          sigma = h7 @ K8 + b8        (no activation)
  K9 = Dense_8 (256, 128)        e1 = relu(h7 @ K9 + b9)     (relu(h7) == h7)
  K10 = Dense_9 (128, 3)         essence = e1 @ K10 + b10

Input layout inside the kernel (reordered from the model's [code, pe, pose]
so every slice lands on a 128-lane boundary):
  x = [pe(63) | code(8) | pose(16) | zeros(41)]  -> (N, 128)
K1's rows are permuted to match; K5 is split as K5a (256, 256, the h4 rows)
and K5b (128, 256, the pe rows zero-padded to x's lane layout), so the skip
is the two-matmul sum h4 @ K5a + x @ K5b — no in-kernel concatenation, and
the non-pe lanes of x hit zero rows of K5b and contribute nothing.

The gradient of sigma w.r.t. the positional encoding (GPE, 63 values/point)
is an explicit kernel *output*: the J_pe application (normal assembly from
sin/cos partner values) and its cotangent are cheap elementwise XLA that
fuses for free, keeping all sub-lane-width indexing out of Mosaic.

Second-order derivation (flax (in, out) kernels, row-vector points). The
forward normal reverse pass ("g-recursion"):
  g7 = K8[:, 0] (constant row)         u7 = m7 * g7
  g_{l-1} = u_l @ K_l^T                u_l = m_l * g_l        l = 7..1
  g4 = u5 @ K5a^T;   gpe = (u1 @ K1^T)[:63] + u5 @ K5b^T  (skip split)
Given the cotangent gbar of gpe, the vjp of this chain w.r.t. the weights
runs the recursion *upward* (mask cotangents are zero a.e.):
  gX0bar = gbar;  ubar_l = gbar_{l-1} @ K_l;  Kbar_l += gbar_{l-1}^T @ u_l
  gbar_l = m_l * ubar_l;   ...;   Kbar8[:, 0] += sum_p gbar_7
which is what the backward kernel implements, fused with the standard
first-order backprop for the sigma/essence cotangents.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_IN = 128          # padded input lanes: pe 63 | code 8 | pose 16 | zeros
_W = 256           # backbone width
_PE = 63
_CP = 24            # code (8) + pose feature (16)
_NF = 10           # posenc frequencies
F32 = jnp.float32


def _cast(a, b, fast):
    """fast=True: one-pass bf16 MXU feed (XLA's DEFAULT precision for f32
    Dense matmuls). fast=False: leave f32 — Mosaic lowers f32 dots through
    the multi-pass exact decomposition, which is what the parity tests pin
    but costs ~3x MXU time."""
    if fast:
        return a.astype(jnp.bfloat16), b.astype(jnp.bfloat16)
    return a, b


def _dot(a, b, fast=False):
    """a @ b."""
    a, b = _cast(a, b, fast)
    return jax.lax.dot_general(
        a, b, (((1,), (0,)), ((), ())), preferred_element_type=F32
    )


def _dot_t(a, b, fast=False):
    """a @ b.T (contract b's out dim) — transposed MXU feed, no reshape."""
    a, b = _cast(a, b, fast)
    return jax.lax.dot_general(
        a, b, (((1,), (1,)), ((), ())), preferred_element_type=F32
    )


def _dot_g(a, b, fast=False):
    """a.T @ b (contract the point dim) — the weight-gradient product."""
    a, b = _cast(a, b, fast)
    return jax.lax.dot_general(
        a, b, (((0,), (0,)), ((), ())), preferred_element_type=F32
    )


# ---------------------------------------------------------------------------
# Weight packing
# ---------------------------------------------------------------------------
def extract_nerf_weights(nerf_params) -> tuple:
    """params['nerf'] flax subtree -> (K1..K10, b1..b10) raw arrays."""
    ks, bs = [], []
    for i in range(10):
        leaf = nerf_params[f"Dense_{i}"]["Dense_0"]
        ks.append(leaf["kernel"])
        bs.append(leaf["bias"])
    return tuple(ks) + tuple(bs)


def _pack(weights, with_color: bool):
    """Pad/permute raw weights into kernel layout (all f32)."""
    ks, bs = weights[:10], weights[10:]
    k1 = ks[0].astype(F32)  # (87, 256), rows [code 8 | pe 63 | pose 16]
    k1p = jnp.zeros((_IN, _W), F32)
    k1p = k1p.at[:_PE].set(k1[8 : 8 + _PE])
    k1p = k1p.at[_PE : _PE + 8].set(k1[:8])
    k1p = k1p.at[_PE + 8 : _PE + 24].set(k1[8 + _PE :])
    k5 = ks[4].astype(F32)                                 # (319, 256)
    k5b = jnp.zeros((_IN, _W), F32).at[:_PE].set(k5[_W:])  # pe rows -> x lanes
    k8p = jnp.zeros((_W, 128), F32).at[:, :1].set(ks[7].astype(F32))
    packed = {
        "k1": k1p,
        "k2": ks[1].astype(F32),
        "k3": ks[2].astype(F32),
        "k4": ks[3].astype(F32),
        "k5a": k5[:_W],
        "k5b": k5b,
        "k6": ks[5].astype(F32),
        "k7": ks[6].astype(F32),
        "k8": k8p,
        "k8row": ks[7].astype(F32).T,                      # (1, 256)
        "b1": bs[0].astype(F32)[None],
        "b2": bs[1].astype(F32)[None],
        "b3": bs[2].astype(F32)[None],
        "b4": bs[3].astype(F32)[None],
        "b5": bs[4].astype(F32)[None],
        "b6": bs[5].astype(F32)[None],
        "b7": bs[6].astype(F32)[None],
        "b8": jnp.zeros((1, 128), F32).at[0, :1].set(bs[7].astype(F32)),
    }
    if with_color:
        packed["k9"] = ks[8].astype(F32)                    # (256, 128)
        packed["k10"] = jnp.zeros((128, 128), F32).at[:, :3].set(
            ks[9].astype(F32)
        )
        packed["b9"] = bs[8].astype(F32)[None]
        packed["b10"] = jnp.zeros((1, 128), F32).at[0, :3].set(
            bs[9].astype(F32)
        )
    return packed


def _unpack_grads(g, with_color: bool):
    """Kernel-layout weight grads -> raw-layout (K1..K10, b1..b10) tuple."""
    k1 = jnp.zeros((87, _W), F32)
    k1 = k1.at[:8].set(g["k1"][_PE : _PE + 8])
    k1 = k1.at[8 : 8 + _PE].set(g["k1"][:_PE])
    k1 = k1.at[8 + _PE :].set(g["k1"][_PE + 8 : _PE + 24])
    k5 = jnp.concatenate([g["k5a"], g["k5b"][:_PE]], axis=0)  # (319, 256)
    ks = [
        k1, g["k2"], g["k3"], g["k4"], k5, g["k6"], g["k7"],
        g["k8row"].T[:, :1] if "k8row" in g else g["k8"],
    ]
    bs = [g[f"b{i}"][0, :_W if i < 8 else 128] for i in range(1, 8)]
    bs.append(g["b8"][0, :1])
    if with_color:
        ks += [g["k9"], g["k10"][:, :3]]
        bs += [g["b9"][0], g["b10"][0, :3]]
    else:
        ks += [jnp.zeros((256, 128), F32), jnp.zeros((128, 3), F32)]
        bs += [jnp.zeros((128,), F32), jnp.zeros((3,), F32)]
    return tuple(ks) + tuple(bs)


def _build_x(pe, cp, n_pad):
    """[pe | code‖pose | 0] -> (n_pad, 128) f32."""
    n = pe.shape[0]
    # K1's packed rows are permuted for exactly the [code(8) | pose(16)]
    # layout; any other cp width would silently misalign lanes against them
    assert pe.shape[1] == _PE and cp.shape[1] == _CP, (
        f"fused kernels are specialized to pe={_PE}, cp={_CP}; "
        f"got pe={pe.shape[1]}, cp={cp.shape[1]}"
    )
    x = jnp.concatenate(
        [
            pe.astype(F32),
            cp.astype(F32),
            jnp.zeros((n, _IN - _PE - cp.shape[1]), F32),
        ],
        axis=1,
    )
    if n_pad > n:
        x = jnp.pad(x, ((0, n_pad - n), (0, 0)))
    return x


# ---------------------------------------------------------------------------
# posenc Jacobian partners (XLA side)
# ---------------------------------------------------------------------------
def _dp_table(pe):
    """Derivative-partner values DP: d(pe_j)/d(pos_d(j)) for each slot.

    identity slots -> 1; sin(f_k x_d) -> f_k * cos(f_k x_d);
    cos(f_k x_d) -> -f_k * sin(f_k x_d). All read off pe itself
    (`ops/posenc.py` layout: [x(3), sin f0(3), cos f0(3), sin f1(3), ...]).
    """
    n = pe.shape[0]
    sc = pe[:, 3:].reshape(n, _NF, 2, 3)
    freqs = 2.0 ** jnp.arange(_NF, dtype=pe.dtype)
    coef = jnp.stack([freqs, -freqs], axis=-1)              # (L, 2)
    swapped = sc[:, :, ::-1, :] * coef[None, :, :, None]
    return jnp.concatenate(
        [jnp.ones((n, 3), pe.dtype), swapped.reshape(n, 2 * _NF * 3)], axis=1
    )


def _normal_from_gpe(gpe, dp):
    """n_d = sum_{j: coord(j)=d} gpe_j * DP_j  (the J_pe^T application)."""
    prod = gpe * dp
    return prod.reshape(gpe.shape[0], -1, 3).sum(axis=1)


def _gbar_from_nbar(nbar, dp):
    """gpe cotangent: J_pe @ nbar, elementwise via DP."""
    return dp * jnp.tile(nbar, (1, 1 + 2 * _NF))


def _pe_extra_from_nbar(gpe, nbar, dp):
    """pe cotangent of the J application itself (DP depends on pe)."""
    dpbar = gpe * jnp.tile(nbar, (1, 1 + 2 * _NF))          # (N, 63)
    n = gpe.shape[0]
    sc = dpbar[:, 3:].reshape(n, _NF, 2, 3)
    freqs = 2.0 ** jnp.arange(_NF, dtype=gpe.dtype)
    coef = jnp.stack([freqs, -freqs], axis=-1)
    back = (sc * coef[None, :, :, None])[:, :, ::-1, :]
    return jnp.concatenate(
        [jnp.zeros((n, 3), gpe.dtype), back.reshape(n, 2 * _NF * 3)], axis=1
    )


# ---------------------------------------------------------------------------
# Kernels
# ---------------------------------------------------------------------------
def _fwd_body(x, w, with_color, need_sigma=True, fast=False):
    """Shared forward chain. Returns (sigma_col, essence128, gpe128, hs).

    need_sigma=False (the backward's hs-only recompute) skips the density
    head entirely — the (P,256)x(256,128) k8 matmul would be dead compute
    there, and skipping it lets the backward drop k8 from its operands."""
    hs = []
    h = x
    for i, (k, b) in enumerate(
        [(w["k1"], w["b1"]), (w["k2"], w["b2"]), (w["k3"], w["b3"]),
         (w["k4"], w["b4"])]
    ):
        h = jnp.maximum(_dot(h, k, fast) + b, 0.0)
        hs.append(h)
    # skip layer as a two-matmul sum (no in-kernel concatenation)
    h = jnp.maximum(
        _dot(h, w["k5a"], fast) + _dot(x, w["k5b"], fast) + w["b5"], 0.0
    )
    hs.append(h)
    for k, b in [(w["k6"], w["b6"]), (w["k7"], w["b7"])]:
        h = jnp.maximum(_dot(h, k, fast) + b, 0.0)
        hs.append(h)
    sigma = (
        _dot(h, w["k8"], fast) + w["b8"] if need_sigma else None
    )                                                       # (P, 128), lane 0
    if not with_color:
        return sigma, None, None, hs
    e1 = jnp.maximum(_dot(h, w["k9"], fast) + w["b9"], 0.0)  # (P, 128)
    essence = _dot(e1, w["k10"], fast) + w["b10"]           # lanes 0..2
    # g-recursion: gpe = d(sigma)/d(pe lanes)
    u = (hs[6] > 0.0) * w["k8row"]                          # u7
    for k, hprev in [(w["k7"], hs[5]), (w["k6"], hs[4])]:
        u = (hprev > 0.0) * _dot_t(u, k, fast)              # u6, u5
    u5 = u
    u = (hs[3] > 0.0) * _dot_t(u5, w["k5a"], fast)          # u4
    for k, hprev in [(w["k4"], hs[2]), (w["k3"], hs[1]), (w["k2"], hs[0])]:
        u = (hprev > 0.0) * _dot_t(u, k, fast)
    gpe = _dot_t(u, w["k1"], fast) + _dot_t(u5, w["k5b"], fast)  # (P, 128)
    return sigma, essence, gpe, hs


def _fwd_kernel(*refs, with_color: bool, wnames: tuple, fast: bool):
    if with_color:
        x_ref = refs[0]
        w = dict(zip(wnames, refs[1 : 1 + len(wnames)]))
        sigma_ref, ess_ref, gpe_ref = refs[1 + len(wnames) :]
    else:
        x_ref = refs[0]
        w = dict(zip(wnames, refs[1 : 1 + len(wnames)]))
        (sigma_ref,) = refs[1 + len(wnames) :]
    wv = {k: r[...] for k, r in w.items()}
    sigma, essence, gpe, _ = _fwd_body(x_ref[...], wv, with_color, fast=fast)
    sigma_ref[...] = sigma[:, :1]
    if with_color:
        ess_ref[...] = essence[:, :3]
        gpe_ref[...] = gpe


def _bwd_kernel(*refs, with_color: bool, wnames: tuple, gnames: tuple,
                fast: bool):
    nw = len(wnames)
    if with_color:
        x_ref, sbar_ref, ebar_ref, gbar_ref = refs[:4]
        w = dict(zip(wnames, refs[4 : 4 + nw]))
        out = refs[4 + nw :]
        xbar_ref, gpe_ref = out[:2]
        grefs = dict(zip(gnames, out[2:]))
    else:
        x_ref, sbar_ref = refs[:2]
        w = dict(zip(wnames, refs[2 : 2 + nw]))
        out = refs[2 + nw :]
        xbar_ref = out[0]
        grefs = dict(zip(gnames, out[1:]))

    @pl.when(pl.program_id(0) == 0)
    def _init():
        for r in grefs.values():
            r[...] = jnp.zeros_like(r)

    wv = {k: r[...] for k, r in w.items()}
    x = x_ref[...]
    _, _, _, hs = _fwd_body(x, wv, False, need_sigma=False, fast=fast)
    h1, h2, h3, h4, h5, h6, h7 = hs
    m = [h > 0.0 for h in hs]
    sbar = sbar_ref[...]                                    # (P, 1)

    # ---- first-order backprop (sigma + essence cotangents) ----
    grefs["k8row"][...] += jnp.sum(sbar * h7, axis=0, keepdims=True)
    grefs["b8"][...] += jnp.pad(
        jnp.sum(sbar, axis=0, keepdims=True), ((0, 0), (0, 127))
    )
    dh7 = sbar * wv["k8row"]                                # (P, 256)
    if with_color:
        ebar = ebar_ref[...]                                # (P, 128), 3 live
        z9 = _dot(h7, wv["k9"], fast) + wv["b9"]
        e1 = jnp.maximum(z9, 0.0)
        de1 = _dot_t(ebar, wv["k10"], fast) * (z9 > 0.0)
        grefs["k10"][...] += _dot_g(e1, ebar, fast)
        grefs["b10"][...] += jnp.sum(ebar, axis=0, keepdims=True)
        grefs["k9"][...] += _dot_g(h7, de1, fast)
        grefs["b9"][...] += jnp.sum(de1, axis=0, keepdims=True)
        dh7 = dh7 + m[6] * _dot_t(de1, wv["k9"], fast)      # relu(h7) mask

    dz = m[6] * dh7
    for kname, bname, hprev, mprev in [
        ("k7", "b7", h6, m[5]), ("k6", "b6", h5, m[4]),
    ]:
        grefs[kname][...] += _dot_g(hprev, dz, fast)
        grefs[bname][...] += jnp.sum(dz, axis=0, keepdims=True)
        dz = mprev * _dot_t(dz, wv[kname], fast)
    grefs["k5a"][...] += _dot_g(h4, dz, fast)
    grefs["k5b"][...] += _dot_g(x, dz, fast)
    grefs["b5"][...] += jnp.sum(dz, axis=0, keepdims=True)
    ds_b = _dot_t(dz, wv["k5b"], fast)                      # (P, 128) x part
    dz = m[3] * _dot_t(dz, wv["k5a"], fast)
    for kname, bname, hprev, mprev in [
        ("k4", "b4", h3, m[2]), ("k3", "b3", h2, m[1]), ("k2", "b2", h1, m[0]),
    ]:
        grefs[kname][...] += _dot_g(hprev, dz, fast)
        grefs[bname][...] += jnp.sum(dz, axis=0, keepdims=True)
        dz = mprev * _dot_t(dz, wv[kname], fast)
    grefs["k1"][...] += _dot_g(x, dz, fast)
    grefs["b1"][...] += jnp.sum(dz, axis=0, keepdims=True)
    xbar = _dot_t(dz, wv["k1"], fast) + ds_b                # skip pe lanes

    if not with_color:
        xbar_ref[...] = xbar
        return

    # ---- second order: vjp of the g-recursion w.r.t. the weights ----
    # recompute g/u chain (downward), keeping u_l
    u7 = m[6] * wv["k8row"]
    u6 = m[5] * _dot_t(u7, wv["k7"], fast)
    u5 = m[4] * _dot_t(u6, wv["k6"], fast)
    u4 = m[3] * _dot_t(u5, wv["k5a"], fast)
    u3 = m[2] * _dot_t(u4, wv["k4"], fast)
    u2 = m[1] * _dot_t(u3, wv["k3"], fast)
    u1 = m[0] * _dot_t(u2, wv["k2"], fast)
    gpe_ref[...] = _dot_t(u1, wv["k1"], fast) + _dot_t(u5, wv["k5b"], fast)

    # reverse (upward) sweep driven by the gpe cotangent
    gbar = gbar_ref[...]                                    # (P, 128)
    grefs["k1"][...] += _dot_g(gbar, u1, fast)
    gb = m[0] * _dot(gbar, wv["k1"], fast)                  # gbar_1
    for kname, unext, mnext in [
        ("k2", u2, m[1]), ("k3", u3, m[2]), ("k4", u4, m[3]),
    ]:
        grefs[kname][...] += _dot_g(gb, unext, fast)
        gb = mnext * _dot(gb, wv[kname], fast)
    grefs["k5a"][...] += _dot_g(gb, u5, fast)
    grefs["k5b"][...] += _dot_g(gbar, u5, fast)
    gb = m[4] * (_dot(gb, wv["k5a"], fast) + _dot(gbar, wv["k5b"], fast))
    for kname, unext, mnext in [("k6", u6, m[5]), ("k7", u7, m[6])]:
        grefs[kname][...] += _dot_g(gb, unext, fast)
        gb = mnext * _dot(gb, wv[kname], fast)
    grefs["k8row"][...] += jnp.sum(gb, axis=0, keepdims=True)
    xbar_ref[...] = xbar


# ---------------------------------------------------------------------------
# pallas_call wrappers + custom_vjp
# ---------------------------------------------------------------------------
_WNAMES_D = ("k1", "k2", "k3", "k4", "k5a", "k5b", "k6", "k7", "k8", "k8row",
             "b1", "b2", "b3", "b4", "b5", "b6", "b7", "b8")
_WNAMES_C = _WNAMES_D + ("k9", "k10", "b9", "b10")
# backward never reads k8 (uses k8row); grads accumulate under these names
_GNAMES_D = ("k1", "k2", "k3", "k4", "k5a", "k5b", "k6", "k7", "k8row",
             "b1", "b2", "b3", "b4", "b5", "b6", "b7", "b8")
_GNAMES_C = _GNAMES_D + ("k9", "k10", "b9", "b10")


def _wspecs(names, packed):
    return [
        pl.BlockSpec(packed[n].shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
        for n in names
    ]


def _vmem_params(interpret):
    """Raise Mosaic's scoped-VMEM cap to the physical 128 MiB.

    The default 16 MiB limit is a compiler guardrail, not the hardware size
    (v4/v5e VMEM is 128 MiB); the backward kernel's live set — weights +
    grad accumulators (~4 MiB) plus the recomputed activation chain, masks,
    and u/dz temporaries (~22 MiB at block=512) — measured 26.3 MiB on a
    real v5e, so without this the kernel compiles in interpret mode only.
    """
    if interpret:
        return None
    return pltpu.CompilerParams(vmem_limit_bytes=128 * 1024 * 1024)


def _run_fwd(packed, x, block, interpret, with_color, fast):
    n_pad = x.shape[0]
    wnames = _WNAMES_C if with_color else _WNAMES_D
    pt_spec = lambda width: pl.BlockSpec(
        (block, width), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    if with_color:
        out_shape = (
            jax.ShapeDtypeStruct((n_pad, 1), F32),
            jax.ShapeDtypeStruct((n_pad, 3), F32),
            jax.ShapeDtypeStruct((n_pad, 128), F32),
        )
        out_specs = (pt_spec(1), pt_spec(3), pt_spec(128))
    else:
        out_shape = (jax.ShapeDtypeStruct((n_pad, 1), F32),)
        out_specs = (pt_spec(1),)
    outs = pl.pallas_call(
        functools.partial(
            _fwd_kernel, with_color=with_color, wnames=wnames, fast=fast
        ),
        grid=(n_pad // block,),
        in_specs=[pt_spec(_IN)] + _wspecs(wnames, packed),
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
        compiler_params=_vmem_params(interpret),
    )(x, *[packed[n] for n in wnames])
    return outs


def _run_bwd(packed, x, cotangents, block, interpret, with_color, fast):
    n_pad = x.shape[0]
    # the backward kernel reads k8row, never the packed (256, 128) k8 —
    # dropping it saves a dead VMEM-resident operand block per grid step
    wnames = tuple(
        n for n in (_WNAMES_C if with_color else _WNAMES_D) if n != "k8"
    )
    gnames = _GNAMES_C if with_color else _GNAMES_D
    pt_spec = lambda width: pl.BlockSpec(
        (block, width), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    gshapes = {n: packed[n].shape for n in gnames}
    acc_specs = [
        pl.BlockSpec(gshapes[n], lambda i: (0, 0), memory_space=pltpu.VMEM)
        for n in gnames
    ]
    if with_color:
        out_shape = (
            jax.ShapeDtypeStruct((n_pad, 128), F32),   # xbar
            jax.ShapeDtypeStruct((n_pad, 128), F32),   # gpe
        ) + tuple(jax.ShapeDtypeStruct(gshapes[n], F32) for n in gnames)
        out_specs = (pt_spec(128), pt_spec(128)) + tuple(acc_specs)
        in_specs = (
            [pt_spec(_IN), pt_spec(1), pt_spec(128), pt_spec(128)]
            + _wspecs(wnames, packed)
        )
    else:
        out_shape = (jax.ShapeDtypeStruct((n_pad, 128), F32),) + tuple(
            jax.ShapeDtypeStruct(gshapes[n], F32) for n in gnames
        )
        out_specs = (pt_spec(128),) + tuple(acc_specs)
        in_specs = [pt_spec(_IN), pt_spec(1)] + _wspecs(wnames, packed)
    outs = pl.pallas_call(
        functools.partial(
            _bwd_kernel, with_color=with_color, wnames=wnames, gnames=gnames,
            fast=fast,
        ),
        grid=(n_pad // block,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
        compiler_params=_vmem_params(interpret),
    )(x, *cotangents, *[packed[n] for n in wnames])
    if with_color:
        xbar, gpe = outs[0], outs[1]
        grads = dict(zip(gnames, outs[2:]))
    else:
        xbar, gpe = outs[0], None
        grads = dict(zip(gnames, outs[1:]))
    return xbar, gpe, grads


@functools.lru_cache(maxsize=None)
def _make_fused(block: int, interpret: bool, with_color: bool, fast: bool):
    def fwd_impl(weights, pe, cp):
        n = pe.shape[0]
        n_pad = -(-n // block) * block
        x = _build_x(pe, cp, n_pad)
        packed = _pack(weights, with_color)
        outs = _run_fwd(packed, x, block, interpret, with_color, fast)
        sigma = outs[0][:n, 0]
        if not with_color:
            return (sigma,)
        essence = outs[1][:n]
        dp = _dp_table(pe.astype(F32))
        normal = _normal_from_gpe(outs[2][:n, :_PE], dp)
        return sigma, essence, normal

    @jax.custom_vjp
    def fused(weights, pe, cp):
        return fwd_impl(weights, pe, cp)

    def fused_fwd(weights, pe, cp):
        return fwd_impl(weights, pe, cp), (weights, pe, cp)

    def fused_bwd(res, cots):
        weights, pe, cp = res
        n = pe.shape[0]
        n_pad = -(-n // block) * block
        x = _build_x(pe, cp, n_pad)
        packed = _pack(weights, with_color)

        def padpts(t, width):
            t = t.astype(F32).reshape(n, width)
            return jnp.pad(t, ((0, n_pad - n), (0, 0)))

        if with_color:
            sbar, ebar, nbar = cots
            dp = _dp_table(pe.astype(F32))
            gbar = _gbar_from_nbar(nbar.astype(F32), dp)    # (n, 63)
            cotangents = (
                padpts(sbar, 1),
                jnp.pad(padpts(ebar, 3), ((0, 0), (0, 125))),
                jnp.pad(gbar, ((0, n_pad - n), (0, _IN - _PE))),
            )
        else:
            (sbar,) = cots
            cotangents = (padpts(sbar, 1),)
        xbar, gpe, grads = _run_bwd(
            packed, x, cotangents, block, interpret, with_color, fast
        )
        wgrads = _unpack_grads(grads, with_color)
        wgrads = tuple(
            g.astype(w.dtype) for g, w in zip(wgrads, weights)
        )
        pe_bar = xbar[:n, :_PE]
        if with_color:
            pe_bar = pe_bar + _pe_extra_from_nbar(
                gpe[:n, :_PE], nbar.astype(F32), dp
            )
        cp_bar = xbar[:n, _PE : _PE + 24]
        return (
            wgrads,
            pe_bar.astype(pe.dtype),
            cp_bar.astype(cp.dtype),
        )

    fused.defvjp(fused_fwd, fused_bwd)
    return fused


def fused_sigma_essence_normal(
    weights, pe, cp, *, block: int = 512, interpret: bool = False,
    fast: bool = False,
):
    """sigma (N,), essence (N, 3), normal_local (N, 3) = d(sigma)/d(pos).

    weights: `extract_nerf_weights(params['nerf'])`; pe: (N, 63) posenc of
    the canonical points; cp: (N, 24) = [frame code * code_scale (8) ‖
    pose_feat (16)]. Differentiable in weights, pe, and cp (exactly matching
    `jax.grad` through the `jax.vjp`-normal formulation, incl. the
    second-order normal terms).
    """
    return _make_fused(block, bool(interpret), True, bool(fast))(
        weights, pe, cp
    )


def fused_sigma(weights, pe, cp, *, block: int = 512,
                interpret: bool = False, fast: bool = False):
    """Density-only fused forward: sigma (N,). Same contract as above."""
    return _make_fused(block, bool(interpret), False, bool(fast))(
        weights, pe, cp
    )[0]
