"""Independent cross-framework parity check.

Builds the reference's SpaceNet/LightingMLP/pose_mlp architecture in torch
(the reference's framework, CPU), copies the flax parameters into it, and
compares against our JAX model:

- essence/density outputs (forward parity),
- d(density)/d(xyz) — the surface-normal path (autograd parity: torch
  double-backward vs our jax.vjp),
- quaternion pose encoding.

This is the strongest available substitute for golden-tensor capture from
the original repo (whose pytorch3d CUDA KNN cannot run here): the model math
is verified end-to-end against an independent torch implementation built
from the reference's layer spec (`model/spacenet.py:18-205`).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from dual_space_nerf_tpu.models import DualSpaceNeRF

# interpret-mode Pallas / torch-reference parity: the heavy tier.
# Fast CI runs 'pytest -m "not slow"'; the full battery runs everything.
pytestmark = pytest.mark.slow

torch.set_default_dtype(torch.float64)


def _torch_spacenet(params):
    """Assemble torch functions using the flax parameter values (f64)."""
    p = params["params"]

    def lin(path):
        node = p
        for key in path.split("/"):
            node = node[key]
        w = torch.tensor(np.asarray(node["kernel"], np.float64))
        b = torch.tensor(np.asarray(node["bias"], np.float64))
        return lambda x: x @ w + b

    emb = torch.tensor(np.asarray(p["nerf"]["embedding"]["embedding"], np.float64))

    # flax auto-names nn.Dense instances Dense_0.. in call order:
    # stage1 (0-3), stage2 (4-6), density (7), essence (8-9) inside
    # SpaceNet's inner Dense wrappers
    def spacenet(x_pe, code, pose_feat):
        h = torch.cat([code, x_pe, pose_feat], dim=1)
        for i in range(4):
            h = torch.relu(lin(f"nerf/Dense_{i}/Dense_0")(h))
        h = torch.cat([h, x_pe], dim=1)
        for i in range(4, 7):
            h = torch.relu(lin(f"nerf/Dense_{i}/Dense_0")(h))
        density = lin("nerf/Dense_7/Dense_0")(h)
        e = torch.relu(h)
        e = torch.relu(lin("nerf/Dense_8/Dense_0")(e))
        essence = lin("nerf/Dense_9/Dense_0")(e)
        return essence, density

    def posenc(x, L=10):
        outs = [x]
        for f in range(L):
            outs.append(torch.sin(x * (2.0**f)))
            outs.append(torch.cos(x * (2.0**f)))
        return torch.cat(outs, dim=1)

    return spacenet, posenc, emb


@pytest.fixture(scope="module")
def model_params():
    model = DualSpaceNeRF()
    params = model.init(
        jax.random.key(7),
        jnp.zeros((4, 3)),
        jnp.zeros((4,), jnp.int32),
        jnp.zeros((4, 16)),
    )
    return model, params


def test_forward_parity(model_params, rng_np):
    model, params = model_params
    spacenet, posenc, emb = _torch_spacenet(params)

    x = rng_np.normal(size=(32, 3)).astype(np.float32) * 0.5
    fi = rng_np.integers(0, 500, 32)
    pf = rng_np.normal(size=(32, 16)).astype(np.float32) * 0.1

    e_jax, d_jax = model.apply(
        params, jnp.asarray(x), jnp.asarray(fi, jnp.int32), jnp.asarray(pf),
        1.0, method="sigma_essence",
    )

    xt = torch.tensor(np.asarray(x, np.float64))
    e_t, d_t = spacenet(posenc(xt), emb[fi], torch.tensor(np.asarray(pf, np.float64)))

    np.testing.assert_allclose(np.asarray(d_jax), d_t.numpy(), atol=2e-4)
    np.testing.assert_allclose(np.asarray(e_jax), e_t.numpy(), atol=2e-4)


def test_density_gradient_parity(model_params, rng_np):
    """Our vjp-based normals vs torch autograd (the reference's
    `gradient(xyz_cano, density)` with grad_outputs=ones)."""
    model, params = model_params
    spacenet, posenc, emb = _torch_spacenet(params)

    x = rng_np.normal(size=(16, 3)).astype(np.float32) * 0.4
    fi = np.zeros(16, np.int64)
    pf = rng_np.normal(size=(16, 16)).astype(np.float32) * 0.1

    def f(xc):
        e, d = model.apply(
            params, xc, jnp.asarray(fi, jnp.int32), jnp.asarray(pf), 1.0,
            method="sigma_essence",
        )
        return e, d

    (e, d), pullback = jax.vjp(f, jnp.asarray(x))
    normal_jax = pullback((jnp.zeros_like(e), jnp.ones_like(d)))[0]

    xt = torch.tensor(np.asarray(x, np.float64), requires_grad=True)
    _, d_t = spacenet(posenc(xt), emb[fi], torch.tensor(np.asarray(pf, np.float64)))
    (grad_t,) = torch.autograd.grad(d_t.sum(), xt)

    np.testing.assert_allclose(
        np.asarray(normal_jax), grad_t.numpy(), rtol=1e-3, atol=3e-3
    )


def test_lighting_parity(model_params, rng_np):
    model, params = model_params
    p = params["params"]["lighting_mlp"]

    def lin(i):
        node = p[f"Dense_{i}"]["Dense_0"]
        w = torch.tensor(np.asarray(node["kernel"], np.float64))
        b = torch.tensor(np.asarray(node["bias"], np.float64))
        return lambda x: x @ w + b

    n = rng_np.normal(size=(24, 3)).astype(np.float32)
    n /= np.linalg.norm(n, axis=1, keepdims=True)
    xw = rng_np.normal(size=(24, 3)).astype(np.float32)
    vd = rng_np.normal(size=(24, 3)).astype(np.float32)
    ess = rng_np.normal(size=(24, 3)).astype(np.float32)

    c_jax = model.apply(
        params, jnp.asarray(n), jnp.asarray(xw), jnp.asarray(vd),
        jnp.asarray(ess), method="lighting",
    )

    vt = torch.tensor(np.asarray(vd, np.float64))
    vt = vt / vt.norm(dim=1, keepdim=True)
    h = torch.cat([torch.tensor(np.asarray(n, np.float64)),
                   torch.tensor(np.asarray(xw, np.float64)), vt], dim=1)
    h = torch.relu(lin(0)(h))
    h = torch.relu(lin(1)(h))
    w = torch.nn.functional.elu(lin(2)(h)) + 1.0
    c_t = w * torch.tensor(np.asarray(ess, np.float64))

    np.testing.assert_allclose(np.asarray(c_jax), c_t.numpy(), atol=2e-4)


def test_compositing_parity(rng_np):
    """raw2outputs transmittance math vs a torch transcription of
    `nerf_net_utils.py:5-56` conventions."""
    from dual_space_nerf_tpu.geometry import composite

    R, S = 8, 16
    rgb = rng_np.normal(size=(R, S, 3)).astype(np.float32)
    sigma = (rng_np.normal(size=(R, S)) * 2).astype(np.float32)
    z = np.sort(rng_np.uniform(1.0, 4.0, (R, S))).astype(np.float32)
    d = rng_np.normal(size=(R, 3)).astype(np.float32)

    out = composite(jnp.asarray(rgb), jnp.asarray(sigma), jnp.asarray(z),
                    jnp.asarray(d))

    zt = torch.tensor(np.asarray(z, np.float64))
    dt = torch.tensor(np.asarray(d, np.float64))
    st = torch.tensor(np.asarray(sigma, np.float64))
    ct = torch.tensor(np.asarray(rgb, np.float64))
    dists = zt[..., 1:] - zt[..., :-1]
    dists = torch.cat([dists, torch.full_like(dists[..., :1], 1e10)], -1)
    dists = dists * dt.norm(dim=-1, keepdim=True)
    alpha = 1.0 - torch.exp(-torch.relu(st) * dists)
    trans = torch.cumprod(
        torch.cat([torch.ones(R, 1), 1.0 - alpha + 1e-10], -1), -1
    )[:, :-1]
    weights = alpha * trans
    rgb_map = (weights[..., None] * ct).sum(-2)

    np.testing.assert_allclose(np.asarray(out.weights), weights.numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(out.rgb), rgb_map.numpy(), atol=1e-5)


def test_coupled_weight_decay_matches_torch_adam():
    """cfg.SOLVER.WEIGHT_DECAY routes through add_decayed_weights BEFORE the
    Adam transform — torch `Adam(weight_decay=wd)` semantics
    (`solver/build.py:11`: wd*param joins the gradient before the adaptive
    moments), which optax.adamw's decoupled decay does NOT reproduce."""
    import numpy as np
    import optax
    import torch
    import jax.numpy as jnp

    rng = np.random.default_rng(3)
    w0 = rng.standard_normal((4, 3)).astype(np.float32)
    grads = [rng.standard_normal((4, 3)).astype(np.float32) for _ in range(4)]
    wd, lr = 0.01, 1e-3

    p = torch.nn.Parameter(torch.tensor(w0))
    opt = torch.optim.Adam([p], lr=lr, betas=(0.9, 0.999), eps=1e-8,
                           weight_decay=wd)
    for g in grads:
        opt.zero_grad()
        p.grad = torch.tensor(g)
        opt.step()

    tx = optax.chain(
        optax.add_decayed_weights(wd), optax.adam(lr, eps=1e-8)
    )
    params = {"w": jnp.asarray(w0)}
    st = tx.init(params)
    for g in grads:
        upd, st = tx.update({"w": jnp.asarray(g)}, st, params)
        params = optax.apply_updates(params, upd)

    np.testing.assert_allclose(
        np.asarray(params["w"]), p.detach().numpy(), atol=2e-6
    )

    # and decoupled adamw genuinely diverges from torch Adam here
    txw = optax.adamw(lr, weight_decay=wd, eps=1e-8)
    pw = {"w": jnp.asarray(w0)}
    stw = txw.init(pw)
    for g in grads:
        upd, stw = txw.update({"w": jnp.asarray(g)}, stw, pw)
        pw = optax.apply_updates(pw, upd)
    assert np.abs(np.asarray(pw["w"]) - p.detach().numpy()).max() > 1e-6
