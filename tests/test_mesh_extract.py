"""Marching-tetrahedra surface extraction tests."""

import numpy as np

from dual_space_nerf_tpu.utils.mesh_extract import marching_tetrahedra, save_obj


def _sphere_grid(r=24, radius=0.6):
    axes = np.linspace(-1, 1, r)
    x, y, z = np.meshgrid(axes, axes, axes, indexing="ij")
    return radius - np.sqrt(x * x + y * y + z * z), axes


def test_sphere_surface_radius():
    grid, axes = _sphere_grid()
    verts, faces = marching_tetrahedra(
        grid, 0.0, origin=np.array([-1.0, -1, -1]),
        spacing=np.full(3, axes[1] - axes[0]),
    )
    assert len(verts) > 100
    assert len(faces) > 100
    radii = np.linalg.norm(verts, axis=-1)
    np.testing.assert_allclose(radii.mean(), 0.6, atol=0.02)
    assert radii.std() < 0.02
    assert faces.max() < len(verts)


def test_empty_grid_gives_empty_mesh():
    grid = np.zeros((8, 8, 8)) - 1.0
    verts, faces = marching_tetrahedra(grid, 0.0)
    assert len(verts) == 0 and len(faces) == 0


def test_watertight_edge_count():
    """A closed surface has each edge shared by exactly 2 triangles."""
    grid, axes = _sphere_grid(r=16)
    verts, faces = marching_tetrahedra(grid, 0.0)
    edges = np.concatenate(
        [faces[:, [0, 1]], faces[:, [1, 2]], faces[:, [2, 0]]]
    )
    edges = np.sort(edges, axis=1)
    _, counts = np.unique(edges, axis=0, return_counts=True)
    assert (counts == 2).mean() > 0.99


def test_save_obj(tmp_path):
    grid, _ = _sphere_grid(r=10)
    verts, faces = marching_tetrahedra(grid, 0.0)
    path = str(tmp_path / "m.obj")
    save_obj(path, verts, faces)
    lines = open(path).read().splitlines()
    assert sum(1 for l in lines if l.startswith("v ")) == len(verts)
    assert sum(1 for l in lines if l.startswith("f ")) == len(faces)


def test_winding_is_outward_consistent():
    """Every emitted face must wind outward (mixed winding renders with
    backface-culling holes); regression for the unoriented case table."""
    n = 20
    g = np.linspace(-1, 1, n)
    X, Y, Z = np.meshgrid(g, g, g, indexing="ij")
    field = 1.0 - np.sqrt(X**2 + Y**2 + Z**2)
    verts, faces = marching_tetrahedra(
        field, 0.4, origin=np.array([-1.0, -1, -1]),
        spacing=np.full(3, 2 / (n - 1)),
    )
    tri = verts[faces]
    nrm = np.cross(tri[:, 1] - tri[:, 0], tri[:, 2] - tri[:, 0])
    dots = (nrm * tri.mean(1)).sum(1)  # sphere: outward aligns with radius
    assert (dots > 0).all()
