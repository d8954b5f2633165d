"""Isosurface extraction + mesh export from trained fields.

Replaces the reference's marching-cubes pipeline (marching_cubes.cu,
testbed_nerf.cu:3614-3654 / get_density_on_grid :3502-3557): sample the
field on a dense grid (density MLP for NeRF, SDF network for SDF),
extract the isosurface, and color vertices by querying the network.

Round-1 extraction uses marching *tetrahedra* (6 tets/cell): simpler
tables, watertight output, numpy-vectorized; exact MC table parity is a
follow-up. Vertices are deduplicated by edge key so the mesh is
indexed like the reference's output.
"""

from __future__ import annotations

import numpy as np

# 6 tetrahedra decomposition of a cube (corner indices)
_TETS = np.array(
    [
        [0, 5, 1, 6],
        [0, 1, 2, 6],
        [0, 2, 3, 6],
        [0, 3, 7, 6],
        [0, 7, 4, 6],
        [0, 4, 5, 6],
    ]
)
_CORNERS = np.array(
    [[0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0],
     [0, 0, 1], [1, 0, 1], [1, 1, 1], [0, 1, 1]]
)

# tetra case table: for each of the 16 sign cases, list of edges
# (pairs of tet-vertex indices) forming 0, 1, or 2 triangles
_TET_EDGES = [(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3)]


def _tet_triangles(case: int):
    """Triangles (as triples of edge indices) for a tet sign case."""
    inside = [i for i in range(4) if case & (1 << i)]
    if len(inside) == 0 or len(inside) == 4:
        return []
    if len(inside) == 3:
        inside = [i for i in range(4) if i not in inside]
        flip = True
    else:
        flip = False
    if len(inside) == 1:
        v = inside[0]
        edges = [_TET_EDGES.index(tuple(sorted((v, o)))) for o in range(4) if o != v]
        tri = [tuple(edges)]
    else:  # 2 inside
        a, b = inside
        others = [i for i in range(4) if i not in inside]
        c, d = others
        e_ac = _TET_EDGES.index(tuple(sorted((a, c))))
        e_ad = _TET_EDGES.index(tuple(sorted((a, d))))
        e_bc = _TET_EDGES.index(tuple(sorted((b, c))))
        e_bd = _TET_EDGES.index(tuple(sorted((b, d))))
        tri = [(e_ac, e_ad, e_bd), (e_ac, e_bd, e_bc)]
    if flip:
        tri = [(t[0], t[2], t[1]) for t in tri]
    return tri


_CASE_TRIS = [_tet_triangles(c) for c in range(16)]


def marching_tetrahedra(values: np.ndarray, iso: float = 0.0):
    """Extract the isosurface values==iso from a dense (X, Y, Z) grid.

    Returns (vertices (V,3) in grid coords, faces (F,3) int32).
    """
    X, Y, Z = values.shape
    gx, gy, gz = np.meshgrid(
        np.arange(X - 1), np.arange(Y - 1), np.arange(Z - 1), indexing="ij"
    )
    base = np.stack([gx, gy, gz], -1).reshape(-1, 3)  # (C,3)

    corner_vals = np.stack(
        [values[base[:, 0] + dx, base[:, 1] + dy, base[:, 2] + dz]
         for dx, dy, dz in _CORNERS], -1,
    )  # (C, 8)

    # skip cells without sign change
    signs = corner_vals > iso
    active = ~(signs.all(-1) | (~signs).all(-1))
    base = base[active]
    corner_vals = corner_vals[active]
    signs = signs[active]

    verts = []
    faces = []
    edge_cache: dict = {}

    corner_pos = base[:, None, :] + _CORNERS[None, :, :]  # (C,8,3)

    for tet in _TETS:
        tv = corner_vals[:, tet]  # (C,4)
        ts = signs[:, tet]
        case = (ts * (1 << np.arange(4))).sum(-1)  # (C,)
        for c in range(1, 15):
            tris = _CASE_TRIS[c]
            if not tris:
                continue
            sel = np.nonzero(case == c)[0]
            if len(sel) == 0:
                continue
            for tri in tris:
                tri_vidx = np.empty((len(sel), 3), np.int64)
                for k, e in enumerate(tri):
                    a, b = _TET_EDGES[e]
                    ca, cb = tet[a], tet[b]
                    pa = corner_pos[sel, ca]  # (S,3)
                    pb = corner_pos[sel, cb]
                    va = tv[sel, a]
                    vb = tv[sel, b]
                    t = (iso - va) / np.where(np.abs(vb - va) < 1e-12, 1e-12, vb - va)
                    t = np.clip(t, 0.0, 1.0)
                    p = pa + t[:, None] * (pb - pa)
                    # dedup by quantized edge key
                    ga = (pa[:, 0].astype(np.int64) * Y + pa[:, 1]) * Z + pa[:, 2]
                    gb = (pb[:, 0].astype(np.int64) * Y + pb[:, 1]) * Z + pb[:, 2]
                    keys = np.minimum(ga, gb) * (X * Y * Z) + np.maximum(ga, gb)
                    for i, key in enumerate(keys):
                        vi = edge_cache.get(key)
                        if vi is None:
                            vi = len(verts)
                            verts.append(p[i])
                            edge_cache[key] = vi
                        tri_vidx[i, k] = vi
                faces.append(tri_vidx)

    if not verts:
        return np.zeros((0, 3), np.float32), np.zeros((0, 3), np.int32)
    return np.asarray(verts, np.float32), np.concatenate(faces).astype(np.int32)


def compute_mesh_1ring(verts: np.ndarray, faces: np.ndarray):
    """Per-vertex 1-ring centroid (homogeneous accumulate) + area
    normals — the reference's compute_mesh_1ring (marching_cubes.cu)."""
    acc = np.zeros((len(verts), 4), np.float64)
    nrm = np.zeros((len(verts), 3), np.float64)
    tri = verts[faces]  # (F, 3, 3)
    fn = np.cross(tri[:, 1] - tri[:, 0], tri[:, 2] - tri[:, 0])
    for k in range(3):
        np.add.at(acc, faces[:, k],
                  np.concatenate([tri[:, (k + 1) % 3], np.ones((len(faces), 1))], -1))
        np.add.at(nrm, faces[:, k], fn)
    return acc, nrm


def optimise_mesh(
    task,
    verts: np.ndarray,
    faces: np.ndarray,
    n_steps: int = 25,
    thresh: float = 2.5,
    smooth_amount: float = 2048.0,
    density_amount: float = 128.0,
    inflate_amount: float = 1.0,
    lr: float = 1e-4,
):
    """Vertex-position optimization of an extracted NeRF mesh
    (reference Testbed::optimise_mesh_step, testbed_nerf.cu:3400-3456
    + compute_mesh_opt_gradients, marching_cubes.cu:708-740; defaults
    from MeshState, testbed.h:591-597).

    Per step and vertex: gradient = n̂(∇σ)·sign(σ−thresh)·k_density +
    (v − 1-ring centroid)·k_smooth − n̂_vert·k_inflate, stepped with
    Adam. Returns the optimized vertices.
    """
    import jax
    import jax.numpy as jnp

    params = task.opt.inference_params(task.state.opt_state, task.state.params)

    @jax.jit
    def density_and_grad(pts):
        def dens_sum(p):
            out = task.model.density(params, p)[:, 0].astype(jnp.float32)
            return jnp.sum(jnp.exp(jnp.clip(out, -15.0, 15.0))), out

        (_, logits), g = jax.value_and_grad(dens_sum, has_aux=True)(pts)
        return jnp.exp(jnp.clip(logits, -15.0, 15.0)), g

    v = np.asarray(verts, np.float32).copy()
    m = np.zeros_like(v)
    s2 = np.zeros_like(v)
    b1, b2, eps = 0.9, 0.99, 1e-8
    for step in range(1, n_steps + 1):
        dens, grad = density_and_grad(jnp.asarray(v))
        dens, grad = np.asarray(dens), np.asarray(grad)
        n_in = grad / np.maximum(
            np.linalg.norm(grad, axis=-1, keepdims=True), 1e-9)
        acc, nrm = compute_mesh_1ring(v, faces)
        w = np.maximum(acc[:, 3:4], 1.0)
        target = acc[:, :3] / w
        smoothing_grad = v - target
        nrm_u = nrm / np.maximum(np.linalg.norm(nrm, axis=-1, keepdims=True), 1e-9)
        g = (
            n_in * np.sign(dens - thresh)[:, None] * density_amount
            + smoothing_grad * smooth_amount
            - nrm_u * inflate_amount
        ).astype(np.float32)
        m = b1 * m + (1 - b1) * g
        s2 = b2 * s2 + (1 - b2) * g * g
        mh = m / (1 - b1**step)
        vh = s2 / (1 - b2**step)
        v -= lr * mh / (np.sqrt(vh) + eps)
    return v


def extract_mesh(task, res: int = 256, iso: float | None = None, with_colors: bool = True):
    """Field → mesh. For NerfTask, iso defaults to the reference's
    density threshold 2.5 (testbed.h mesh defaults); for SdfTask, 0."""
    import jax.numpy as jnp

    from ..nerf.task import NerfTask

    xs = (np.arange(res) + 0.5) / res
    gx, gy, gz = np.meshgrid(xs, xs, xs, indexing="ij")
    pts = np.stack([gx, gy, gz], -1).reshape(-1, 3).astype(np.float32)

    is_nerf = isinstance(task, NerfTask)
    if is_nerf:
        iso = 2.5 if iso is None else iso
        params = task.opt.inference_params(task.state.opt_state, task.state.params)
        vals = np.empty(len(pts), np.float32)
        chunk = 1 << 18
        for i in range(0, len(pts), chunk):
            d = task.model.density(params, jnp.asarray(pts[i : i + chunk]))
            vals[i : i + chunk] = np.asarray(d[:, 0], np.float32)
        vals = np.exp(np.clip(vals, -15, 15))  # density activation
        field = iso - vals.reshape(res, res, res)  # inside = negative
    else:
        iso = 0.0 if iso is None else iso
        vals = task.sdf(pts)
        field = vals.reshape(res, res, res) - iso

    verts, faces = marching_tetrahedra(field, 0.0)
    verts = (verts + 0.5) / res  # grid coords → [0,1] world

    colors = None
    if with_colors and is_nerf and len(verts):
        view = np.full_like(verts, 0.5)
        out = np.empty((len(verts), 4), np.float32)
        chunk = 1 << 17
        for i in range(0, len(verts), chunk):
            o = task.model(
                params, jnp.asarray(verts[i : i + chunk]), jnp.asarray(view[i : i + chunk])
            )
            out[i : i + chunk] = np.asarray(o, np.float32)
        from ..common import NerfActivation, network_to_rgb

        colors = np.asarray(network_to_rgb(jnp.asarray(out[:, :3]), task.rgb_activation))
    elif with_colors and len(verts):
        colors = np.full((len(verts), 3), 0.7, np.float32)
    return verts, faces, colors
