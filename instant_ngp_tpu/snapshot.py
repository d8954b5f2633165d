"""Snapshot save/load — msgpack format mirroring the reference
(save_snapshot/load_snapshot, testbed.cu:5288-5491).

Layout: the full network config dict plus a ``"snapshot"`` subobject:
  version, mode, training_step, loss, aabb, camera{...},
  params_type ("__half") + params_binary (fp16 blob in tcnn packing
  order [density_net, rgb_net, pos_enc, dir_enc] — nerf_network.h:357-372,
  MLP matrices row-major (n_output, n_input) per layer),
  density_grid_size + density_grid_binary (fp16, Morton-ordered per
  cascade), nerf.{aabb_scale, cam_pos_offset, cam_rot_offset,
  extra_dims_opt, rgb counters, dataset}.

``.ingp`` files are zlib-compressed msgpack; ``.msgpack`` is raw.
"""

from __future__ import annotations

import zlib
from pathlib import Path

import msgpack
import numpy as np

SNAPSHOT_FORMAT_VERSION = 1


def _pad16(v: int) -> int:
    return (v + 15) // 16 * 16


def _pack_params(params: dict, model) -> np.ndarray:
    """Flatten params into the tcnn order [density_net, rgb_net,
    pos_enc, dir_enc] as fp16.

    MLP matrices are stored transposed (out, in) at tcnn's PADDED
    widths — every layer's input and output width rounded up to 16
    (tcnn FullyFusedMLP alignment; the reference's rgb network packs
    its 3-channel output as a 16-row matrix, nerf_network.h:357-372 +
    padded_output_width) — padding rows/cols are zero."""
    blobs = []
    for net_key in ("density_net", "rgb_net", "net"):
        if net_key in params:
            for w in params[net_key]:
                w = np.asarray(w, np.float32)
                fan_in, fan_out = w.shape
                pw = np.zeros((_pad16(fan_out), _pad16(fan_in)), np.float32)
                pw[:fan_out, :fan_in] = w.T
                blobs.append(pw.reshape(-1))
    for enc_key in ("pos_enc", "enc"):
        if enc_key in params:
            tbl = params[enc_key]
            if isinstance(tbl, (list, tuple)):  # per-level hash-grid leaves
                for leaf in tbl:
                    blobs.append(np.asarray(leaf, np.float32).reshape(-1))
            else:
                blobs.append(np.asarray(tbl, np.float32).reshape(-1))
    if "dir_enc" in params and params["dir_enc"] is not None:
        leaves = params["dir_enc"]
        if isinstance(leaves, (list, tuple)):
            for leaf in leaves:
                if leaf is not None:
                    blobs.append(np.asarray(leaf, np.float32).reshape(-1))
        else:
            blobs.append(np.asarray(leaves, np.float32).reshape(-1))
    return np.concatenate(blobs).astype(np.float16) if blobs else np.zeros(0, np.float16)


def _unpack_params(blob: np.ndarray, params_template: dict) -> dict:
    """Inverse of _pack_params into the template's shapes."""
    out = {}
    pos = 0

    def take(shape):
        nonlocal pos
        n = int(np.prod(shape))
        arr = blob[pos : pos + n].astype(np.float32).reshape(shape)
        pos += n
        return arr

    for net_key in ("density_net", "rgb_net", "net"):
        if net_key in params_template:
            ws = []
            for w in params_template[net_key]:
                fan_in, fan_out = w.shape
                wt = take((_pad16(fan_out), _pad16(fan_in)))
                ws.append(wt[:fan_out, :fan_in].T)
            out[net_key] = ws
    for enc_key in ("pos_enc", "enc"):
        if enc_key in params_template:
            tmpl = params_template[enc_key]
            if isinstance(tmpl, (list, tuple)):  # per-level hash-grid leaves
                out[enc_key] = tuple(take(np.shape(t)) for t in tmpl)
            else:
                out[enc_key] = take(np.shape(tmpl))
    if "dir_enc" in params_template and params_template["dir_enc"] is not None:
        tmpl = params_template["dir_enc"]
        if isinstance(tmpl, (list, tuple)):
            out["dir_enc"] = [None if t is None else take(np.shape(t)) for t in tmpl]
        else:
            out["dir_enc"] = take(np.shape(tmpl))
    if pos != blob.size:
        # fail loudly on layout mismatch — a silent under-read would
        # misalign every tensor after the first wrong one (advisor
        # round-1 finding)
        raise ValueError(
            f"snapshot params_binary layout mismatch: consumed {pos} of "
            f"{blob.size} halfs — wrong network config or incompatible "
            f"packing"
        )
    return out


# ---------------------------------------------------------------------------
# json_binding.h schema: Lens + NerfDataset (reference json_binding.h)
# ---------------------------------------------------------------------------


def lens_to_json(mode: str, params) -> dict:
    """Lens → json (reference json_binding.h:37-65 to_json(Lens))."""
    p = np.asarray(params, np.float32).reshape(-1)
    p = np.concatenate([p, np.zeros(max(0, 7 - p.size), np.float32)])
    if mode == "opencv":
        return {"is_fisheye": False, "k1": float(p[0]), "k2": float(p[1]),
                "p1": float(p[2]), "p2": float(p[3])}
    if mode == "opencv_fisheye":
        return {"is_fisheye": True, "k1": float(p[0]), "k2": float(p[1]),
                "k3": float(p[2]), "k4": float(p[3])}
    if mode == "ftheta":
        return {f"ftheta_p{i}": float(p[i]) for i in range(5)} | {
            "w": float(p[5]), "h": float(p[6])}
    if mode == "latlong":
        return {"latlong": True}
    if mode == "equirectangular":
        return {"equirectangular": True}
    if mode == "orthographic":
        return {"orthographic": True}
    return {}


def lens_from_json(j: dict) -> tuple[str, np.ndarray]:
    """json → (mode, params) (reference json_binding.h:67-100)."""
    j = j or {}
    if "k1" in j:
        if j.get("is_fisheye", False):
            return "opencv_fisheye", np.asarray(
                [j["k1"], j["k2"], j.get("k3", 0.0), j.get("k4", 0.0)], np.float32)
        return "opencv", np.asarray(
            [j["k1"], j["k2"], j.get("p1", 0.0), j.get("p2", 0.0)], np.float32)
    if "ftheta_p0" in j:
        return "ftheta", np.asarray(
            [j[f"ftheta_p{i}"] for i in range(5)] + [j["w"], j["h"]], np.float32)
    if j.get("latlong"):
        return "latlong", np.zeros(4, np.float32)
    if j.get("equirectangular"):
        return "equirectangular", np.zeros(4, np.float32)
    if j.get("orthographic"):
        return "orthographic", np.zeros(4, np.float32)
    return "perspective", np.zeros(4, np.float32)


def _mat_cols(m: np.ndarray) -> list:
    """(3, 4) row-major → column list (tcnn vec_json mat4x3 layout:
    an array of 4 column vec3s)."""
    return np.asarray(m, np.float32).T.tolist()


def _mat_from_json(v) -> np.ndarray:
    """Accept a mat4x3 as 4 columns of 3 (tcnn vec_json) or (3, 4)
    rows; return (3, 4) row-major."""
    a = np.asarray(v, np.float32)
    if a.shape == (4, 3):
        return a.T.copy()
    if a.shape == (3, 4):
        return a.copy()
    raise ValueError(f"unrecognized xform shape {a.shape}")


def dataset_to_json(ds) -> dict:
    """NerfDataset → the reference snapshot schema
    (json_binding.h:112-137 to_json(NerfDataset))."""
    n = int(ds.n_images)
    w, h = int(ds.resolution[0]), int(ds.resolution[1])
    lens = lens_to_json(ds.lens_mode, ds.lens_params)
    metadata = []
    xforms = []
    for i in range(n):
        metadata.append({
            "focal_length": np.asarray(ds.focal_lengths[i], np.float32).tolist(),
            "lens": lens,
            "principal_point": np.asarray(
                ds.principal_points[i], np.float32).tolist(),
            "rolling_shutter": np.asarray(
                ds.rolling_shutter[i], np.float32).tolist(),
            "resolution": [w, h],
        })
        xforms.append({
            "start": _mat_cols(ds.xforms_start[i]),
            "end": _mat_cols(ds.xforms_end[i]),
        })
    if ds.render_aabb is not None:
        ra = {"min": np.asarray(ds.render_aabb[0], np.float32).tolist(),
              "max": np.asarray(ds.render_aabb[1], np.float32).tolist()}
    else:
        # no crop ⇒ the reference's EMPTY box (default-constructed
        # BoundingBox, bounding_box.cuh:248-249: min=+inf, max=-inf).
        # Writing the unit cube here was a real bug: from_json read it
        # back as a LIVE crop and scene-free snapshot loads rendered
        # only [0,1]³ of a [-1.5,2.5]³ fox scene.
        inf = float("inf")
        ra = {"min": [inf, inf, inf], "max": [-inf, -inf, -inf]}
    return {
        "n_images": n,
        "paths": [str(p) for p in ds.paths] or [""] * n,
        "metadata": metadata,
        "xforms": xforms,
        "render_aabb": ra,
        "render_aabb_to_local": np.eye(3, dtype=np.float32).tolist(),
        "up": np.asarray(ds.up, np.float32).tolist(),
        "offset": np.asarray(ds.offset, np.float32).tolist(),
        "envmap_resolution": [0, 0],
        "scale": float(ds.scale),
        "aabb_scale": int(ds.aabb_scale),
        "from_mitsuba": bool(ds.from_mitsuba),
        "is_hdr": bool(ds.is_hdr),
        "wants_importance_sampling": True,
        "n_extra_learnable_dims": int(ds.n_extra_learnable_dims),
    }


def dataset_from_json(block: dict):
    """Reference snapshot dataset block → NerfDataset (zero images —
    the reference's create_empty_nerf_dataset + json_binding
    from_json(NerfDataset), json_binding.h:139-188). Handles both the
    per-image `metadata` array and the global-default fields."""
    from .io.nerf_loader import NerfDataset

    n = int(block["n_images"])
    # global defaults (from_json reads these first)
    g_focal = block.get("focal_length")
    g_pp = block.get("principal_point", [0.5, 0.5])
    g_rs = block.get("rolling_shutter", [0, 0, 0, 0])
    g_res = block.get("image_resolution")
    g_lens = block.get("lens", block.get("camera_distortion"))

    focals = np.zeros((n, 2), np.float32)
    pps = np.zeros((n, 2), np.float32)
    rss = np.zeros((n, 4), np.float32)
    res = None
    lens_j = g_lens
    metadata = block.get("metadata")
    for i in range(n):
        mi = metadata[i] if metadata else {}
        focals[i] = np.asarray(mi.get("focal_length", g_focal or [0.0, 0.0]))[:2]
        pps[i] = np.asarray(mi.get("principal_point", g_pp))[:2]
        rss[i] = np.asarray(mi.get("rolling_shutter", g_rs))[:4]
        if res is None:
            res = mi.get("resolution", g_res)
        if lens_j is None:
            lens_j = mi.get("lens", mi.get("camera_distortion"))
    w, h = (int(res[0]), int(res[1])) if res is not None else (0, 0)

    xforms_start = np.zeros((n, 3, 4), np.float32)
    xforms_end = np.zeros((n, 3, 4), np.float32)
    for i, xf in enumerate(block["xforms"]):
        if isinstance(xf, dict):
            xforms_start[i] = _mat_from_json(xf["start"])
            xforms_end[i] = _mat_from_json(xf["end"])
        else:  # bare matrix
            xforms_start[i] = xforms_end[i] = _mat_from_json(xf)

    lens_mode, lens_params = lens_from_json(lens_j or {})
    ra = block.get("render_aabb")
    render_aabb = None
    if isinstance(ra, dict):
        render_aabb = np.asarray([ra["min"], ra["max"]], np.float32)
        if (render_aabb[1] < render_aabb[0]).any():
            # the reference's empty box (is_empty, bounding_box.cuh:212)
            # means "no crop" — m_render_aabb stays the scene aabb
            # (testbed_nerf.cu:2427-2431)
            render_aabb = None
    return NerfDataset(
        images=np.zeros((n, h, w, 4), np.uint8),
        is_hdr=bool(block.get("is_hdr", False)),
        xforms_start=xforms_start,
        xforms_end=xforms_end,
        focal_lengths=focals,
        principal_points=pps,
        rolling_shutter=rss,
        resolution=(w, h),
        aabb_scale=int(block.get("aabb_scale", 1)),
        scale=float(block.get("scale", 0.33)),
        offset=np.asarray(block.get("offset", [0.5, 0.5, 0.5]), np.float32),
        lens_params=lens_params,
        lens_mode=lens_mode,
        n_extra_learnable_dims=int(block.get("n_extra_learnable_dims", 0)),
        from_mitsuba=bool(block.get("from_mitsuba", False)),
        up=np.asarray(block.get("up", [0.0, 0.0, 1.0]), np.float32),
        render_aabb=render_aabb,
        paths=tuple(block.get("paths", ())),
    )


def save_snapshot(
    path,
    network_config: dict,
    params: dict,
    mode: str,
    training_step: int = 0,
    loss: float = 0.0,
    density_grid: np.ndarray | None = None,
    nerf_extra: dict | None = None,
    camera: dict | None = None,
    aabb: dict | None = None,
    compress: bool = True,
    optimizer_state=None,
    cam_offsets=None,
):
    from .ops.morton import dense_to_morton_perm

    snapshot = {
        "version": SNAPSHOT_FORMAT_VERSION,
        "mode": mode,
        "training_step": int(training_step),
        "loss": float(loss),
        "params_type": "__half",
        "params_binary": _pack_params(params, None).tobytes(),
    }
    if camera:
        snapshot["camera"] = camera
    if aabb:
        snapshot["aabb"] = aabb
    if density_grid is not None:
        g = density_grid.shape[-1]
        perm = dense_to_morton_perm(g)
        morton = np.stack(
            [np.asarray(density_grid[m], np.float32).reshape(-1)[perm] for m in range(density_grid.shape[0])]
        )
        snapshot["density_grid_size"] = g
        snapshot["density_grid_binary"] = morton.astype(np.float16).tobytes()
    if nerf_extra:
        snapshot["nerf"] = nerf_extra
    if optimizer_state is not None:
        snapshot["optimizer_state"] = pack_tree(optimizer_state)
    if cam_offsets is not None:
        snapshot["cam_offsets"] = pack_tree(cam_offsets)

    doc = dict(network_config)
    doc["snapshot"] = snapshot
    data = msgpack.packb(doc, use_bin_type=True)
    path = Path(path)
    if path.suffix == ".ingp":
        data = zlib.compress(data) if compress else zlib.compress(data, 0)
    path.write_bytes(data)


def pack_tree(tree) -> list:
    """Serialize a pytree of arrays as [(dtype, shape, bytes), ...] in
    jax.tree flatten order (used for optimizer state — reference knob
    m_include_optimizer_state_in_snapshots, testbed.h:625)."""
    import jax

    leaves = jax.tree.leaves(tree)
    out = []
    for leaf in leaves:
        a = np.asarray(leaf)
        out.append([str(a.dtype), list(a.shape), a.tobytes()])
    return out


def unpack_tree(packed: list, template):
    """Inverse of pack_tree onto the template's structure."""
    import jax

    leaves, treedef = jax.tree.flatten(template)
    if len(packed) != len(leaves):
        raise ValueError(
            f"optimizer-state leaf count mismatch: snapshot has "
            f"{len(packed)}, template needs {len(leaves)}"
        )
    new_leaves = [
        np.frombuffer(raw, dtype=np.dtype(dt)).reshape(shape)
        for (dt, shape, raw) in packed
    ]
    return jax.tree.unflatten(treedef, new_leaves)


def load_snapshot_file(path) -> dict:
    path = Path(path)
    data = path.read_bytes()
    if path.suffix == ".ingp" or data[:1] == b"\x78":
        try:
            data = zlib.decompress(data)
        except zlib.error:
            pass
    return msgpack.unpackb(data, raw=False, strict_map_key=False)


def restore_params(snapshot: dict, params_template: dict) -> dict:
    blob = np.frombuffer(snapshot["params_binary"], np.float16)
    return _unpack_params(blob, params_template)


def restore_density_grid(snapshot: dict, n_cascades: int) -> np.ndarray | None:
    from .ops.morton import morton_to_dense_perm

    if "density_grid_binary" not in snapshot:
        return None
    g = int(snapshot.get("density_grid_size", 128))
    raw = np.frombuffer(snapshot["density_grid_binary"], np.float16).astype(np.float32)
    n_casc = raw.size // (g**3)
    perm = morton_to_dense_perm(g)
    grids = raw.reshape(n_casc, -1)[:, perm].reshape(n_casc, g, g, g)
    if n_casc < n_cascades:
        grids = np.concatenate(
            [grids, np.zeros((n_cascades - n_casc, g, g, g), np.float32)]
        )
    return grids[:n_cascades]
