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


def _pack_params(params: dict, model) -> np.ndarray:
    """Flatten params into the tcnn order [density_net, rgb_net,
    pos_enc, dir_enc] as fp16. MLP weights transposed to (out, in)."""
    blobs = []
    for net_key in ("density_net", "rgb_net", "net"):
        if net_key in params:
            for w in params[net_key]:
                blobs.append(np.asarray(w, np.float32).T.reshape(-1))
    for enc_key in ("pos_enc", "enc"):
        if enc_key in params:
            blobs.append(np.asarray(params[enc_key], np.float32).reshape(-1))
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
                wt = take((w.shape[1], w.shape[0]))
                ws.append(wt.T)
            out[net_key] = ws
    for enc_key in ("pos_enc", "enc"):
        if enc_key in params_template:
            out[enc_key] = take(np.shape(params_template[enc_key]))
    if "dir_enc" in params_template and params_template["dir_enc"] is not None:
        tmpl = params_template["dir_enc"]
        if isinstance(tmpl, (list, tuple)):
            out["dir_enc"] = [None if t is None else take(np.shape(t)) for t in tmpl]
        else:
            out["dir_enc"] = take(np.shape(tmpl))
    return out


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

    doc = dict(network_config)
    doc["snapshot"] = snapshot
    data = msgpack.packb(doc, use_bin_type=True)
    path = Path(path)
    if path.suffix == ".ingp":
        data = zlib.compress(data) if compress else zlib.compress(data, 0)
    path.write_bytes(data)


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
