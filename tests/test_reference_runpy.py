"""The BASELINE goal "reference scripts/run.py works unchanged": copy
the reference's run.py + its sibling libraries VERBATIM into a sandbox,
point `import pyngp` at our shim, and drive a train + --test_transforms
eval end-to-end on a tiny on-disk synthetic dataset.

Only environment provisioning is added (a `commentjson` stand-in —
that pip package isn't in this image); no reference line is modified.
"""

import json
import os
import shutil
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

REFERENCE_SCRIPTS = Path("/root/reference/scripts")
REPO = Path(__file__).resolve().parents[1]

COMMENTJSON_STUB = '''\
"""commentjson stand-in: json with // and # comment stripping."""
import json as _json
import re as _re


def _strip(text):
    out = []
    in_str = False
    esc = False
    i = 0
    while i < len(text):
        c = text[i]
        if in_str:
            out.append(c)
            if esc:
                esc = False
            elif c == "\\\\":
                esc = True
            elif c == '"':
                in_str = False
            i += 1
            continue
        if c == '"':
            in_str = True
            out.append(c)
            i += 1
        elif text.startswith("//", i) or c == "#":
            while i < len(text) and text[i] != "\\n":
                i += 1
        elif text.startswith("/*", i):
            j = text.find("*/", i + 2)
            i = len(text) if j < 0 else j + 2
        else:
            out.append(c)
            i += 1
    return "".join(out)


def loads(s, **kw):
    return _json.loads(_strip(s), **kw)


def load(fp, **kw):
    return loads(fp.read(), **kw)


def dumps(obj, **kw):
    return _json.dumps(obj, **kw)


def dump(obj, fp, **kw):
    return _json.dump(obj, fp, **kw)
'''


def write_synthetic_scene(scene_dir: Path, n_images=3, res=32):
    """Tiny on-disk NeRF dataset: a bright sphere at the origin seen
    from cameras on a circle (images rendered analytically)."""
    import imageio.v2 as imageio

    scene_dir.mkdir(parents=True, exist_ok=True)
    frames = []
    fl = res * 1.2
    for i in range(n_images):
        ang = 2 * np.pi * i / n_images
        # camera on circle radius 1.2 around scene center (0.5³ in ngp
        # space ↔ origin in nerf space), looking at the center
        pos = np.array([1.2 * np.cos(ang), 0.2, 1.2 * np.sin(ang)])
        fwd = -pos / np.linalg.norm(pos)
        up = np.array([0.0, 1.0, 0.0])
        right = np.cross(up, fwd)
        right /= np.linalg.norm(right)
        up2 = np.cross(fwd, right)
        # nerf convention: x right, y up, z BACK (camera looks -z)
        m = np.eye(4)
        m[:3, 0] = right
        m[:3, 1] = up2
        m[:3, 2] = -fwd
        m[:3, 3] = pos

        # render: ray-sphere for sphere radius .35 at origin
        ys, xs = np.meshgrid(np.arange(res), np.arange(res), indexing="ij")
        u = (xs + 0.5 - res / 2) / fl
        v = (ys + 0.5 - res / 2) / fl
        d = (right[None, None, :] * u[..., None]
             - up2[None, None, :] * v[..., None]
             + fwd[None, None, :])
        d /= np.linalg.norm(d, axis=-1, keepdims=True)
        oc = pos[None, None, :]
        b = np.sum(d * oc, -1)
        c = np.sum(oc * oc, -1) - 0.35**2
        disc = b * b - c
        hit = disc > 0
        img = np.zeros((res, res, 4), np.uint8)
        img[..., 3] = 255
        shade = np.clip(120 + 100 * np.cos(3 * u) * np.sin(3 * v), 0, 255)
        img[..., 0] = np.where(hit, shade, 10)
        img[..., 1] = np.where(hit, 200, 10)
        img[..., 2] = np.where(hit, 80, 30)
        name = f"im_{i}.png"
        imageio.imwrite(scene_dir / name, img)
        frames.append({
            "file_path": name,
            "transform_matrix": m.tolist(),
        })
    meta = {
        "camera_angle_x": float(2 * np.arctan2(res / 2, fl)),
        "fl_x": float(fl), "fl_y": float(fl),
        "cx": res / 2, "cy": res / 2, "w": res, "h": res,
        "aabb_scale": 1,
        "frames": frames,
    }
    with open(scene_dir / "transforms.json", "w") as f:
        json.dump(meta, f)


@pytest.fixture(scope="module")
def sandbox(tmp_path_factory):
    sb = tmp_path_factory.mktemp("ref_runpy")
    for name in ("run.py", "common.py", "scenes.py", "constants.py"):
        shutil.copy(REFERENCE_SCRIPTS / name, sb / name)
    shutil.copytree(REFERENCE_SCRIPTS / "flip", sb / "flip")
    (sb / "commentjson.py").write_text(COMMENTJSON_STUB)
    write_synthetic_scene(sb / "scene")
    return sb


class TestReferenceRunPy:
    def test_train_and_test_transforms(self, sandbox):
        env = dict(os.environ)
        env["JAX_PLATFORMS"] = "cpu"
        env["PYTHONPATH"] = os.pathsep.join([str(sandbox), str(REPO)])
        proc = subprocess.run(
            [sys.executable, str(sandbox / "run.py"),
             "--scene", str(sandbox / "scene"),
             "--n_steps", "16",
             "--test_transforms", str(sandbox / "scene" / "transforms.json")],
            cwd=sandbox, env=env, capture_output=True, text=True, timeout=1200,
        )
        sys.stderr.write(proc.stdout[-2000:] + proc.stderr[-4000:])
        assert proc.returncode == 0
        assert "PSNR=" in proc.stdout
