"""Web viewer: orbit math + end-to-end render over HTTP."""
import json
import threading
import time
import urllib.error
import urllib.request

import numpy as np

import __graft_entry__ as g


def test_orbit_matrix_looks_at_center():
    from instant_ngp_tpu.viewer import orbit_matrix

    for theta, phi, r in [(0, 0.3, 2.0), (1.2, -0.5, 3.0), (3.0, 0.0, 1.0)]:
        m = orbit_matrix(theta, phi, r)
        eye, fwd = m[:, 3], m[:, 2]
        center = np.array([0.5, 0.5, 0.5])
        assert abs(np.linalg.norm(eye - center) - r) < 1e-5
        # forward axis points at the center
        to_c = (center - eye) / r
        np.testing.assert_allclose(fwd, to_c, atol=1e-5)
        # orthonormal frame
        R = m[:, :3]
        np.testing.assert_allclose(R.T @ R, np.eye(3), atol=1e-5)


def test_viewer_serves_page_and_frames():
    from instant_ngp_tpu.common import TestbedMode
    from instant_ngp_tpu.nerf.task import NerfTask
    from instant_ngp_tpu.testbed import Testbed
    from instant_ngp_tpu.viewer import ViewerServer

    tb = Testbed()
    ds = g._synthetic_dataset()
    tb.nerf_dataset = ds
    tb.mode = TestbedMode.NERF
    tb.network_config = g._tiny_nerf_config()
    tb.task = NerfTask(ds, tb.network_config, n_rays_per_batch=64,
                       max_samples_per_ray=4, n_march_iters=8)
    tb.task.train(1)

    server = ViewerServer(tb, port=18765)
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    time.sleep(0.5)

    page = urllib.request.urlopen("http://127.0.0.1:18765/").read()
    assert b"instant-ngp-tpu" in page
    frame = urllib.request.urlopen(
        "http://127.0.0.1:18765/render?theta=0&phi=0.3&r=2&w=16&h=16"
    ).read()
    assert frame[:2] == b"\xff\xd8"  # JPEG magic
    assert len(frame) > 100

    # control API: state / set / screenshot (the headless GUI panel)
    state = json.loads(urllib.request.urlopen(
        "http://127.0.0.1:18765/api/state").read())
    assert state["step"] == 1 and state["render_mode"] == "shade"
    applied = json.loads(urllib.request.urlopen(
        "http://127.0.0.1:18765/api/set?render_mode=depth&exposure=1.5"
        "&train=0").read())
    assert applied == {"train": False, "render_mode": "depth",
                       "exposure": 1.5}
    assert tb.render_mode.value == "depth" and tb.exposure == 1.5
    assert not tb.shall_train
    shot = urllib.request.urlopen(
        "http://127.0.0.1:18765/screenshot?w=16&h=16").read()
    assert shot[:8] == b"\x89PNG\r\n\x1a\n"
    # bad values are a 400, not a server crash
    try:
        urllib.request.urlopen(
            "http://127.0.0.1:18765/api/set?render_mode=bogus")
        raise AssertionError("expected HTTP 400")
    except urllib.error.HTTPError as e:
        assert e.code == 400


def test_viewer_path_editor_and_level_stats():
    """Round-4 panels (VERDICT item 9): camera-path keyframe editor +
    hash-level histogram, both driven over HTTP."""
    import json as _json

    from instant_ngp_tpu.common import TestbedMode
    from instant_ngp_tpu.nerf.task import NerfTask
    from instant_ngp_tpu.testbed import Testbed
    from instant_ngp_tpu.viewer import ViewerServer

    tb = Testbed()
    ds = g._synthetic_dataset()
    tb.nerf_dataset = ds
    tb.mode = TestbedMode.NERF
    tb.network_config = g._tiny_nerf_config()
    tb.task = NerfTask(ds, tb.network_config, n_rays_per_batch=64,
                       max_samples_per_ray=4, n_march_iters=8)
    tb.task.train(1)

    server = ViewerServer(tb, port=18766)
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    time.sleep(0.5)
    base = "http://127.0.0.1:18766"

    # level stats: one entry per hashgrid level with a resolution
    ls = _json.loads(urllib.request.urlopen(
        base + "/api/level_stats").read())
    assert len(ls) >= 1 and "resolution" in ls[0] and "std" in ls[0]

    # keyframe editor: add 2, render a scrubbed frame, remove, clear
    p = _json.loads(urllib.request.urlopen(
        base + "/api/path_add?theta=0&phi=0.3&r=2").read())
    p = _json.loads(urllib.request.urlopen(
        base + "/api/path_add?theta=1&phi=0.2&r=2").read())
    assert p["n"] == 2
    assert p["keyframes"][1]["timestamp"] == 1.0
    frame = urllib.request.urlopen(
        base + "/render?w=16&h=16&path_t=0.5").read()
    assert frame[:2] == b"\xff\xd8"  # JPEG from the path camera
    p = _json.loads(urllib.request.urlopen(
        base + "/api/path_remove?i=0").read())
    assert p["n"] == 1
    p = _json.loads(urllib.request.urlopen(
        base + "/api/path_clear").read())
    assert p["n"] == 0
