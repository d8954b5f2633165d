"""Benchmark driver: trains the fox NeRF and reports seconds-to-30dB
PSNR (the BASELINE.json headline metric). Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Falls back to the albert.exr image-fit PSNR if the fox dataset is
unavailable. Baseline target: 30 dB in < 10 s (BASELINE.md).
"""

import faulthandler
import json
import os
import signal
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

import numpy as np

FOX = "/root/reference/data/nerf/fox"
ALBERT = "/root/reference/data/image/albert.exr"
BUDGET_S = float(os.environ.get("BENCH_BUDGET_S", 240))
TARGET_DB = 30.0

try:
    import _jaxcache  # noqa: F401  (persistent compile cache)
except Exception:
    pass


class _alarm:
    """SIGALRM guard: converts a hang inside the block (e.g. a TPU
    dispatch stuck on a dead tunnel) into a TimeoutError the caller's
    try/except can record. Main-thread only — bench phases are."""

    def __init__(self, seconds: int):
        self.seconds = seconds

    @staticmethod
    def _raise(signum, frame):
        raise TimeoutError("bench extras step timed out")

    def __enter__(self):
        signal.signal(signal.SIGALRM, self._raise)
        signal.alarm(self.seconds)

    def __exit__(self, *exc):
        signal.alarm(0)


def bench_fox():
    from instant_ngp_tpu.config import load_network_config
    from instant_ngp_tpu.io.nerf_loader import load_nerf
    from instant_ngp_tpu.metrics import mse_to_psnr
    from instant_ngp_tpu.nerf.task import NerfTask
    from instant_ngp_tpu.common import srgb_to_linear, linear_to_srgb

    ds = load_nerf(FOX)
    cfg = load_network_config("base.json", mode="nerf")
    # TPU flagship: 4-corner simplex interpolation on hashed levels —
    # half the gather rows of trilinear for ~0.15 dB/step
    # (scripts/ab_simplex.py; docs/ROUND3_NOTES.md)
    cfg.setdefault("encoding", {})["interpolation"] = "Simplex"
    # LR decay sized to the 240 s budget (~1536 steps): ×0.33^((s-768)/512)
    # ⇒ ~0.19× at cutoff. A/B (scripts/ab_r4.py): 27.29 dB vs 27.03 base.
    cfg["optimizer"]["nested"]["decay_start"] = 768
    cfg["optimizer"]["nested"]["decay_interval"] = 512
    task = NerfTask(ds, cfg, n_rays_per_batch=1 << 12, max_samples_per_ray=32,
                    n_march_iters=192)

    # eval views: 5 evenly spaced training views at half res (training
    # views double as eval for fox, like run.py screenshot_transforms)
    w, h = ds.resolution
    ew, eh = w // 4, h // 4
    views = np.linspace(0, ds.n_images - 1, 3).astype(int)

    def eval_psnr():
        # all eval views through ONE compacted ray pool (render_batch):
        # the per-round host sync is paid once for the batch, not per
        # view (sequential views measured ~26 s steady in round 3)
        frames = task.render_batch(
            ew, eh, [ds.xforms_start[v] for v in views],
            focal_lengths=[(ds.focal_lengths[v, 0] * ew / w,
                            ds.focal_lengths[v, 1] * eh / h) for v in views],
            principal_points=[tuple(ds.principal_points[v]) for v in views],
            background=(0, 0, 0, 0),
        )
        ses = []
        for frame, v in zip(frames, views):
            # GT: downsample by averaging 4x4 in linear space, then srgb
            img = ds.images[v].astype(np.float32) / 255.0
            lin = np.asarray(srgb_to_linear(img[..., :3])) * img[..., 3:4]
            lin = lin[: eh * 4, : ew * 4].reshape(eh, 4, ew, 4, 3).mean((1, 3))
            gt = np.asarray(linear_to_srgb(lin))
            pred = np.clip(frame[..., :3], 0.0, 1.0)
            ses.append(np.mean((pred - gt) ** 2))
        return mse_to_psnr(float(np.mean(ses)))

    # warm up compiles outside the timed region: all ray buckets, the
    # error-map-CDF program variants (first rebuild at step 128), and
    # the grid-update programs — every shape must hit the persistent
    # compile cache before the timed run
    print("# warmup: train step (all ray buckets)...", file=sys.stderr, flush=True)
    # alarm: a tunnel outage manifests as a HANG, not an error — raise
    # so main()'s re-exec retry gets a shot at a recovered device
    # (2400 s covers the worst cold-cache compile storm observed)
    with _alarm(2400):
        for bucket in (2048, 4096, 8192):
            task._n_rays_current = bucket
            task.train(1)
        task.train(140)  # crosses the first CDF rebuild → use_cdf variants
        for bucket in (2048, 4096):
            task._n_rays_current = bucket
            task.train(1)
        # the corner anneal switches to exact gradients mid-run — compile
        # those program variants now too
        task.exact_corners_after = 0
        for bucket in (2048, 4096, 8192):
            task._n_rays_current = bucket
            task.train(1)
        task._n_rays_current = task.n_rays_per_batch
        print("# warmup: eval render...", file=sys.stderr, flush=True)
        t_ev = time.time()
        _ = eval_psnr()
        print(f"# warmup eval took {time.time()-t_ev:.1f}s (includes compiles)",
              file=sys.stderr, flush=True)
        t_ev = time.time()
        _ = eval_psnr()
        print(f"# steady-state eval: {time.time()-t_ev:.1f}s for 3 views",
              file=sys.stderr, flush=True)

    # reset to a fresh task for the clean timed run (compiles + the
    # visibility-culling grid are disk-cached at this point)
    task = NerfTask(ds, cfg, n_rays_per_batch=1 << 12, max_samples_per_ray=32,
                    n_march_iters=192)

    # the budget/headline counts TRAINING time only — the reference's
    # "5 s fox" excludes its eval renders too; evals here cost tens of
    # seconds each and would otherwise eat most of the budget
    train_elapsed = 0.0
    seconds_to_target = None
    best_psnr = 0.0
    chunk = 128
    while train_elapsed < BUDGET_S:
        t0 = time.time()
        try:
            # a chunk is ~20-90 s; a stuck tunnel dispatch is a hang,
            # not an error — bail with the partial result instead of
            # letting the phase timeout discard everything
            with _alarm(1500):
                task.train(chunk)
                train_elapsed += time.time() - t0
                p = eval_psnr()
        except TimeoutError:
            print("# train/eval chunk hung — returning partial result",
                  file=sys.stderr, flush=True)
            break
        best_psnr = max(best_psnr, p)
        print(f"# step {task.training_step} t={train_elapsed:.1f}s psnr={p:.2f}",
              file=sys.stderr, flush=True)
        if p >= TARGET_DB:
            seconds_to_target = train_elapsed
            break

    extras = {"steps": task.training_step}

    def _result(ex):
        if seconds_to_target is not None:
            return {
                "metric": "fox_nerf_seconds_to_30db_psnr",
                "value": round(seconds_to_target, 2),
                "unit": "s",
                "vs_baseline": round(seconds_to_target / 10.0, 3),
                "extra": {**ex, "psnr": round(best_psnr, 2)},
            }
        return {
            "metric": "fox_nerf_psnr_at_budget",
            "value": round(best_psnr, 2),
            "unit": "dB",
            "vs_baseline": round(best_psnr / TARGET_DB, 3),
            "extra": {**ex, "budget_s": BUDGET_S},
        }

    # provisional headline NOW: if a render-throughput extra below
    # hangs (a stuck TPU dispatch is a hang, not an exception) and the
    # phase is killed at its timeout, the orchestrator still parses
    # this line and the training result survives
    print(json.dumps(_result(extras)), flush=True)

    # render throughput on the trained model (256², training view 0):
    # exact protocol rendering and the fast stochastic-corner mode
    try:
        with _alarm(600):
            v = int(views[0])
            fl = (ds.focal_lengths[v, 0] * 256 / w,
                  ds.focal_lengths[v, 1] * 256 / h)

            def rays_per_s(quality):
                kw = dict(focal_length=fl,
                          principal_point=tuple(ds.principal_points[v]),
                          background=(0, 0, 0, 0), render_quality=quality)
                task.render(256, 256, ds.xforms_start[v], **kw)  # compile
                t0 = time.time()
                task.render(256, 256, ds.xforms_start[v], **kw)
                return round(256 * 256 / (time.time() - t0) / 1e6, 4)

            extras["render_mrays_per_s"] = {"exact": rays_per_s("exact")}
            print(json.dumps(_result(extras)), flush=True)
    except Exception as e:  # noqa: BLE001
        extras["render_mrays_per_s"] = {"error": str(e)[:120]}
        return _result(extras)  # a hung device won't recover below
    try:
        # baked-cache render throughput (nerf/baked.py): bake once for
        # this camera, then measure steady-state frames at 256² and
        # 1080p (the reference's interactive-render regime)
        with _alarm(900):
            v = int(views[0])
            t0 = time.time()
            task._get_baked(origin=np.asarray(ds.xforms_start[v])[:, 3])
            extras["render_mrays_per_s"]["bake_s"] = round(
                time.time() - t0, 2)
            extras["render_mrays_per_s"]["baked"] = rays_per_s("baked")
            kw = dict(focal_length=(ds.focal_lengths[v, 0],
                                    ds.focal_lengths[v, 1]),
                      principal_point=tuple(ds.principal_points[v]),
                      background=(0, 0, 0, 0), render_quality="baked")
            task.render(1920, 1080, ds.xforms_start[v], **kw)  # compile
            t0 = time.time()
            task.render(1920, 1080, ds.xforms_start[v], **kw)
            extras["render_mrays_per_s"]["baked_1080p"] = round(
                1920 * 1080 / (time.time() - t0) / 1e6, 4)
            print(json.dumps(_result(extras)), flush=True)
    except Exception as e:  # noqa: BLE001
        extras["render_mrays_per_s"]["baked_error"] = str(e)[:120]
    try:
        # slab-sweep render throughput (nerf/slab.py): dense diffuse
        # bake once, then steady-state frames; plus image agreement
        # with the exact renderer at 256²
        with _alarm(900):
            v = int(views[0])
            t0 = time.time()
            task._get_slab(eye=np.asarray(ds.xforms_start[v])[:, 3])
            extras["render_mrays_per_s"]["slab_bake_s"] = round(
                time.time() - t0, 2)
            extras["render_mrays_per_s"]["slab"] = rays_per_s("slab")
            kw = dict(focal_length=(ds.focal_lengths[v, 0],
                                    ds.focal_lengths[v, 1]),
                      principal_point=tuple(ds.principal_points[v]),
                      background=(0, 0, 0, 0), render_quality="slab",
                      out_uint8=True)  # viewer-realistic frame copy
            task.render(1920, 1080, ds.xforms_start[v], **kw)  # compile
            t0 = time.time()
            task.render(1920, 1080, ds.xforms_start[v], **kw)
            extras["render_mrays_per_s"]["slab_1080p"] = round(
                1920 * 1080 / (time.time() - t0) / 1e6, 4)
            fl = (ds.focal_lengths[v, 0] * 256 / w,
                  ds.focal_lengths[v, 1] * 256 / h)
            kw2 = dict(focal_length=fl,
                       principal_point=tuple(ds.principal_points[v]),
                       background=(0, 0, 0, 0))
            img_s = np.asarray(task.render(256, 256, ds.xforms_start[v],
                                           render_quality="slab", **kw2))
            img_e = np.asarray(task.render(256, 256, ds.xforms_start[v],
                                           **kw2))

            def agree(a, b):
                mse = float(np.mean((np.clip(a[..., :3], 0, 1)
                                     - np.clip(b[..., :3], 0, 1)) ** 2))
                return round(-10 * np.log10(max(mse, 1e-10)), 2)

            extras["render_mrays_per_s"]["slab_vs_exact_psnr"] = agree(
                img_e, img_s)
            # apples-to-apples: per-camera view-dependent bake
            task.slab_bake_view_dependent = True
            img_v = np.asarray(task.render(256, 256, ds.xforms_start[v],
                                           render_quality="slab", **kw2))
            task.slab_bake_view_dependent = False
            extras["render_mrays_per_s"]["slab_vs_exact_psnr_vd"] = agree(
                img_e, img_v)
    except Exception as e:  # noqa: BLE001
        extras["render_mrays_per_s"]["slab_error"] = str(e)[:120]
    return _result(extras)


def bench_sdf(n_steps: int = 512):
    """SDF armadillo fit (BASELINE config): IoU after a short train."""
    import time as _t

    from instant_ngp_tpu.config import load_network_config
    from instant_ngp_tpu.sdf.task import SdfTask

    task = SdfTask("/root/reference/data/sdf/armadillo.obj",
                   load_network_config("base.json", mode="sdf"))
    task.train(2)
    t0 = _t.time()
    task.train(n_steps)
    dt = _t.time() - t0
    iou = task.calculate_iou(1 << 19)
    task.stop_producer()
    return {"iou": round(float(iou), 4), "steps": task.training_step,
            "steps_per_s": round(n_steps / dt, 2)}


def bench_volume(n_steps: int = 100):
    """Neural-volume fit on a procedural blob (no .nvdb asset in this
    environment): density MSE + learned-vs-GT render MSE (the
    reference's side-by-side comparison, testbed_volume.cu render
    modes)."""
    from instant_ngp_tpu.config import load_network_config
    from instant_ngp_tpu.volume.task import VolumeTask

    x = np.linspace(-1, 1, 48)
    gx, gy, gz = np.meshgrid(x, x, x, indexing="ij")
    dens = np.maximum(0.0, 1.2 - 2.2 * (gx**2 + 1.4 * gy**2 + gz**2))
    dens += 0.4 * np.maximum(0.0, 0.4 - (gx - 0.3) ** 2 - gz**2)
    task = VolumeTask(dens.astype(np.float32),
                      load_network_config("base.json", mode="volume"))
    task.train(n_steps)
    cam = np.concatenate([np.eye(3, dtype=np.float32),
                          np.array([[0.5], [0.5], [-1.3]], np.float32)], 1)
    gt = task.render(64, 64, cam, ground_truth=True)
    learned = task.render(64, 64, cam)
    img_mse = float(np.mean((gt[..., :3] - learned[..., :3]) ** 2))
    return {"density_mse": round(float(task.compute_density_mse()), 4),
            "gt_vs_learned_render_mse": round(img_mse, 4),
            "steps": task.training_step}


def bench_albert(n_steps: int = 300):
    """albert.exr image fit PSNR (BASELINE config)."""
    from instant_ngp_tpu.config import load_network_config
    from instant_ngp_tpu.image_fit.task import ImageTask
    from instant_ngp_tpu.io.image import load_image
    from instant_ngp_tpu.metrics import mse_to_psnr

    img, is_hdr = load_image(ALBERT)
    task = ImageTask(img, is_hdr, load_network_config("base.json", mode="image"))
    task.train(n_steps)
    return {"psnr": round(float(mse_to_psnr(task.compute_mse())), 2),
            "steps": task.training_step}


def bench_gigapixel():
    """BASELINE 'gigapixel Tokyo' stand-in: no Tokyo asset in this
    environment, so synthesize an 8192² image with multi-scale detail
    and train image mode with log2_hashmap_size=21 (the named BASELINE
    config). Reports steps/s and PSNR on a 1M-pixel random probe."""
    import time as _t

    import jax
    import jax.numpy as jnp

    from instant_ngp_tpu.config import load_network_config
    from instant_ngp_tpu.image_fit.task import ImageTask
    from instant_ngp_tpu.metrics import mse_to_psnr

    res = 8192
    # procedural multi-octave pattern, built in fp32 tiles → uint8
    img = np.empty((res, res, 4), np.uint8)
    ys = np.arange(res, dtype=np.float32)[:, None] / res
    for y0 in range(0, res, 1024):
        yy = ys[y0 : y0 + 1024]
        xx = np.arange(res, dtype=np.float32)[None, :] / res
        v = np.zeros((1024, res), np.float32)
        for o in range(6):
            f = 2.0 ** (o + 2)
            v += np.sin(f * 6.28318 * (xx + 0.37 * o)) * np.cos(
                f * 6.28318 * (yy - 0.11 * o)) / (1.5**o)
        v = (v - v.min()) / max(v.max() - v.min(), 1e-9)
        tile = np.stack([v, v**2, 1.0 - v, np.ones_like(v)], -1)
        img[y0 : y0 + 1024] = np.clip(tile * 255.0, 0, 255).astype(np.uint8)

    cfg = load_network_config("base.json", mode="image")
    cfg.setdefault("encoding", {})["log2_hashmap_size"] = 21
    task = ImageTask(img, False, cfg)
    task.train(2)  # compile
    n_steps = 192
    t0 = _t.time()
    task.train(n_steps)
    dt = _t.time() - t0

    # PSNR probe on 1M random pixel centers
    rng = np.random.default_rng(0)
    px = rng.integers(0, res, 1 << 20)
    py = rng.integers(0, res, 1 << 20)
    uv = jnp.asarray(
        np.stack([(px + 0.5) / res, (py + 0.5) / res], -1), jnp.float32)
    pred = np.asarray(task._jit_infer(task.inference_params, uv))
    from instant_ngp_tpu.common import linear_to_srgb

    gt_lin = np.asarray(task.texture)[py, px, :3]
    gt = np.asarray(linear_to_srgb(np.clip(gt_lin, 0.0, 1.0)))
    mse = float(np.mean((np.clip(pred, 0, 1) - gt) ** 2))
    return {
        "steps_per_s": round(n_steps / dt, 2),
        "psnr_1m_probe": round(mse_to_psnr(mse), 2),
        "resolution": res,
        "log2_hashmap_size": 21,
        "steps": task.training_step,
    }


def bench_synthetic(train_s: float = 150.0):
    """Blender-synthetic-style protocol PSNR (VERDICT r3 item 5: the
    BASELINE names lego; no synthetic asset ships in this environment,
    so a procedural stand-in with the same conventions — transparent
    background, straight-alpha sRGB PNGs, held-out test transforms —
    exercises the run.py eval protocol (run.py:257-317: black bg,
    snap-to-pixel-centers, sRGB metric) end to end."""
    import time as _t

    from instant_ngp_tpu.common import linear_to_srgb, srgb_to_linear
    from instant_ngp_tpu.config import load_network_config
    from instant_ngp_tpu.io.nerf_loader import load_nerf
    from instant_ngp_tpu.io.synthetic import generate_synthetic_dataset
    from instant_ngp_tpu.metrics import mse_to_psnr
    from instant_ngp_tpu.nerf.task import NerfTask

    import imageio.v2 as imageio
    import json as _json

    t_gen = _t.time()
    d, test_json = generate_synthetic_dataset(
        "/tmp/ingp_synth_box", n_train=20, n_test=3, res=200, n_steps=448)
    gen_s = _t.time() - t_gen

    ds = load_nerf(str(d))
    cfg = load_network_config("base.json", mode="nerf")
    cfg.setdefault("encoding", {})["interpolation"] = "Simplex"
    task = NerfTask(ds, cfg, n_rays_per_batch=1 << 12,
                    max_samples_per_ray=32, n_march_iters=192)
    task.train(2)  # compile
    t0 = _t.time()
    while _t.time() - t0 < train_s:
        task.train(64)
    trained_s = _t.time() - t0

    # run.py eval protocol: black background, snap to pixel centers,
    # sRGB-space PSNR against straight-alpha GT composited over black
    meta = _json.loads(Path(test_json).read_text())
    fov_x = float(meta["camera_angle_x"])
    ses = []
    for fr in meta["frames"]:
        gt8 = imageio.imread(d / (fr["file_path"] + ".png"))
        h, w = gt8.shape[:2]
        gt = gt8.astype(np.float32) / 255.0
        gt_lin = np.asarray(srgb_to_linear(gt[..., :3])) * gt[..., 3:4]
        gt_srgb = np.asarray(linear_to_srgb(gt_lin))
        c2w = ds.nerf_matrix_to_ngp(
            np.asarray(fr["transform_matrix"], np.float32)[:3])
        import math as _m

        fl = 0.5 * w / _m.tan(0.5 * fov_x)
        pred = task.render(w, h, c2w, focal_length=(fl, fl),
                           background=(0, 0, 0, 1))
        ses.append(np.mean((np.clip(pred[..., :3], 0, 1) - gt_srgb) ** 2))
    return {"psnr": round(mse_to_psnr(float(np.mean(ses))), 2),
            "steps": task.training_step,
            "train_s": round(trained_s, 1), "gen_s": round(gen_s, 1),
            "protocol": "run.py:257-317 (black bg, snap centers, sRGB)"}


def bench_image():
    from instant_ngp_tpu.config import load_network_config
    from instant_ngp_tpu.image_fit.task import ImageTask
    from instant_ngp_tpu.io.image import load_image
    from instant_ngp_tpu.metrics import mse_to_psnr

    img, is_hdr = load_image(ALBERT)
    cfg = load_network_config("base.json", mode="image")
    task = ImageTask(img, is_hdr, cfg)
    task.train(1)
    t0 = time.time()
    while time.time() - t0 < min(BUDGET_S, 60):
        task.train(100)
    psnr = mse_to_psnr(task.compute_mse())
    return {
        "metric": "albert_image_psnr_60s",
        "value": round(psnr, 2),
        "unit": "dB",
        "vs_baseline": round(psnr / 30.0, 3),
    }


PHASES = {
    # name -> (callable name, subprocess timeout seconds)
    "fox": ("bench_fox", 5400),
    "synthetic_box": ("bench_synthetic", 1200),
    "gigapixel": ("bench_gigapixel", 1800),
    "sdf_armadillo": ("bench_sdf", 1500),
    "volume_blob": ("bench_volume", 1200),
    "image_albert": ("bench_albert", 900),
}


def orchestrate():
    """Run each bench phase in its OWN subprocess, strictly
    sequentially. The tunneled TPU admits exactly one client process
    (concurrent clients deadlock on the chip lock), and a worker crash
    kills every later dispatch in the same process — isolating phases
    means one crash costs one phase, and each child can execv-retry
    itself (see main's UNAVAILABLE handler). The orchestrator itself
    never touches the device."""
    import subprocess

    t_start = time.time()
    # hard wall-clock budget for the WHOLE bench: the driver kills a
    # run that overstays (round-3's was discarded at rc=124) — stop
    # STARTING phases well before that, and print the merged headline
    # after every phase so a kill can never lose captured results
    total_budget = float(os.environ.get("BENCH_TOTAL_S", 2700))

    def wait_device(attempts=3):
        """Probe the TPU with a throwaway subprocess until it answers.
        The worker reliably crashes on the FIRST dispatch of a fresh
        process after a heavy process exits — a probe absorbs that
        crash so the next real phase starts on a healthy worker.
        CAPPED: an unresponsive tunnel must not eat the driver budget
        (round 3 died in exactly this loop) — give up after a few
        tries and let the caller stop cleanly."""
        probe = "import jax, jax.numpy as jnp; print(float(jnp.ones(8).sum()))"
        for i in range(attempts):
            try:
                # a fresh process absorbing a worker crash can take
                # >4 min to its first dispatch (measured 256 s) — a
                # shorter timeout fails healthy-but-restarting workers
                if subprocess.run([sys.executable, "-c", probe],
                                  timeout=300,
                                  capture_output=True).returncode == 0:
                    return True
            except subprocess.TimeoutExpired:
                pass
            print(f"# device probe failed ({i + 1}/{attempts}); waiting 30s",
                  file=sys.stderr, flush=True)
            time.sleep(30)
        return False

    merged = None
    extras = {}

    def emit():
        """Print the best-known merged headline NOW. The driver takes
        the last parseable line, so each emission strictly supersedes
        the previous one — later phases are purely additive."""
        m = merged
        if m is None or "metric" not in m:
            m = {"metric": "bench_failed", "value": 0.0, "unit": "none",
                 "vs_baseline": 0.0,
                 "error": (merged or {}).get("error", "fox phase failed")}
        m = dict(m)
        m["extra"] = {**m.get("extra", {}), **extras}
        print(json.dumps(m), flush=True)

    first = True
    for phase, (_, tmo) in PHASES.items():
        if phase != "fox" and not Path(FOX).exists():
            continue  # image fallback mode: single phase only
        elapsed = time.time() - t_start
        if not first and elapsed + 120 > total_budget:
            print(f"# bench budget spent ({elapsed:.0f}s); skipping {phase}+",
                  file=sys.stderr, flush=True)
            break
        if not first and not wait_device():
            print("# device unresponsive; stopping with captured results",
                  file=sys.stderr, flush=True)
            break
        first = False
        env = dict(os.environ, BENCH_PHASE=phase, BENCH_RETRIED="0")
        # never let one phase overrun the global budget
        tmo = int(min(tmo, max(120, total_budget - (time.time() - t_start))))
        try:
            # stdout captured for the JSON line; stderr inherited so
            # phase progress streams live
            r = subprocess.run(
                [sys.executable, __file__], env=env, timeout=tmo,
                stdout=subprocess.PIPE, text=True)
            line = next((ln for ln in reversed(r.stdout.splitlines())
                         if ln.startswith("{")), None)
            out = json.loads(line) if line else {"error": "no output"}
        except subprocess.TimeoutExpired as e:
            # the killed child may already have printed a provisional
            # headline (bench_fox prints one right after the timed
            # train loop and after each extra) — salvage the last one
            partial = e.stdout or b""
            if isinstance(partial, bytes):
                partial = partial.decode(errors="replace")
            line = next((ln for ln in reversed(partial.splitlines())
                         if ln.startswith("{")), None)
            try:
                out = json.loads(line) if line else {}
            except json.JSONDecodeError:
                out = {}
            out.setdefault("error", f"phase timeout after {tmo}s")
        except Exception as e:  # noqa: BLE001
            out = {"error": str(e)[:120]}
        if phase == "fox":
            merged = out
        else:
            extras[phase] = out
        emit()
    emit()


def main():
    faulthandler.register(signal.SIGUSR2, file=sys.stderr)
    phase = os.environ.get("BENCH_PHASE")
    if phase is None:
        return orchestrate()
    try:
        if phase == "fox":
            result = bench_fox() if Path(FOX).exists() else bench_image()
        else:
            result = globals()[PHASES[phase][0]]()
    except Exception as e:  # noqa: BLE001
        import traceback

        traceback.print_exc(file=sys.stderr)
        # The tunneled TPU worker intermittently crashes on the FIRST
        # dispatch of a fresh process when a previous heavy process
        # left it wedged ("UNAVAILABLE: TPU worker process crashed"),
        # and the tunnel occasionally goes unresponsive for 10+
        # minutes. execv replaces this process (freeing its client —
        # concurrent clients deadlock on the chip lock, so no probing
        # from here) and re-initializes from scratch, with a growing
        # backoff that outlasts the observed outages (~20 min total).
        tries = int(os.environ.get("BENCH_RETRIED", "0"))
        if (("UNAVAILABLE" in str(e) or isinstance(e, TimeoutError))
                and tries < 6):
            wait = min(60 * (tries + 1), 300)
            print(f"# TPU worker crash — retry {tries + 1}/6 after {wait}s",
                  file=sys.stderr, flush=True)
            time.sleep(wait)
            os.environ["BENCH_RETRIED"] = str(tries + 1)
            os.execv(sys.executable, [sys.executable] + sys.argv)
        if phase == "fox":
            try:
                result = bench_image()
            except Exception:
                result = {"metric": "bench_failed", "value": 0.0,
                          "unit": "none", "vs_baseline": 0.0,
                          "error": str(e)[:200]}
        else:
            result = {"error": str(e)[:200]}
    print(json.dumps(result))


if __name__ == "__main__":
    main()
