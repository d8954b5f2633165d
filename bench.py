"""Benchmark driver: trains the fox NeRF and reports seconds-to-30dB
PSNR (the BASELINE.json headline metric). Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Falls back to the albert.exr image-fit PSNR if the fox dataset is
unavailable. Baseline target: 30 dB in < 10 s (BASELINE.md).

Loss-proofing (rounds 2-4 all lost results to the driver's kill):
the orchestrator emits the best-known merged headline to ITS stdout
the moment any child prints a JSON line (stdout is streamed through a
reader thread, never buffered to completion), children print a
provisional headline after EVERY eval chunk, and a pending headline is
emitted at t=0 — so a kill at ANY instant leaves the last emission on
record. The driver takes the last parseable line.
"""

import faulthandler
import json
import os
import signal
import sys
import threading
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

import numpy as np

FOX = "/root/reference/data/nerf/fox"
ALBERT = "/root/reference/data/image/albert.exr"
SNAP = str(Path(__file__).resolve().parent / "data" / "fox_1536.ingp")
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

    import jax.numpy as jnp

    t_phase0 = time.time()
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

    def make_task():
        return NerfTask(ds, cfg, n_rays_per_batch=1 << 12,
                        max_samples_per_ray=32, n_march_iters=192)

    task = make_task()

    # ---- eval protocol -------------------------------------------------
    # Full eval: 3 evenly spaced training views at quarter res through
    # ONE compacted ray pool (render_batch), sRGB-space PSNR vs the
    # 4x4-linear-averaged GT (the protocol of rounds 1-4, comparable).
    # Probe eval: the SAME protocol on a fixed random subset of those
    # quarter-res pixels — an unbiased estimate of the full-frame MSE
    # at ~1/6 the rays, used after every chunk so a provisional
    # headline is never more than one chunk old. The final headline is
    # always a FULL eval; emissions carry extra.eval so the claim is
    # self-describing.
    w, h = ds.resolution
    ew, eh = w // 4, h // 4
    views = np.linspace(0, ds.n_images - 1, 3).astype(int)

    gt_frames = []
    for v in views:
        img = ds.images[v].astype(np.float32) / 255.0
        lin = np.asarray(srgb_to_linear(img[..., :3])) * img[..., 3:4]
        lin = lin[: eh * 4, : ew * 4].reshape(eh, 4, ew, 4, 3).mean((1, 3))
        gt_frames.append(np.asarray(linear_to_srgb(lin)))

    def eval_full():
        frames = task.render_batch(
            ew, eh, [ds.xforms_start[v] for v in views],
            focal_lengths=[(ds.focal_lengths[v, 0] * ew / w,
                            ds.focal_lengths[v, 1] * eh / h) for v in views],
            principal_points=[tuple(ds.principal_points[v]) for v in views],
            background=(0, 0, 0, 0),
        )
        ses = [np.mean((np.clip(f[..., :3], 0.0, 1.0) - gt) ** 2)
               for f, gt in zip(frames, gt_frames)]
        return mse_to_psnr(float(np.mean(ses)))

    # fixed probe pixels (same pixels every eval → a smooth trace)
    rng = np.random.default_rng(7)
    n_probe = 8192
    probe_xy = [(rng.integers(0, ew, n_probe), rng.integers(0, eh, n_probe))
                for _ in views]
    probe_gt = np.concatenate(
        [gt[py, px] for (px, py), gt in zip(probe_xy, gt_frames)])

    def eval_probe():
        os_, ds_, t0s, t1s = [], [], [], []
        for (px, py), v in zip(probe_xy, views):
            uv = np.stack([(px + 0.5) / ew, (py + 0.5) / eh],
                          -1).astype(np.float32)
            fl = (ds.focal_lengths[v, 0] * ew / w,
                  ds.focal_lengths[v, 1] * eh / h)
            o, d, tmin, tmax = task._jit_prep_rays(
                jnp.asarray(uv), jnp.asarray([ew, eh], jnp.float32),
                jnp.asarray(fl, jnp.float32),
                jnp.asarray(tuple(ds.principal_points[v]), jnp.float32),
                jnp.asarray(ds.xforms_start[v], jnp.float32))
            os_.append(o)
            ds_.append(d)
            t0s.append(tmin)
            t1s.append(tmax)
        params = task.opt.inference_params(task.state.opt_state,
                                           task.state.params)
        rgb, alpha, _, _ = task._render_rays(
            params, task.state.grid.skipmip, jnp.concatenate(os_),
            jnp.concatenate(ds_), bricks=task._get_bricks(params),
            tminmax=(jnp.concatenate(t0s), jnp.concatenate(t1s)))
        pred = np.clip(np.asarray(rgb), 0.0, 1.0)
        return mse_to_psnr(float(np.mean((pred - probe_gt) ** 2)))

    # ---- provisional-result plumbing -----------------------------------
    extras = {
        "eval_protocol": "3 train views 1/4-res sRGB; probe=24576-px "
                         "subset (unbiased MSE est.), full=all px",
    }
    seconds_to_target = None
    headline_psnr = 0.0

    def _result(ex, eval_kind):
        ex = {**ex, "eval": eval_kind}
        if seconds_to_target is not None:
            return {
                "metric": "fox_nerf_seconds_to_30db_psnr",
                "value": round(seconds_to_target, 2),
                "unit": "s",
                "vs_baseline": round(seconds_to_target / 10.0, 3),
                "extra": {**ex, "psnr": round(headline_psnr, 2)},
            }
        return {
            "metric": "fox_nerf_psnr_at_budget",
            "value": round(headline_psnr, 2),
            "unit": "dB",
            "vs_baseline": round(headline_psnr / TARGET_DB, 3),
            "extra": {**ex, "budget_s": BUDGET_S},
        }

    def emit(eval_kind):
        print(json.dumps(_result(extras, eval_kind)), flush=True)

    extras["steps"] = 0
    emit("pending")  # a kill during warmup still leaves a fox record

    # ---- warmup (capped): compile the exact shapes the timed run uses;
    # everything is disk-cached (.jax_cache) so a warm round is seconds.
    # Optional variants (CDF programs past step 128, corner-anneal exact
    # gradients) are skipped once the cap is exceeded — the timed run
    # then eats those compiles in-budget, which is strictly better than
    # an unbounded warmup eating the driver's wall clock (round 4 died
    # at 394 s of warmup with nothing emitted).
    warmup_cap = float(os.environ.get("BENCH_WARMUP_CAP_S", 240))
    print("# warmup: train step (all ray buckets)...", file=sys.stderr,
          flush=True)
    t_w = time.time()
    with _alarm(2400):
        for bucket in (2048, 4096, 8192):
            task._n_rays_current = bucket
            task.train(1)
        print(f"# warmup: probe eval... (t={time.time()-t_w:.0f}s)",
              file=sys.stderr, flush=True)
        _ = eval_probe()
        if time.time() - t_w < warmup_cap:
            print(f"# warmup: full eval... (t={time.time()-t_w:.0f}s)",
                  file=sys.stderr, flush=True)
            _ = eval_full()
        if time.time() - t_w < warmup_cap:
            # crosses the first CDF rebuild → use_cdf program variants
            print(f"# warmup: CDF variants... (t={time.time()-t_w:.0f}s)",
                  file=sys.stderr, flush=True)
            task.train(140)
            for bucket in (2048, 4096):
                task._n_rays_current = bucket
                task.train(1)
        if time.time() - t_w < warmup_cap:
            # the corner anneal switches to exact gradients mid-run
            print(f"# warmup: anneal variants... (t={time.time()-t_w:.0f}s)",
                  file=sys.stderr, flush=True)
            task.exact_corners_after = 0
            for bucket in (2048, 4096, 8192):
                task._n_rays_current = bucket
                task.train(1)
    extras["warmup_s"] = round(time.time() - t_w, 1)
    extras["load_s"] = round(t_w - t_phase0, 1)
    print(f"# warmup done in {extras['warmup_s']}s", file=sys.stderr,
          flush=True)

    # fresh task for the clean timed run (compiles are cached now)
    task = make_task()

    # the budget/headline counts TRAINING time only — the reference's
    # "5 s fox" excludes its eval renders too (README.md:5); evals are
    # off-budget but every emission says which eval produced it
    train_elapsed = 0.0
    chunk = 128
    while train_elapsed < BUDGET_S:
        t0 = time.time()
        try:
            # a stuck tunnel dispatch is a hang, not an error — bail
            # with the partial result instead of losing the phase
            with _alarm(1500):
                task.train(chunk)
                train_elapsed += time.time() - t0
                p = eval_probe()
        except TimeoutError:
            print("# train/eval chunk hung — returning partial result",
                  file=sys.stderr, flush=True)
            break
        headline_psnr = max(headline_psnr, p)
        extras["steps"] = task.training_step
        extras["train_s"] = round(train_elapsed, 1)
        print(f"# step {task.training_step} t={train_elapsed:.1f}s "
              f"psnr={p:.2f} (probe)", file=sys.stderr, flush=True)
        emit("probe")
        if p >= TARGET_DB:
            full = eval_full()
            if full >= TARGET_DB:
                seconds_to_target = train_elapsed
                headline_psnr = full
                emit("full")
                break

    # final full-protocol eval supersedes the probe headline
    eval_kind = "probe"
    try:
        with _alarm(900):
            full = eval_full()
        extras["final_full_psnr"] = round(full, 2)
        headline_psnr = full
        eval_kind = "full"
    except Exception as e:  # noqa: BLE001
        extras["final_eval_error"] = str(e)[:120]
    emit(eval_kind)
    return _result(extras, eval_kind)


def bench_render_fox():
    """Render throughput + agreement on a PRE-TRAINED fox snapshot
    (data/fox_1536.ingp, built by scripts/train_fox_snapshot.py) —
    decoupled from the training phase so render numbers land under the
    driver even if training is killed (VERDICT r4 item 2). Measures the
    reference's interactive regime (testbed_nerf.cu:1894-2150): exact
    compact-loop, baked-cache, and slab-sweep paths at 256² and 1080p.
    Prints a cumulative JSON line after EVERY measurement."""
    from instant_ngp_tpu.testbed import Testbed

    out = {"snapshot": "data/fox_1536.ingp"}

    def emit():
        print(json.dumps(out), flush=True)

    if not Path(SNAP).exists():
        out["error"] = "snapshot missing"
        emit()
        return out

    t0 = time.time()
    tb = Testbed("nerf")
    tb.load_snapshot(SNAP)
    task = tb.task
    ds = tb.nerf_dataset
    out["load_s"] = round(time.time() - t0, 1)
    out["step"] = task.training_step
    v = 0
    w, h = ds.resolution
    xf = np.asarray(ds.xforms_start[v], np.float32)

    def kw_for(rw, rh, **extra):
        return dict(
            focal_length=(ds.focal_lengths[v, 0] * rw / w,
                          ds.focal_lengths[v, 1] * rh / h),
            principal_point=tuple(ds.principal_points[v]),
            background=(0, 0, 0, 0), **extra)

    def rays_per_s(rw, rh, **extra):
        kw = kw_for(rw, rh, **extra)
        task.render(rw, rh, xf, **kw)  # compile + warm
        t = time.time()
        task.render(rw, rh, xf, **kw)
        return round(rw * rh / (time.time() - t) / 1e6, 4)

    def agree(a, b):
        mse = float(np.mean((np.clip(a[..., :3], 0, 1)
                             - np.clip(b[..., :3], 0, 1)) ** 2))
        return round(-10 * np.log10(max(mse, 1e-10)), 2)

    img_exact = None
    try:
        with _alarm(900):
            out["exact_256"] = rays_per_s(256, 256)
            img_exact = np.asarray(
                task.render(256, 256, xf, **kw_for(256, 256)))
            emit()
    except Exception as e:  # noqa: BLE001
        out["exact_error"] = str(e)[:120]
        emit()
        return out  # a hung device won't recover below
    try:
        with _alarm(900):
            t = time.time()
            task._get_baked(origin=xf[:, 3])
            out["bake_s"] = round(time.time() - t, 2)
            out["baked_256"] = rays_per_s(256, 256, render_quality="baked")
            out["baked_1080p"] = rays_per_s(1920, 1080,
                                            render_quality="baked")
            emit()
    except Exception as e:  # noqa: BLE001
        out["baked_error"] = str(e)[:120]
        emit()
    try:
        with _alarm(900):
            t = time.time()
            task._get_slab(eye=xf[:, 3])
            out["slab_bake_s"] = round(time.time() - t, 2)
            out["slab_256"] = rays_per_s(256, 256, render_quality="slab")
            # uint8 device-side quantize = the viewer-realistic frame copy
            out["slab_1080p"] = rays_per_s(1920, 1080, render_quality="slab",
                                           out_uint8=True)
            emit()
            # default = deferred view dependence (one bake, every
            # camera: slab.make_deferred_decode) — the interactive mode
            img_s = np.asarray(task.render(256, 256, xf,
                                           **kw_for(256, 256,
                                                    render_quality="slab")))
            out["slab_vs_exact_psnr"] = agree(img_exact, img_s)
            emit()
            # ablation: diffuse-only bake (round-4 default, 11.85 dB)
            task.slab_deferred_vd = False
            task._slab_cache = None
            img_d0 = np.asarray(task.render(256, 256, xf,
                                            **kw_for(256, 256,
                                                     render_quality="slab")))
            task.slab_deferred_vd = True
            task._slab_cache = None
            out["slab_vs_exact_psnr_diffuse"] = agree(img_exact, img_d0)
            emit()
            # apples-to-apples ceiling: per-camera view-dependent bake
            task.slab_bake_view_dependent = True
            img_v = np.asarray(task.render(256, 256, xf,
                                           **kw_for(256, 256,
                                                    render_quality="slab")))
            task.slab_bake_view_dependent = False
            out["slab_vs_exact_psnr_vd"] = agree(img_exact, img_v)
            emit()
    except Exception as e:  # noqa: BLE001
        out["slab_error"] = str(e)[:120]
        emit()
    return out


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


def bench_selftest():
    """Orchestration test phase (BENCH_ONLY=selftest): prints a JSON
    line immediately, then sleeps — lets tests verify that a kill at
    any moment leaves the streamed emission on the orchestrator's
    stdout. Imports nothing heavy."""
    print(json.dumps({"selftest": "alive", "pid": os.getpid()}), flush=True)
    time.sleep(float(os.environ.get("BENCH_SELFTEST_SLEEP_S", 600)))
    return {"selftest": "finished"}


PHASES = {
    # name -> (callable name, subprocess timeout seconds). Order is the
    # execution order: fox (the headline) first, then the snapshot
    # render phase, then extras CHEAPEST-FIRST so a driver kill at any
    # depth keeps the maximum number of captured phases (VERDICT r4
    # item 5: the non-fox phases had never executed under the driver).
    # The fox cap is 1500 s, NOT unbounded: with streaming emissions a
    # truncated fox still leaves its best headline, and the cap
    # guarantees later phases get device time inside BENCH_TOTAL_S.
    "fox": ("bench_fox", 1500),
    "render_fox": ("bench_render_fox", 900),
    "image_albert": ("bench_albert", 420),
    "volume_blob": ("bench_volume", 600),
    "sdf_armadillo": ("bench_sdf", 900),
    "synthetic_box": ("bench_synthetic", 900),
    "gigapixel": ("bench_gigapixel", 900),
    "selftest": ("bench_selftest", 120),  # only runs via BENCH_ONLY
}


def orchestrate():
    """Run each bench phase in its OWN subprocess, strictly
    sequentially. The tunneled TPU admits exactly one client process
    (concurrent clients deadlock on the chip lock), and a worker crash
    kills every later dispatch in the same process — isolating phases
    means one crash costs one phase, and each child can execv-retry
    itself (see main's UNAVAILABLE handler). The orchestrator itself
    never touches the device.

    Child stdout is STREAMED line-by-line through a reader thread; each
    JSON line immediately updates the merged headline on the
    orchestrator's own stdout. A driver kill at any instant therefore
    loses at most the work since the child's last emission — never the
    round (rounds 2-4's failure mode: subprocess.PIPE buffered the
    child's output until phase completion)."""
    import subprocess

    t_start = time.time()
    # hard wall-clock budget for the WHOLE bench: the driver kills a
    # run that overstays — stop STARTING phases well before that
    total_budget = float(os.environ.get("BENCH_TOTAL_S", 2700))
    only = os.environ.get("BENCH_ONLY")
    phase_list = ([p.strip() for p in only.split(",") if p.strip()]
                  if only else [p for p in PHASES if p != "selftest"])

    def wait_device(attempts=3):
        """Probe the TPU with a throwaway subprocess until it answers.
        The worker reliably crashes on the FIRST dispatch of a fresh
        process after a heavy process exits — a probe absorbs that
        crash so the next real phase starts on a healthy worker.
        CAPPED: an unresponsive tunnel must not eat the driver budget
        (round 3 died in exactly this loop)."""
        probe = "import jax, jax.numpy as jnp; print(float(jnp.ones(8).sum()))"
        for i in range(attempts):
            try:
                # a fresh process absorbing a worker crash can take
                # >4 min to its first dispatch (measured 256 s)
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

    merged = {}
    extras = {}
    lock = threading.Lock()

    def emit_locked():
        """Print the best-known merged headline NOW (caller holds
        lock). The driver takes the last parseable line, so each
        emission strictly supersedes the previous one."""
        if "metric" in merged:
            m = dict(merged)
        else:
            m = {"metric": "bench_pending", "value": 0.0, "unit": "none",
                 "vs_baseline": 0.0,
                 "error": merged.get("error", "fox phase pending")}
        m["extra"] = {**m.get("extra", {}), **extras}
        print(json.dumps(m), flush=True)

    with lock:
        emit_locked()  # t=0: a kill at ANY later moment leaves ≥ this

    def reader(pipe, phase):
        for ln in pipe:
            ln = ln.strip()
            if not ln.startswith("{"):
                continue
            try:
                out = json.loads(ln)
            except json.JSONDecodeError:
                continue
            with lock:
                if phase == "fox":
                    merged.clear()
                    merged.update(out)
                else:
                    extras[phase] = out
                emit_locked()

    first = True
    status = {}
    extras["phase_status"] = status
    for phase in phase_list:
        if phase != "fox" and not Path(FOX).exists():
            continue  # image fallback mode: single phase only
        elapsed = time.time() - t_start
        if not first and elapsed + 120 > total_budget:
            print(f"# bench budget spent ({elapsed:.0f}s); skipping {phase}+",
                  file=sys.stderr, flush=True)
            status[phase] = "skipped: budget"
            continue
        if not first and phase != "selftest" and not wait_device():
            print("# device unresponsive; stopping with captured results",
                  file=sys.stderr, flush=True)
            status[phase] = "skipped: device unresponsive"
            break
        first = False
        env = dict(os.environ, BENCH_PHASE=phase, BENCH_RETRIED="0")
        # never let one phase overrun the global budget
        tmo = int(min(PHASES.get(phase, (None, 900))[1],
                      max(120, total_budget - (time.time() - t_start))))
        if os.environ.get("BENCH_PHASE_TMO"):  # test hook
            tmo = min(tmo, int(os.environ["BENCH_PHASE_TMO"]))
        t_ph = time.time()
        try:
            p = subprocess.Popen(
                [sys.executable, __file__], env=env,
                stdout=subprocess.PIPE, text=True, start_new_session=True)
        except Exception as e:  # noqa: BLE001
            status[phase] = f"spawn failed: {e}"[:120]
            continue
        th = threading.Thread(target=reader, args=(p.stdout, phase),
                              daemon=True)
        th.start()
        try:
            rc = p.wait(timeout=tmo)
            status[phase] = "ok" if rc == 0 else f"rc={rc}"
        except subprocess.TimeoutExpired:
            try:
                os.killpg(os.getpgid(p.pid), signal.SIGKILL)
            except (ProcessLookupError, PermissionError):
                p.kill()
            status[phase] = f"killed at {tmo}s (captured results kept)"
        th.join(timeout=15)
        with lock:
            status[phase] += f" [{time.time()-t_ph:.0f}s]"
            emit_locked()
    with lock:
        emit_locked()


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
