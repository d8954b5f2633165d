"""Train fox for N steps on the TPU and save a snapshot for render
benchmarks (bench_slab.py, bench_baked.py). Usage:
    python scripts/train_fox_snapshot.py [n_steps] [out_path]
"""
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
try:
    import _jaxcache  # noqa: F401
except Exception:
    pass

import numpy as np  # noqa: F401


def main():
    n_steps = int(sys.argv[1]) if len(sys.argv) > 1 else 1536
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/fox_r4.ingp"
    from instant_ngp_tpu.config import load_network_config
    from instant_ngp_tpu.testbed import Testbed

    # the bench.py fox headline config (simplex interpolation)
    tb = Testbed("nerf")
    tb.network_config = load_network_config("base.json", mode="nerf")
    tb.network_config.setdefault("encoding", {})["interpolation"] = "Simplex"
    tb.load_training_data("/root/reference/data/nerf/fox")
    task = tb.task
    t0 = time.time()
    done = 0
    while done < n_steps:
        task.train(128)
        done += 128
        print(f"# step {task.training_step} t={time.time()-t0:.1f}s "
              f"loss={task._loss_ema or 0}", file=sys.stderr, flush=True)
    tb.save_snapshot(out, include_optimizer_state=False)
    print(f"# saved {out} at step {task.training_step}",
          file=sys.stderr, flush=True)


if __name__ == "__main__":
    try:
        main()
    except Exception as e:  # noqa: BLE001
        import traceback

        traceback.print_exc(file=sys.stderr)
        tries = int(os.environ.get("SNAP_RETRIED", "0"))
        if "UNAVAILABLE" in str(e) and tries < 6:
            wait = min(60 * (tries + 1), 300)
            print(f"# TPU unavailable — retry {tries+1}/6 after {wait}s",
                  file=sys.stderr, flush=True)
            time.sleep(wait)
            os.environ["SNAP_RETRIED"] = str(tries + 1)
            os.execv(sys.executable, [sys.executable] + sys.argv)
        raise
