"""Enable persistent XLA compilation cache (importable side-effect module).

TPU executables are compiled for the chip and port across hosts, so
they share one directory. CPU entries are AOT-compiled for the exact
host CPU feature set and SIGILL when the repo (and its cache dir)
moves to a machine with different features — scope them to a
per-CPU-model subdirectory. Import AFTER setting jax_platforms (the
dryrun children and tests flip to "cpu" first).
"""
import jax


def _cache_dir() -> str:
    base = "/root/repo/.jax_cache"
    plats = [p for p in str(jax.config.jax_platforms or "").split(",") if p]
    if plats != ["cpu"]:
        # a real accelerator is (or may be) in play — its executables
        # target the chip and port across hosts; share one directory
        return base
    import hashlib
    import platform

    try:
        with open("/proc/cpuinfo") as f:
            lines = f.read().splitlines()
        # the flags line is the actual feature set the AOT code targets
        model = next(
            (ln for ln in lines if ln.startswith("flags")),
            next((ln for ln in lines if ln.startswith("model name")),
                 platform.processor()),
        )
    except OSError:
        model = platform.processor() or platform.machine()
    return f"{base}/cpu-{hashlib.md5(model.encode()).hexdigest()[:8]}"


jax.config.update("jax_compilation_cache_dir", _cache_dir())
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
