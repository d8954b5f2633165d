"""Enable persistent XLA compilation cache (importable side-effect module).

TPU executables are compiled for the chip and port across hosts, so
they share one directory. CPU entries are AOT-compiled for the exact
host CPU feature set and SIGILL when the repo (and its cache dir)
moves to a machine with different features — scope them to a
per-CPU-model subdirectory. Import AFTER setting jax_platforms (the
dryrun children and tests flip to "cpu" first).
"""
import jax


def _cpu_fingerprint() -> str:
    """A string that changes whenever the host CPU's AOT feature set
    could change. x86 exposes `flags`, ARM exposes `Features`; when
    neither is present fall back to arch + processor so distinct
    architectures at least never share a bucket."""
    import platform

    try:
        with open("/proc/cpuinfo") as f:
            lines = f.read().splitlines()
        for prefix in ("flags", "Features", "model name"):
            for ln in lines:
                if ln.startswith(prefix):
                    return ln
    except OSError:
        pass
    return f"{platform.machine()}|{platform.processor()}"


def _accelerator_plugin_installed() -> bool:
    """True when a PJRT accelerator plugin (TPU/axon/GPU) is installed —
    with jax_platforms unset, such a host resolves to the accelerator,
    whose executables are portable and should share the base dir."""
    try:
        from importlib.metadata import entry_points

        return len(entry_points(group="jax_plugins")) > 0
    except Exception:  # noqa: BLE001 — any metadata failure ⇒ assume CPU
        return False


def _cache_dir() -> str:
    base = "/root/repo/.jax_cache"
    plats = [p for p in str(jax.config.jax_platforms or "").split(",") if p]
    if plats and plats != ["cpu"]:
        # an accelerator platform is explicitly in play — its
        # executables target the chip and port across hosts; share one
        # directory
        return base
    if not plats and _accelerator_plugin_installed():
        # unset on an accelerator host: the resolved backend is the
        # accelerator; keep prior rounds' TPU entries warm
        return base
    # CPU-only (explicitly, or no accelerator available): AOT entries
    # target this exact CPU feature set — scope per CPU model so a
    # repo move can never SIGILL on stale foreign-CPU executables
    import hashlib

    return f"{base}/cpu-{hashlib.md5(_cpu_fingerprint().encode()).hexdigest()[:8]}"


jax.config.update("jax_compilation_cache_dir", _cache_dir())
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
