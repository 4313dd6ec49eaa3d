"""Run-reproducibility helpers (reference: util/files.py:59-84 copy_src)."""

from __future__ import annotations

import os
import subprocess
import time
import zipfile


def is_main_process() -> bool:
    """True on the host that owns run-directory side effects.

    The reference is single-host so every write is unconditional; under
    multi-host JAX, N processes would duplicate work and collide on shared
    storage (source zips, config.json, loss_log.txt, HTML dashboard,
    iter.txt, eval history).  All such writers are guarded with this —
    Orbax checkpointing is NOT (it runs its own multi-host protocol and
    must be called from every process)."""
    import jax

    return jax.process_index() == 0


def copy_src(run_dir: str, src_root: str = None) -> str:
    """Zip the framework sources into the run directory, like the
    reference's `copy_src` snapshot — plus the git revision when available."""
    src_root = src_root or os.path.dirname(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))))
    os.makedirs(run_dir, exist_ok=True)
    ts = time.strftime("%Y%m%d-%H%M%S")
    path = os.path.join(run_dir, f"src_{ts}.zip")
    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as zf:
        for root, dirs, files in os.walk(src_root):
            dirs[:] = [d for d in dirs
                       if d not in ("__pycache__", ".git", "checkpoints",
                                    "results", ".pytest_cache")]
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    zf.write(full, os.path.relpath(full, src_root))
        try:
            rev = subprocess.run(["git", "rev-parse", "HEAD"],
                                 cwd=src_root, capture_output=True,
                                 text=True, timeout=5).stdout.strip()
            zf.writestr("GIT_REVISION.txt", rev + "\n")
        except Exception:  # noqa: BLE001
            pass
    return path
