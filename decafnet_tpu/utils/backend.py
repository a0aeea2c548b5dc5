"""Backend-claim watchdog shared by the CLIs and bench.

The axon chip claim is a blocking native call inside the first
``jax.default_backend()`` / ``jax.devices()`` of a process. When the
terminal/relay side is wedged (observed: 8+ h after a SIGTERM landed
mid-TPU-compile), that call never returns and cannot be interrupted by a
signal -- a CLI stuck there hangs the driver forever with no error.

``resolve_backend_or_exit`` runs the resolution in a daemon thread and
joins with a timeout (``DECAFNET_CLAIM_TIMEOUT_S``, default 600 s -- a
healthy claim resolves in seconds), exiting with a diagnosis instead of
hanging. Used by bench.require_tpu and called at startup by train.py /
eval.py / serve.py before any device work.
"""

import os
import threading


def resolve_backend_or_exit(timeout=None):
    """Resolve ``jax.default_backend()`` under a watchdog; exit on wedge.

    Returns the backend name ('tpu' | 'cpu' | ...). Re-raises any
    resolution error (e.g. transient axon lease races) on the caller's
    thread so callers can implement their own retry policy.
    """
    import jax

    if timeout is None:
        timeout = float(os.environ.get("DECAFNET_CLAIM_TIMEOUT_S", 600))
    out = {}

    def _resolve():
        try:
            out["backend"] = jax.default_backend()
        except BaseException as e:  # noqa: BLE001 -- re-raised below
            out["err"] = e

    th = threading.Thread(target=_resolve, daemon=True)
    th.start()
    th.join(timeout)
    if th.is_alive():
        raise SystemExit(
            f"axon backend init wedged (> {timeout:.0f}s inside the "
            "chip-claim call; a healthy claim resolves in seconds). "
            "The terminal/tunnel side is stuck -- restart the "
            "environment or wait for the lease to clear; retrying "
            "in-process cannot help (connection options are fixed "
            "for process lifetime).")
    if "err" in out:
        raise out["err"]
    return out["backend"]
