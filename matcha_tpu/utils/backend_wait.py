"""Ride out a transiently-unavailable TPU backend.

A wedged chip grant (documentation/dev-notes.md "TPU access") clears
server-side on its own, but a failed PJRT init is cached for the life of
the process — so retry via fresh CHILD probes and let the caller proceed
in-process only once one succeeds.  Used by bench.py and
__graft_entry__.entry() so the driver's round-end surfaces survive a grant
that would have cleared a minute later.
"""

from __future__ import annotations

import os
import subprocess
import sys
import time


def wait_for_backend(env_var: str = "BENCH_WAIT_BACKEND_S") -> None:
    """Block until a child ``jax.devices()`` probe succeeds.

    Budgeted by ``env_var`` seconds (default 900; 0 disables).  On budget
    exhaustion just return — the caller's normal flow then raises the real
    error for the log.
    """
    budget = float(os.environ.get(env_var, "900"))
    t0 = time.time()
    while budget > 0:
        try:
            probe = subprocess.run(
                [sys.executable, "-c", "import jax; jax.devices()"],
                capture_output=True,
                timeout=180,
            )
            if probe.returncode == 0:
                return
            err = probe.stderr.decode(errors="replace").strip().splitlines()
            err = err[-1] if err else "?"
        except subprocess.TimeoutExpired:
            err = "init probe timed out (backend hang)"
        waited = time.time() - t0
        if waited > budget:
            print(
                f"# backend still unavailable after {waited:.0f}s; "
                "proceeding (will fail with the real error)",
                file=sys.stderr,
            )
            return
        print(f"# backend unavailable ({err}); retrying in 60s", file=sys.stderr)
        time.sleep(60)
