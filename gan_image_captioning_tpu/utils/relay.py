"""Wedge probe for the tunneled-TPU (axon) relay.

The accelerator sitecustomize registers the tunneled-TPU PJRT plugin
whenever ``PALLAS_AXON_POOL_IPS`` is set; a wedged relay then hangs EVERY
backend init (``make_c_api_client`` never returns) — so anything that must
not hang (the driver's bench capture, compile checks) probes backend init
in a SUBPROCESS with a timeout first and degrades to CPU on failure.

Stdlib-only: safe to import before the first jax backend use.
"""

from __future__ import annotations

import os
import subprocess
import sys
import time

# First init over the tunnel is slow on a healthy relay — a conservative
# first-attempt budget avoids misclassifying slow-but-healthy as wedged
# (both bench.py and __graft_entry__ share this policy; they diverged once
# and a 130s healthy init would have silently downgraded the compile check)
FIRST_TIMEOUT_S = 150
RETRY_TIMEOUT_S = 75
RETRY_SLEEP_S = 45


def probe_relay(attempts: int = 2, log=None) -> bool:
    """True iff a subprocess jax backend init succeeds — or no axon plugin
    is registered at all (nothing to hang on).  Retries because wedges can
    clear; each failed attempt sleeps ``RETRY_SLEEP_S``.

    The happy path costs one duplicate backend init (~10-60 s over the
    tunnel) — deliberately accepted: a hang at capture time is
    catastrophic, one extra init amortized against multi-minute Pallas
    compiles is not.
    """
    if not os.environ.get("PALLAS_AXON_POOL_IPS"):
        return True
    for i in range(attempts):
        timeout = FIRST_TIMEOUT_S if i == 0 else RETRY_TIMEOUT_S
        try:
            r = subprocess.run(
                [sys.executable, "-c",
                 "import jax; jax.devices(); print('RELAY_OK')"],
                timeout=timeout, capture_output=True, text=True)
            if r.returncode == 0 and "RELAY_OK" in r.stdout:
                return True
            if log:
                log(f"relay probe {i + 1}/{attempts} failed "
                    f"(rc={r.returncode})")
        except subprocess.TimeoutExpired:
            if log:
                log(f"relay probe {i + 1}/{attempts} timed out ({timeout}s)")
        if i + 1 < attempts:
            time.sleep(RETRY_SLEEP_S)
    return False
