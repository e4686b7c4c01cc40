"""Bounded TPU-tunnel liveness probe.

Exit 0 and print ALIVE if the default (axon) backend answers a trivial
op within the deadline; exit 1 and print DEAD otherwise.  The probe
thread is a daemon and is never interrupted — killing a client
mid-claim is the documented tunnel-wedge trigger (CLAUDE.md), so on
timeout we stop waiting rather than kill.  Same pattern as
bench._device_probe.

Usage: python scripts/probe_tpu.py [deadline_seconds=120]
"""

import sys
import threading

ok = []


def _probe():
    try:
        import jax.numpy as jnp

        val = float(jnp.sum(jnp.ones(8)))
        if val == 8.0:
            ok.append(True)
    except Exception as e:  # noqa: BLE001 - diagnostics only
        print(f"probe error: {e!r}", file=sys.stderr)


def main() -> int:
    deadline = float(sys.argv[1]) if len(sys.argv) > 1 else 120.0
    t = threading.Thread(target=_probe, daemon=True)
    t.start()
    t.join(deadline)
    print("ALIVE" if ok else "DEAD")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
