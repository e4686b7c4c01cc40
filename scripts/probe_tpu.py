"""Bounded TPU-tunnel liveness probe.

Exit 0 and print ALIVE if the default (axon) backend answers a trivial
op within the deadline; exit 1 and print DEAD otherwise.

The op runs in a CHILD PROCESS whose main thread does the op and exits
normally.  Tunnel facts measured 2026-08-19 (revising earlier lore):

- A probe that runs the op in a daemon THREAD poisons its own exit —
  the interpreter tears the axon client down while the worker thread's
  state is live and the process dies with SIGABRT ("terminate called
  after throwing").  Main-thread op, clean exit = clean tunnel.
- A client that hangs at its first device op NEVER recovers, and it
  BLOCKS every subsequent client until it is killed.  Abandoning a hung
  child (the old "never kill mid-claim" policy) therefore converts a
  transient hang into a persistent wedge — observed live: an orphaned
  probe child blocked all successors for 6+ minutes; killing it freed
  the tunnel for NEW clients (already-hung ones stay hung and must be
  killed too).  So on timeout we KILL the child and report DEAD; the
  recovery recipe is: kill every hung client (by explicit PID, never by
  pattern), wait ~30-60 s, reconnect.

Usage: python scripts/probe_tpu.py [deadline_seconds=120]
"""

import subprocess
import sys
import time

_CHILD = (
    "import jax.numpy as jnp; "
    "assert float(jnp.sum(jnp.ones(8))) == 8.0"
)


def probe(deadline: float) -> bool:
    child = subprocess.Popen(
        [sys.executable, "-c", _CHILD],
        stdout=subprocess.DEVNULL,
        stderr=subprocess.DEVNULL,
    )
    t_end = time.monotonic() + deadline
    while time.monotonic() < t_end:
        rc = child.poll()
        if rc is not None:
            return rc == 0
        time.sleep(0.5)
    # Hung at claim: kill it — an abandoned hung client blocks every
    # later client indefinitely (see module docstring).
    child.kill()
    try:
        child.wait(timeout=10)
    except subprocess.TimeoutExpired:
        pass
    return False


def main() -> int:
    deadline = float(sys.argv[1]) if len(sys.argv) > 1 else 120.0
    ok = probe(deadline)
    print("ALIVE" if ok else "DEAD")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
