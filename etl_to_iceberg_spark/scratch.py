"""Process-scoped scratch directories with atexit cleanup.

Every registry query that needs a private warehouse / source layout /
checkpoint dir used to call ``tempfile.mkdtemp`` directly; each process
run left its trees behind in /tmp — bounded per process, unbounded
across bench/driver invocations (ADVICE r6). Routing them through
:func:`scratch_dir` keeps the per-process caching patterns intact
(callers still hold the returned path for the process lifetime) while
an ``atexit`` hook removes every tree when the process exits normally.

A killed process (fault-injection tests) still leaks its dirs — that is
inherent to kill -9 and acceptable; the steady-state producers are the
bench/driver loops, which exit normally.
"""

from __future__ import annotations

import atexit
import shutil
import tempfile

_dirs: list[str] = []


def scratch_dir(prefix: str) -> str:
    """mkdtemp registered for removal at interpreter exit."""
    d = tempfile.mkdtemp(prefix=prefix)
    _dirs.append(d)
    return d


def register_cleanup(path: str) -> None:
    """Register an externally created path (e.g. a FIXED-name oracle
    sidecar dir whose path must be embeddable in a static SQL string)
    for the same atexit removal. Idempotent."""
    if path not in _dirs:
        _dirs.append(path)


@atexit.register
def _cleanup() -> None:
    while _dirs:
        shutil.rmtree(_dirs.pop(), ignore_errors=True)
