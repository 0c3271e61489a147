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


@atexit.register
def _cleanup() -> None:
    while _dirs:
        shutil.rmtree(_dirs.pop(), ignore_errors=True)
