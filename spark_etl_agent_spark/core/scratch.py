"""Per-call scratch directories with stale-sibling reaping.

Several registry queries stage micro-batches or artifact tables under a
``tempfile.mkdtemp`` workdir and return a frame that lazily reads from
it, so the directory cannot be deleted inside the call (the driver
collects the frame afterwards). Without a reaper, repeated bench /
parity runs accumulate unbounded /tmp copies of the staged tables.

``scratch_dir`` reaps SAME-PREFIX siblings older than ``max_age_s``
(mtime-based) before creating the new dir: an in-flight plan's workdir
is seconds old and is never touched, while yesterday's bench leftovers
are reclaimed. Queries that CAN delete eagerly (bounded audit outputs)
do so instead via ``queries/lifecycle.py::_materialize_and_cleanup``.
"""

from __future__ import annotations

import os
import shutil
import tempfile
import time


def scratch_dir(prefix: str, max_age_s: float = 86400.0) -> str:
    """Create a fresh ``/tmp`` scratch dir with ``prefix``, first
    removing stale same-prefix siblings (mtime older than
    ``max_age_s``). Reap errors are swallowed — a half-removed stale
    dir only means less space reclaimed, never a failed query.

    The default age is 24 h, deliberately far above any realistic
    bench/parity session: a long run (>1 h at larger SFs) can hold a
    lazy frame that still reads from its staged scratch tables, and a
    concurrent same-prefix invocation must never reap those mid-run.
    The reaper targets yesterday's leftovers, not today's work."""
    parent = tempfile.gettempdir()
    cutoff = time.time() - max_age_s
    try:
        for name in os.listdir(parent):
            if not name.startswith(prefix):
                continue
            path = os.path.join(parent, name)
            try:
                if os.path.isdir(path) and os.path.getmtime(path) < cutoff:
                    shutil.rmtree(path, ignore_errors=True)
            except OSError:
                continue
    except OSError:
        pass
    return tempfile.mkdtemp(prefix=prefix)
