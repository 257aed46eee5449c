"""Background-compile thread lifecycle.

Daemon threads that trace/compile JAX graphs (the speculative guard's
AOT fallback warm, agents/infinisst.py and serve/engine.py) must not be
left running into interpreter shutdown: CPython terminates daemon
threads by forced unwind the next time they touch the GIL, and a forced
unwind crossing XLA's C++ frames aborts the whole process
("terminate called ... FATAL: exception not rethrown", rc 134) —
observed on the multichip dryrun, whose speculative pool ticks start a
fallback warm and exit immediately after.

``spawn`` starts the thread and registers a single ``atexit`` hook that
joins whatever warm threads are still alive, while the interpreter can
still run them to completion.  The join is unbounded by design: an
in-flight XLA compile cannot be cancelled, and aborting the process is
strictly worse than finishing the compile.  In practice the window is
tiny — warm threads start at the first below-break-even chunk and a
process exiting that early has nothing else to wait for.
"""

from __future__ import annotations

import atexit
import threading
from typing import Callable, List

_lock = threading.Lock()
_threads: List[threading.Thread] = []
_registered = False


def _join_live() -> None:
    with _lock:
        live = [t for t in _threads if t.is_alive()]
        _threads.clear()
    for t in live:
        t.join()


def spawn(target: Callable[[], None], name: str) -> threading.Thread:
    """Start ``target`` in a daemon thread that is joined at exit."""
    global _registered
    t = threading.Thread(target=target, daemon=True, name=name)
    with _lock:
        if not _registered:
            atexit.register(_join_live)
            _registered = True
        _threads[:] = [x for x in _threads if x.is_alive()]
        _threads.append(t)
    t.start()
    return t
