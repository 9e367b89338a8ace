"""DaemonStream analog: a re-running wrapper around a stream.

Reference semantics (``solr/solrj/src/java/org/apache/solr/client/solrj/
io/stream/DaemonStream.java:39``): ``daemon(id=.., runInterval=..,
<inner>)`` wraps an inner stream expression and a daemon thread re-opens
and drains it every ``runInterval`` ms, tracking iteration count and
state; the admin API lists/stops daemons. The canonical use is
``daemon(update(idx, topic(...)))`` — push-style incremental indexing.

Here the inner stream is any zero-arg callable returning a
``ray.data.Dataset`` (e.g. a ``streaming_expr.evaluate`` closure or an
``update_index`` run over a checkpointed topic source). ``run(n)`` is
the deterministic synchronous path used by tests and drivers; ``start``
spawns the daemon thread exactly like the reference. The Ray work all
happens inside the inner callable — the daemon holds no data, so a
driver can keep hundreds of them while every iteration streams through
the cluster."""

from __future__ import annotations

import threading
import time
from typing import Any, Callable


_REGISTRY: dict[str, "DaemonStream"] = {}


class DaemonStream:
    def __init__(self, daemon_id: str, inner: Callable[[], Any],
                 run_interval_ms: int = 1000,
                 on_result: Callable[[Any], None] | None = None):
        self.daemon_id = daemon_id
        self.inner = inner
        self.run_interval_ms = run_interval_ms
        self.on_result = on_result
        self.iterations = 0
        self.state = "STOPPED"
        self.last_exception: str | None = None
        self.last_result: Any = None
        self._stop = threading.Event()
        self._thread: threading.Thread | None = None
        _REGISTRY[daemon_id] = self

    # -- synchronous path (deterministic; used by tests/drivers) --------
    def run_once(self) -> Any:
        try:
            out = self.inner()
            self.last_result = out
            if self.on_result is not None:
                self.on_result(out)
            self.last_exception = None
            return out
        except Exception as ex:  # reference daemons record + keep going
            self.last_exception = f"{type(ex).__name__}: {ex}"
            return None
        finally:
            self.iterations += 1

    def run(self, n: int) -> Any:
        for _ in range(n):
            out = self.run_once()
        return out

    # -- daemon-thread path (DaemonStream.open/close semantics) ---------
    def start(self) -> None:
        if self._thread is not None and self._thread.is_alive():
            return
        self._stop.clear()
        self.state = "RUNNING"

        def loop():
            while not self._stop.is_set():
                self.run_once()
                self._stop.wait(self.run_interval_ms / 1000.0)
            self.state = "STOPPED"

        self._thread = threading.Thread(
            target=loop, name=f"daemon-{self.daemon_id}", daemon=True)
        self._thread.start()

    def stop(self, timeout: float = 10.0) -> None:
        self._stop.set()
        if self._thread is not None:
            self._thread.join(timeout)
        self.state = "STOPPED"

    def status(self) -> dict:
        """The admin 'list' row (id/state/iterations, DaemonStream's
        getInfo)."""
        return {"id": self.daemon_id, "state": self.state,
                "iterations": self.iterations,
                "exception": self.last_exception}


def list_daemons() -> list[dict]:
    return [d.status() for d in _REGISTRY.values()]


def get_daemon(daemon_id: str) -> DaemonStream | None:
    return _REGISTRY.get(daemon_id)


def kill_daemon(daemon_id: str) -> bool:
    d = _REGISTRY.pop(daemon_id, None)
    if d is None:
        return False
    d.stop()
    return True
