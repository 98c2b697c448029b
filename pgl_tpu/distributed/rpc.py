"""Minimal length-prefixed TCP RPC used by the distributed graph service.

The reference's graph engine speaks brpc from C++ (``pgl/distributed/
dist_graph.py:124``); on TPU pods the hosts are trusted peers on a private
network, so a compact numpy-aware pickle protocol over TCP sockets is the
pragmatic host-side transport. Each request is ``(method, args, kwargs)``;
each response ``(ok, payload)``.
"""

from __future__ import annotations

import pickle
import socket
import socketserver
import struct
import threading
import traceback
from typing import Any, Callable, Tuple

__all__ = ["RpcServer", "RpcClient"]

_HDR = struct.Struct(">I")


def _send_msg(sock: socket.socket, obj: Any):
    payload = pickle.dumps(obj, protocol=pickle.HIGHEST_PROTOCOL)
    sock.sendall(_HDR.pack(len(payload)) + payload)


def _recv_exact(sock: socket.socket, n: int) -> bytes:
    buf = bytearray()
    while len(buf) < n:
        chunk = sock.recv(n - len(buf))
        if not chunk:
            raise ConnectionError("peer closed")
        buf.extend(chunk)
    return bytes(buf)


def _recv_msg(sock: socket.socket) -> Any:
    (n,) = _HDR.unpack(_recv_exact(sock, _HDR.size))
    return pickle.loads(_recv_exact(sock, n))


class _Handler(socketserver.BaseRequestHandler):
    def handle(self):
        while True:
            try:
                method, args, kwargs = _recv_msg(self.request)
            except (ConnectionError, EOFError):
                return
            try:
                fn = getattr(self.server.service, method)
                _send_msg(self.request, (True, fn(*args, **kwargs)))
            except Exception:
                _send_msg(self.request, (False, traceback.format_exc()))


class _ThreadedServer(socketserver.ThreadingTCPServer):
    allow_reuse_address = True
    daemon_threads = True


class RpcServer:
    """Serves a service object's public methods over TCP."""

    def __init__(self, service, host: str = "127.0.0.1", port: int = 0):
        self._server = _ThreadedServer((host, port), _Handler)
        self._server.service = service
        self.host, self.port = self._server.server_address
        self._thread = threading.Thread(target=self._server.serve_forever,
                                        daemon=True)

    def start(self):
        self._thread.start()
        return self

    def stop(self):
        self._server.shutdown()
        self._server.server_close()


class RpcClient:
    """Blocking single-connection client (one per worker thread/process).

    Every call runs under a deadline (``timeout`` seconds, overridable
    per-call) so a wedged server raises instead of blocking the trainer
    forever; transport failures are retried ``retries`` times over a fresh
    connection (the request is only retried whole, so methods should be
    idempotent — all graph-engine reads are).
    """

    def __init__(self, address: str, timeout: float = 60.0,
                 retries: int = 2, retry_wait: float = 0.5):
        host, port = address.rsplit(":", 1)
        self._addr = (host, int(port))
        self._timeout = timeout
        self._retries = max(int(retries), 0)
        self._retry_wait = retry_wait
        self._sock = socket.create_connection(self._addr, timeout=timeout)
        self._lock = threading.Lock()

    def _reconnect(self):
        try:
            self._sock.close()
        except OSError:
            pass
        self._sock = socket.create_connection(self._addr,
                                              timeout=self._timeout)

    def call(self, method: str, *args, timeout: float = None, **kwargs):
        deadline = timeout if timeout is not None else self._timeout
        last_err = None
        with self._lock:
            for attempt in range(self._retries + 1):
                try:
                    self._sock.settimeout(deadline)
                    _send_msg(self._sock, (method, args, kwargs))
                    ok, payload = _recv_msg(self._sock)
                    break
                except (ConnectionError, socket.timeout, OSError) as err:
                    last_err = err
                    if attempt == self._retries:
                        raise TimeoutError(
                            f"rpc {method} to {self._addr} failed after "
                            f"{attempt + 1} attempts: {err!r}") from err
                    import time
                    time.sleep(self._retry_wait)
                    self._reconnect()
        if not ok:
            raise RuntimeError(f"remote {method} failed:\n{payload}")
        return payload

    def close(self):
        self._sock.close()
