"""Client for the native msgbus broker (native/msgbus.cpp).

Replaces rospy's pub/sub API (reference racing/realtime.py) with a small
socket client: ``publish(topic, payload)`` / ``subscribe(topic, callback)``
with a background reader thread, plus a request/reply helper standing in
for ROS services (srv/AddNewVehicle.srv).

Also provides :func:`spawn_broker` to build (if needed) and launch the C++
broker as a subprocess.
"""

from __future__ import annotations

import os
import socket
import struct
import subprocess
import threading
import time
import uuid
from typing import Callable

import numpy as np

SUB, UNSUB, PUB, MSG = 1, 2, 3, 4

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_BROKER_SRC = os.path.join(_REPO_ROOT, "native", "msgbus.cpp")
_BROKER_BIN = os.path.join(_REPO_ROOT, "build", "msgbus")


def spawn_broker(port: int = 9123, wait: float = 3.0) -> subprocess.Popen:
    """Build (if stale) and launch the broker; returns the process."""
    if not os.path.exists(_BROKER_BIN) or os.path.getmtime(_BROKER_BIN) < os.path.getmtime(
        _BROKER_SRC
    ):
        os.makedirs(os.path.dirname(_BROKER_BIN), exist_ok=True)
        subprocess.run(
            ["g++", "-O2", "-std=c++17", "-o", _BROKER_BIN, _BROKER_SRC], check=True
        )
    proc = subprocess.Popen([_BROKER_BIN, str(port)], stderr=subprocess.DEVNULL)
    deadline = time.time() + wait
    while time.time() < deadline:
        try:
            s = socket.create_connection(("127.0.0.1", port), timeout=0.2)
            s.close()
            return proc
        except OSError:
            time.sleep(0.02)
    proc.kill()
    raise RuntimeError("msgbus broker did not come up")


class Bus:
    """One node's connection to the broker."""

    def __init__(self, port: int = 9123, host: str = "127.0.0.1"):
        self._sock = socket.create_connection((host, port))
        self._sock.setsockopt(socket.IPPROTO_TCP, socket.TCP_NODELAY, 1)
        self._callbacks: dict[str, list[Callable[[bytes], None]]] = {}
        self._lock = threading.Lock()
        self._closed = False
        self._thread = threading.Thread(target=self._reader, daemon=True)
        self._thread.start()

    # ---- framing -------------------------------------------------------

    def _send_frame(self, ftype: int, payload: bytes):
        frame = struct.pack("<IB", 1 + len(payload), ftype) + payload
        with self._lock:
            self._sock.sendall(frame)

    def subscribe(self, topic: str, callback: Callable[[bytes], None]):
        self._callbacks.setdefault(topic, []).append(callback)
        self._send_frame(SUB, topic.encode())

    def publish(self, topic: str, payload: bytes):
        t = topic.encode()
        self._send_frame(PUB, struct.pack("<H", len(t)) + t + payload)

    # ---- numpy conveniences -------------------------------------------

    def publish_array(self, topic: str, arr: np.ndarray):
        arr = np.ascontiguousarray(arr, dtype=np.float64)
        header = struct.pack("<B", arr.ndim) + struct.pack(f"<{arr.ndim}I", *arr.shape)
        self.publish(topic, header + arr.tobytes())

    @staticmethod
    def decode_array(payload: bytes) -> np.ndarray:
        ndim = payload[0]
        shape = struct.unpack_from(f"<{ndim}I", payload, 1)
        return np.frombuffer(payload, dtype=np.float64, offset=1 + 4 * ndim).reshape(shape)

    def subscribe_array(self, topic: str, callback: Callable[[np.ndarray], None]):
        self.subscribe(topic, lambda p: callback(self.decode_array(p)))

    # ---- request/reply (replaces ROS services) -------------------------

    def request(self, service: str, arr: np.ndarray, timeout: float = 5.0) -> np.ndarray:
        """Send a request and wait for the matching reply."""
        token = uuid.uuid4().hex[:12]
        done = threading.Event()
        result: list[np.ndarray] = []

        def on_reply(payload: bytes):
            result.append(self.decode_array(payload))
            done.set()

        self.subscribe(f"{service}/rsp/{token}", on_reply)
        self.publish(
            f"{service}/req",
            token.encode() + b"\x00" + self._encode_array(arr),
        )
        if not done.wait(timeout):
            raise TimeoutError(f"no reply from service {service}")
        return result[0]

    def serve(self, service: str, handler: Callable[[np.ndarray], np.ndarray]):
        """Register a service handler."""

        def on_req(payload: bytes):
            sep = payload.index(b"\x00")
            token = payload[:sep].decode()
            arr = self.decode_array(payload[sep + 1 :])
            out = handler(arr)
            self.publish_array(f"{service}/rsp/{token}", out)

        self.subscribe(f"{service}/req", on_req)

    @staticmethod
    def _encode_array(arr: np.ndarray) -> bytes:
        arr = np.ascontiguousarray(arr, dtype=np.float64)
        return struct.pack("<B", arr.ndim) + struct.pack(f"<{arr.ndim}I", *arr.shape) + arr.tobytes()

    # ---- reader --------------------------------------------------------

    def _reader(self):
        buf = b""
        while not self._closed:
            try:
                chunk = self._sock.recv(1 << 16)
            except OSError:
                return
            if not chunk:
                return
            buf += chunk
            while len(buf) >= 5:
                (length,) = struct.unpack_from("<I", buf, 0)
                if len(buf) < 4 + length:
                    break
                ftype = buf[4]
                payload = buf[5 : 4 + length]
                buf = buf[4 + length :]
                if ftype == MSG:
                    (tlen,) = struct.unpack_from("<H", payload, 0)
                    topic = payload[2 : 2 + tlen].decode()
                    data = payload[2 + tlen :]
                    for cb in self._callbacks.get(topic, []):
                        try:
                            cb(data)
                        except Exception:  # keep the reader alive
                            import traceback

                            traceback.print_exc()

    def close(self):
        self._closed = True
        try:
            self._sock.shutdown(socket.SHUT_RDWR)
        except OSError:
            pass
        self._sock.close()
