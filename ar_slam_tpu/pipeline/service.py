"""Load-images control service: the TPU-native replacement for the
reference's ROS service plane.

The reference exposes ``LoadImages.srv`` (string[] img_fns -> bool success +
string message, ar_slam_interfaces/srv/LoadImages.srv) served by ImageLoader
(image_loader.cpp:125-133: append filenames to a mutex-guarded deque, the
wall timer drains one per tick) and called by ``load_images_client``
(ar_slam_module.py:8-20).  DDS is replaced by a Unix-domain socket speaking
one JSON object per line; the filename queue and success/message response
contract are preserved.
"""

from __future__ import annotations

import json
import os
import socket
import threading
from collections import deque


class LoadImagesServer:
    """Accepts {"img_fns": [...]} requests and queues the filenames.

    The serve loop drains the queue via ``pop_batch``; requests get
    {"success": bool, "message": str} back, mirroring the srv response
    fields.  Requests with no filenames fail like the client does
    (load_images_client.py:30-40 errors on empty args).
    """

    def __init__(self, sock_path: str):
        self.sock_path = sock_path
        self._queue: deque[str] = deque()
        self._lock = threading.Lock()
        self._stop = threading.Event()
        if os.path.exists(sock_path):
            os.unlink(sock_path)
        self._sock = socket.socket(socket.AF_UNIX, socket.SOCK_STREAM)
        self._sock.bind(sock_path)
        self._sock.listen(8)
        self._sock.settimeout(0.2)
        self._thread = threading.Thread(target=self._serve, daemon=True)
        self._thread.start()

    def _serve(self):
        while not self._stop.is_set():
            try:
                conn, _ = self._sock.accept()
            except socket.timeout:
                continue
            except OSError:
                break
            with conn:
                try:
                    # a silent/partial client must not wedge the (single-
                    # threaded) accept loop
                    conn.settimeout(2.0)
                    data = b""
                    while not data.endswith(b"\n"):
                        chunk = conn.recv(65536)
                        if not chunk:
                            break
                        data += chunk
                    req = json.loads(data.decode())
                    fns = [str(f) for f in req.get("img_fns", [])]
                    if not fns:
                        resp = {"success": False,
                                "message": "no filenames provided"}
                    else:
                        with self._lock:
                            self._queue.extend(fns)
                        resp = {"success": True,
                                "message": f"queued {len(fns)} images"}
                except Exception as e:  # malformed request — report, keep serving
                    resp = {"success": False, "message": f"bad request: {e}"}
                try:
                    conn.sendall((json.dumps(resp) + "\n").encode())
                except OSError:
                    pass

    def pop_batch(self, max_items: int = 0) -> list[str]:
        """Drain up to max_items queued filenames (0 = all)."""
        out = []
        with self._lock:
            while self._queue and (not max_items or len(out) < max_items):
                out.append(self._queue.popleft())
        return out

    def close(self):
        self._stop.set()
        self._sock.close()
        self._thread.join(timeout=2.0)
        if os.path.exists(self.sock_path):
            os.unlink(self.sock_path)


def send_load_images(sock_path: str, img_fns: list[str],
                     timeout: float = 10.0) -> dict:
    """Client call (≙ LoadImagesClientAsync.send_request): send the filename
    list, return the response dict."""
    with socket.socket(socket.AF_UNIX, socket.SOCK_STREAM) as s:
        s.settimeout(timeout)
        s.connect(sock_path)
        s.sendall((json.dumps({"img_fns": list(img_fns)}) + "\n").encode())
        data = b""
        while not data.endswith(b"\n"):
            chunk = s.recv(65536)
            if not chunk:
                break
            data += chunk
    return json.loads(data.decode())
