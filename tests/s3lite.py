"""In-process S3-compatible test double for the object-store backend.

A stdlib ThreadingHTTPServer implementing exactly the conditional-write
subset ObjectStoreCasBackend speaks — PUT with If-None-Match:*/If-Match,
GET with ETag + Last-Modified, DELETE with If-Match, and list-type=2
listing with continuation paging — with simple-PUT ETag semantics
(MD5 of the body, quoted) and all conditionals evaluated atomically
under one lock, which is precisely what a real object store guarantees.

This is a TEST DOUBLE, not a server product: no auth (the backend's
SigV4 signer is exercised by tests only for header construction), no
multipart, no versioning. ``rewind(key, s)`` backdates an object's
mtime so lease-TTL staleness is testable, mirroring the utime/rewind
helpers of the file/memory backends.
"""

from __future__ import annotations

import hashlib
import socket
import threading
import time
from email.utils import formatdate
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qsl, unquote, urlsplit


class S3Lite:
    def __init__(self, page_size: int = 0, flaky: dict | None = None):
        """``page_size`` > 0 truncates list responses to that many keys
        per page with a NextContinuationToken, exercising the client's
        paging loop; 0 = everything in one page (S3's real default is
        1000).

        **Fault injection** (round-12 directive: pin the client's
        transient-fault retry/recovery paths). Two mechanisms:

        * ``inject(kind, verb=None, times=1)`` queues one-shot faults
          consumed by the next ``times`` requests matching ``verb``.
        * ``flaky={kind: n, ...}`` fires ``kind`` deterministically on
          every ``n``-th request (counter-based — no randomness), so
          whole test matrices can run under steady background faults.

        Kinds: ``"500"`` = respond 500 WITHOUT applying the mutation
        (client may blind-retry GET/LIST; mutations must recover);
        ``"reset-before"`` = drop the connection before processing
        (request lost in flight); ``"reset-after"`` = apply the
        mutation, then drop the connection instead of responding — the
        lost-response case where blind re-send of a conditional write
        would observe its own write and mis-report the race.
        """
        self.lock = threading.Lock()
        self.page_size = page_size
        self.flaky = dict(flaky or {})
        self.faults: list = []  # queued dicts: {verb, kind}
        self.request_count = 0
        # full object key (bucket-relative) -> [body, etag, mtime]
        self.objects: dict[str, list] = {}
        outer = self

        class Handler(BaseHTTPRequestHandler):
            protocol_version = "HTTP/1.1"

            def log_message(self, *a):  # noqa: D102 — silence
                pass

            def _send(self, code, body=b"", headers=None):
                self.send_response(code)
                for k, v in (headers or {}).items():
                    self.send_header(k, v)
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                if body:
                    self.wfile.write(body)

            def _abort(self):
                """Drop the connection without a response — the client
                sees a reset / RemoteDisconnected."""
                try:
                    self.connection.shutdown(socket.SHUT_RDWR)
                except OSError:
                    pass
                self.close_connection = True

            def _key(self):
                path = unquote(urlsplit(self.path).path).lstrip("/")
                # strip the bucket segment
                _, _, key = path.partition("/")
                return key

            def do_PUT(self):  # noqa: N802
                n = int(self.headers.get("Content-Length", 0))
                body = self.rfile.read(n)
                fault = outer._take_fault("PUT")
                if fault == "reset-before":
                    return self._abort()
                if fault == "500":
                    return self._send(500)
                key = self._key()
                inm = self.headers.get("If-None-Match")
                im = self.headers.get("If-Match")
                with outer.lock:
                    cur = outer.objects.get(key)
                    if inm == "*" and cur is not None:
                        if fault == "reset-after":
                            return self._abort()
                        return self._send(412)
                    if im is not None and (
                        cur is None or cur[1] != im.strip('"')
                    ):
                        if fault == "reset-after":
                            return self._abort()
                        return self._send(412)
                    etag = hashlib.md5(body).hexdigest()
                    outer.objects[key] = [body, etag, time.time()]
                if fault == "reset-after":
                    return self._abort()
                return self._send(200, headers={"ETag": f'"{etag}"'})

            def do_GET(self):  # noqa: N802
                fault = outer._take_fault("GET")
                if fault in ("reset-before", "reset-after"):
                    # GET mutates nothing; both reset kinds collapse
                    return self._abort()
                if fault == "500":
                    return self._send(500)
                sp = urlsplit(self.path)
                q = dict(parse_qsl(sp.query, keep_blank_values=True))
                if q.get("list-type") == "2":
                    prefix = q.get("prefix", "")
                    after = q.get("continuation-token", "")
                    with outer.lock:
                        keys = sorted(
                            k for k in outer.objects
                            if k.startswith(prefix) and k > after
                        )
                    trunc = bool(
                        outer.page_size and len(keys) > outer.page_size
                    )
                    if trunc:
                        keys = keys[: outer.page_size]
                    items = "".join(f"<Contents><Key>{k}</Key></Contents>"
                                    for k in keys)
                    nxt = (
                        f"<NextContinuationToken>{keys[-1]}"
                        "</NextContinuationToken>" if trunc else ""
                    )
                    xml = (
                        '<?xml version="1.0"?><ListBucketResult>'
                        f"{items}<IsTruncated>"
                        f"{'true' if trunc else 'false'}</IsTruncated>"
                        f"{nxt}</ListBucketResult>"
                    ).encode()
                    return self._send(
                        200, xml, {"Content-Type": "application/xml"}
                    )
                key = self._key()
                with outer.lock:
                    cur = outer.objects.get(key)
                    if cur is None:
                        return self._send(404)
                    body, etag, mtime = cur[0], cur[1], cur[2]
                return self._send(
                    200,
                    body,
                    {
                        "ETag": f'"{etag}"',
                        "Last-Modified": formatdate(mtime, usegmt=True),
                    },
                )

            def do_DELETE(self):  # noqa: N802
                fault = outer._take_fault("DELETE")
                if fault == "reset-before":
                    return self._abort()
                if fault == "500":
                    return self._send(500)
                key = self._key()
                im = self.headers.get("If-Match")
                with outer.lock:
                    cur = outer.objects.get(key)
                    if cur is None:
                        if fault == "reset-after":
                            return self._abort()
                        return self._send(404)
                    if im is not None and cur[1] != im.strip('"'):
                        if fault == "reset-after":
                            return self._abort()
                        return self._send(412)
                    del outer.objects[key]
                if fault == "reset-after":
                    return self._abort()
                return self._send(204)

        self.server = ThreadingHTTPServer(("127.0.0.1", 0), Handler)
        self.thread = threading.Thread(
            target=self.server.serve_forever, daemon=True
        )
        self.thread.start()

    @property
    def endpoint(self) -> str:
        host, port = self.server.server_address
        return f"http://{host}:{port}"

    def inject(self, kind: str, verb: str | None = None, times: int = 1):
        """Queue ``times`` one-shot faults for requests matching
        ``verb`` (None = any verb). Kinds: '500', 'reset-before',
        'reset-after'."""
        with self.lock:
            self.faults.extend(
                {"verb": verb, "kind": kind} for _ in range(times)
            )

    def _take_fault(self, verb: str) -> str | None:
        with self.lock:
            self.request_count += 1
            for i, f in enumerate(self.faults):
                if f["verb"] in (None, verb):
                    self.faults.pop(i)
                    return f["kind"]
            for kind, n in self.flaky.items():
                if n and self.request_count % n == 0:
                    return kind
        return None

    def rewind(self, key: str, seconds: float) -> None:
        """Backdate an object as if its writer stopped heartbeating.

        ObjectStoreCasBackend reads age from the envelope's writer
        timestamp (Last-Modified is 1-second granularity), so aging
        rewrites the ``seq:salt:ts_ns`` header — which rotates the
        ETag, exactly as mtime-rewinding the file backend rotates its
        ``inode:mtime_ns`` token; the tests re-read versions after a
        rewind for that reason. Foreign bodies (no envelope) fall back
        to backdating the stored mtime."""
        with self.lock:
            body, _, mtime = self.objects[key]
            head, sep, data = body.partition(b"\n")
            parts = head.decode(errors="replace").split(":")
            if sep and len(parts) == 3 and parts[2].isdigit():
                parts[2] = str(int(parts[2]) - int(seconds * 1e9))
                body = ":".join(parts).encode() + b"\n" + data
            new_etag = hashlib.md5(body).hexdigest()
            self.objects[key] = [body, new_etag, mtime - seconds]

    def close(self) -> None:
        self.server.shutdown()
        self.server.server_close()
