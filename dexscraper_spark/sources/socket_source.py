"""S1 — live network ingestion: a socket-backed streaming reader with the
reference's reconnect/backoff envelope.

The reference's entry point is a long-lived WebSocket subscription with
connect-retry, exponential backoff and resubscription on drop
(scraper.py:177-246). This module is that leg made Spark-native and
testable without network egress:

* ``SocketFrameStreamReader`` — a ``SimpleDataSourceStreamReader`` that
  pulls wire-format frames from a TCP endpoint. Offsets are frame
  sequence numbers; each fetch subscribes from the next unconsumed seq,
  so a dropped connection resumes EXACTLY where it left off — no
  duplicates, no gaps — and a committed offset range replays through the
  server's history buffer (``readBetweenOffsets``), the same
  exactly-once contract as the synthetic reader. Decode and
  subscription-time Filters pushdown are inherited unchanged from
  ``FrameSimpleStreamReader``.
* ``FrameSocketServer`` — the local stand-in for the remote endpoint: a
  threaded TCP server replaying a frame history from any requested seq,
  with fault injection (``fail_after_frames`` drops the connection
  mid-stream without a clean end marker) for reconnect tests.

Wire protocol (length-prefixed, deliberately minimal):
  client → server: one JSON line ``{"start_seq": N, "max_frames": K}``
  server → client: repeated ``>QI`` (seq, payload_len) headers + payload,
  then an END marker (seq = 2^64−1, len 0). EOF *without* the END marker
  means the connection dropped → the reader reconnects with backoff and
  resumes from the next unconsumed seq. The marker is what distinguishes
  "no more frames right now" (a live tail returning a short batch) from
  a mid-stream failure.

Scale shape: ``SimpleDataSourceStreamReader`` consumes on the driver —
matching the reference's single-socket ingestion. For fleets, shard
subscriptions across a partitioned ``DataSourceStreamReader`` (one socket
per partition); everything below the fetch loop is shared either way.
"""

from __future__ import annotations

import json
import socket
import struct
import threading
import time

from dexscraper_spark.sources.decode import DECODED_SCHEMA, parse_frame
from dexscraper_spark.sources.frame_source import FrameSimpleStreamReader

HDR = struct.Struct(">QI")
END_SEQ = (1 << 64) - 1


class SocketFrameStreamReader(FrameSimpleStreamReader):
    """``spark.readStream.format("dexframes").option("port", ...)``.

    Options (beyond the FrameSimpleStreamReader set):
      host (default 127.0.0.1), port (required),
      connect_retries (default 8), backoff_base_s (default 0.05),
      backoff_cap_s (default 1.0) — the scraper.py:177-246 retry envelope:
      exponential doubling from base, capped, counter reset after any
      successful frame (a healthy reconnect is not a strike).
    """

    def __init__(self, options):
        super().__init__(options)
        self.host = options.get("host", "127.0.0.1")
        self.port = int(options["port"])
        self.connect_retries = int(options.get("connect_retries", 8) or 8)
        self.backoff_base = float(options.get("backoff_base_s", 0.05) or 0.05)
        self.backoff_cap = float(options.get("backoff_cap_s", 1.0) or 1.0)

    # -- offset protocol ----------------------------------------------------
    def initialOffset(self) -> dict:
        return {"seq": 0}

    def read(self, start: dict):
        s = int(start["seq"])
        want = self.frames_per_batch
        if self.max_frames:
            # same bounded-drain contract as the synthetic reader: a
            # max_frames option caps total consumption so availableNow /
            # demo runs terminate at the requested frame count
            want = min(want, self.max_frames - s)
            if want <= 0:
                return iter(()), {"seq": s}
        frames = self._fetch(s, want)
        return iter(list(self._decode(frames))), {"seq": s + len(frames)}

    def readBetweenOffsets(self, start: dict, end: dict):
        s, e = int(start["seq"]), int(end["seq"])
        frames = self._fetch(s, e - s)
        if len(frames) != e - s:
            raise ConnectionError(
                f"replay of committed range [{s}, {e}) returned "
                f"{len(frames)} frames — server history no longer covers it")
        return iter(list(self._decode(frames)))

    # -- fetch loop ---------------------------------------------------------
    def _fetch(self, start_seq: int, max_frames: int):
        """Subscribe from ``start_seq``; collect up to ``max_frames``
        (seq, payload) pairs. On a dropped connection, reconnect with
        capped exponential backoff and REsubscribe from the next
        unconsumed seq — consumed frames are never re-requested, so a
        flaky link can cause neither duplicates nor gaps."""
        if max_frames <= 0:
            return []
        frames: list[tuple[int, bytes]] = []
        next_seq = start_seq
        attempt = 0
        while len(frames) < max_frames:
            got_this_attempt = 0
            try:
                with socket.create_connection((self.host, self.port),
                                              timeout=10.0) as sk:
                    sk.sendall(json.dumps(
                        {"start_seq": next_seq,
                         "max_frames": max_frames - len(frames)},
                    ).encode("utf-8") + b"\n")
                    fh = sk.makefile("rb")
                    while len(frames) < max_frames:
                        hdr = fh.read(HDR.size)
                        if len(hdr) < HDR.size:
                            raise ConnectionError("dropped before END marker")
                        seq, ln = HDR.unpack(hdr)
                        if seq == END_SEQ:
                            return frames  # clean completion (maybe short)
                        payload = fh.read(ln)
                        if len(payload) < ln:
                            raise ConnectionError("truncated frame payload")
                        if seq != next_seq:
                            raise ConnectionError(
                                f"sequence gap: expected {next_seq}, got {seq}")
                        frames.append((seq, payload))
                        next_seq += 1
                        got_this_attempt += 1
                        attempt = 0  # healthy frames reset the retry budget
                return frames
            except OSError as e:
                if got_this_attempt == 0:
                    attempt += 1
                if attempt > self.connect_retries:
                    raise ConnectionError(
                        f"dexframes socket {self.host}:{self.port} "
                        f"unreachable after {self.connect_retries} retries"
                    ) from e
                time.sleep(min(self.backoff_base * (2 ** max(attempt - 1, 0)),
                               self.backoff_cap))
        return frames

    def _decode(self, frames):
        out_cols = [f.name for f in DECODED_SCHEMA.fields]
        for seq, payload in frames:
            for rec in parse_frame(payload):
                rec["msg_id"] = seq
                if self._keep(rec):
                    yield tuple(rec.get(c) for c in out_cols)


class FrameSocketServer:
    """Threaded local frame server: replays ``payloads[seq]`` from any
    requested seq, END-marks clean completion, and supports abrupt-drop
    fault injection. ``kill()`` closes the listener and every live
    connection (the mid-stream crash); a new instance on the same port
    models the endpoint coming back."""

    def __init__(self, payloads, host: str = "127.0.0.1", port: int = 0,
                 fail_after_frames: int | None = None):
        self.payloads = list(payloads)
        self.fail_after = fail_after_frames
        self._sock = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
        self._sock.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        if hasattr(socket, "SO_REUSEPORT"):
            # REUSEADDR only covers TIME_WAIT; a crash-restart while old
            # child connections linger in ESTABLISHED/CLOSE_WAIT needs
            # REUSEPORT to rebind the listener immediately
            self._sock.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEPORT, 1)
        self._sock.bind((host, port))
        self._sock.listen(16)
        self.host, self.port = self._sock.getsockname()
        self._stop = False
        self._conns: list[socket.socket] = []
        self._thread: threading.Thread | None = None

    def start(self) -> "FrameSocketServer":
        self._thread = threading.Thread(target=self._accept_loop, daemon=True)
        self._thread.start()
        return self

    def _accept_loop(self):
        while not self._stop:
            try:
                conn, _ = self._sock.accept()
            except OSError:
                return
            self._conns.append(conn)
            threading.Thread(target=self._serve, args=(conn,),
                             daemon=True).start()

    def _serve(self, conn: socket.socket):
        try:
            fh = conn.makefile("rb")
            req = json.loads(fh.readline().decode("utf-8"))
            s = int(req.get("start_seq", 0))
            m = int(req.get("max_frames", 1 << 30))
            sent = 0
            for seq in range(s, min(len(self.payloads), s + m)):
                if self.fail_after is not None and sent >= self.fail_after:
                    return  # abrupt drop: no END marker
                p = self.payloads[seq]
                conn.sendall(HDR.pack(seq, len(p)) + p)
                sent += 1
            conn.sendall(HDR.pack(END_SEQ, 0))
        except OSError:
            pass  # client went away mid-send; nothing to clean up
        finally:
            try:
                conn.close()
            except OSError:
                pass

    def kill(self):
        self._stop = True
        try:
            self._sock.close()
        except OSError:
            pass
        for c in self._conns:
            try:
                c.close()
            except OSError:
                pass
