"""Live fluent-forward ingestion edge — the reference's TCP face
(accept loop server/server.go:58-116, session state machine
message/session.go:15-122, HELO/PING/PONG message/helo.go / ping.go /
pong.go, UDP heartbeat server/server.go:60-86) reimplemented from the
PUBLIC fluentd Forward Protocol v1 specification
(https://github.com/fluent/fluentd/wiki/Forward-Protocol-Specification-v1)
— NOT translated from the Go.

Role in the architecture: the INGEST EDGE DAEMON. Spark is not a TCP
endpoint — a fleet of these daemons terminates fluent-forward clients
and lands per-tag SPOOL SEGMENTS (the exact format
sources/fluentfile.py reads), and the engine runs batch or streaming
over those files (streaming/stream_pipeline.py::stream_spool_routed
tails the same directories). That keeps the 100 TB data path
declarative while real fluentd/fluent-bit agents can point at this
server unchanged.

Implements, per the spec:

* all four event modes — Message `[tag, time, record]`, Forward
  `[tag, [[time, record], ...]]`, PackedForward `[tag, bin]` (binary of
  concatenated entries), CompressedPackedForward (same, gzipped —
  detected by magic, `compressed: "gzip"` option);
* `option.chunk` acknowledgements: reply `{"ack": <chunk>}` after the
  segment write completes (at-least-once handoff — the client retries
  unacked chunks; replay lands in a new segment and the engine's
  exact-dedup/idempotence layers own the rest);
* the shared-key handshake: server sends
  `["HELO", {"nonce", "auth", "keepalive"}]`; client answers
  `["PING", hostname, salt, sha512_hex(salt + hostname + nonce + key),
  username, password_digest]`; server verifies and replies
  `["PONG", ok, reason, server_hostname,
  sha512_hex(salt + server_hostname + nonce + key)]`;
* the UDP heartbeat: echo a null byte back to any datagram;
* TLS transport (the reference's server/tls.go face): pass an
  `ssl.SSLContext` to ForwardServer/ForwardClient — asyncio wraps the
  stream; the protocol above is unchanged (tested with a self-signed
  cert in tests/test_forward_server.py).

Timestamps accept both integer epoch seconds and the EventTime ext(0)
sec+nsec encoding and round-trip LOSSLESSLY into the spool (the segment
stores the original entry bytes for packed modes, and re-encodes via
encode_entry for Message/Forward).
"""

from __future__ import annotations

import asyncio
import gzip as _gzip
import hashlib
import hmac
import os
import secrets
import struct

from fluent_server_spark.sources.fluentfile import (
    MsgpackError,
    _decode_value,
    _enc_int,
    _enc_map_header,
    _enc_str,
    encode_entry,
)


def _try_decode(buf: bytes):
    """Decode one top-level msgpack value from the head of `buf`.
    Returns (value, consumed) or None if more bytes are needed."""
    if not buf:
        return None
    try:
        value, consumed = _decode_value(buf, 0)
    except (IndexError, struct.error, UnicodeDecodeError):
        # truncated frame — wait for more bytes. UnicodeDecodeError covers
        # a read boundary landing mid multi-byte UTF-8 character inside a
        # str field: the partial slice is undecodable until more arrives.
        return None
    if consumed > len(buf):
        # a trailing str/bin length field pointed past the buffer: the
        # slice silently came up short, so the frame is incomplete
        return None
    return value, consumed


def _enc_map(d: dict) -> bytes:
    out = [_enc_map_header(len(d))]
    for k, v in d.items():
        out.append(_enc_str(str(k)))
        if isinstance(v, bool):
            out.append(b"\xc3" if v else b"\xc2")
        elif isinstance(v, bytes):
            out.append(b"\xc4" + struct.pack("B", len(v)) + v)
        elif isinstance(v, int):
            out.append(_enc_int(v))
        elif isinstance(v, float):
            out.append(b"\xcb" + struct.pack(">d", v))
        elif v is None:
            out.append(b"\xc0")
        else:
            out.append(_enc_str(str(v)))
    return b"".join(out)


def _enc_array(items: list[bytes]) -> bytes:
    if len(items) < 16:
        return struct.pack("B", 0x90 | len(items)) + b"".join(items)
    return b"\xdc" + struct.pack(">H", len(items)) + b"".join(items)


def _sha512_hex(*parts) -> str:
    h = hashlib.sha512()
    for p in parts:
        h.update(p if isinstance(p, bytes) else str(p).encode("utf-8"))
    return h.hexdigest()


class ForwardServer:
    """asyncio fluent-forward server writing per-tag spool segments.

    Segments live under `{spool_dir}/{segment:06d}/{tag}.msgpack`; the
    per-segment subdirectory keeps `_tag_from_path` exact and gives the
    streaming tail whole-file units — `rotate()` seals the current
    segment (a file-buffer flush), after which its files never grow.
    """

    def __init__(
        self,
        spool_dir: str,
        host: str = "127.0.0.1",
        port: int = 0,
        shared_key: str | None = None,
        server_hostname: str = "fss-edge",
        heartbeat: bool = False,
        nonce: bytes | None = None,
        ssl_context=None,
        hidden_active: bool = False,
        max_buffer: int = 64 << 20,
    ) -> None:
        self.spool_dir = spool_dir
        self.host, self._req_port = host, port
        self.shared_key = shared_key
        self.server_hostname = server_hostname
        self.heartbeat = heartbeat
        self.hidden_active = hidden_active
        self.max_buffer = max_buffer
        self._nonce = nonce or secrets.token_bytes(16)
        self._auth_salt = secrets.token_bytes(16)
        self._server = None
        self._udp = None
        self._segment = 0
        self._ssl = ssl_context
        self._lock = asyncio.Lock()
        self._conn_tasks: set = set()
        self._conn_writers: set = set()
        self.stats = {
            "connections": 0,
            "entries": 0,
            "acks": 0,
            "rejected": 0,
            "overflowed": 0,
        }

    # ------------------------------------------------------------ lifecycle
    async def start(self) -> None:
        # crash recovery: a daemon that died WITHOUT a final rotate
        # (SIGKILL / OOM / power loss) leaves an `_open_NNNNNN` working
        # dir whose entries were already ACKed to clients — and the
        # underscore prefix hides it from every batch scan and streaming
        # tail forever. Seal those leftovers (rename to the visible name)
        # before serving: safe under the same single-writer-per-spool
        # assumption _next_segment() already makes, and the new process
        # numbers PAST them so it never appends to a sealed segment.
        self._seal_leftovers()
        # resume segment numbering PAST anything already on disk: a
        # daemon restarted on the same spool must never append to (or
        # seal-rename onto) a segment an earlier process wrote — files a
        # stream already consumed are only read once, so appending to
        # them silently loses the appended entries downstream
        self._segment = self._next_segment()
        self._server = await asyncio.start_server(
            self._handle, self.host, self._req_port, ssl=self._ssl
        )
        if self.heartbeat:
            loop = asyncio.get_running_loop()
            self._udp, _ = await loop.create_datagram_endpoint(
                lambda: _HeartbeatProtocol(), local_addr=(self.host, self.port)
            )

    @property
    def port(self) -> int:
        return self._server.sockets[0].getsockname()[1]

    async def stop(self) -> None:
        if self._udp is not None:
            self._udp.close()
        self._server.close()
        await self._server.wait_closed()
        # wait_closed() only waits for in-flight connection handlers on
        # Python >= 3.12.1 (gh-104344); on older runtimes a handler could
        # append+ACK a frame AFTER stop() returns, landing entries in a
        # fresh _open_ dir that the drain's final rotate never seals.
        # Close the live transports (readers see EOF, handlers exit their
        # loop) and await the handler tasks explicitly, so stop()
        # returning guarantees no further appends on every version.
        for w in list(self._conn_writers):
            w.close()
        if self._conn_tasks:
            await asyncio.gather(*list(self._conn_tasks), return_exceptions=True)

    def _seal_leftovers(self) -> None:
        import re as _re

        if not os.path.isdir(self.spool_dir):
            return
        for name in sorted(os.listdir(self.spool_dir)):
            m = _re.fullmatch(r"_open_(\d{6})", name)
            if not m:
                continue
            dst = os.path.join(self.spool_dir, m.group(1))
            if os.path.exists(dst):
                # impossible under single-writer (rotate renames, never
                # copies) — refuse rather than clobber sealed data
                raise RuntimeError(
                    f"spool has both {name} and {m.group(1)}: "
                    "two writers on one spool?"
                )
            os.rename(os.path.join(self.spool_dir, name), dst)

    def _next_segment(self) -> int:
        import re as _re

        if not os.path.isdir(self.spool_dir):
            return 0
        mx = -1
        for name in os.listdir(self.spool_dir):
            m = _re.fullmatch(r"(?:_open_)?(\d{6})", name)
            if m:
                mx = max(mx, int(m.group(1)))
        return mx + 1

    def rotate(self) -> int:
        """Seal the current segment; subsequent writes open a new one.
        Returns the sealed segment id.

        With `hidden_active`, sealing RENAMES the segment directory from
        its underscore-prefixed working name to the visible one — Spark's
        file listing skips `_`-prefixed paths, so batch scans and the
        streaming tail only ever see sealed, immutable files (a growing
        file would otherwise be read once by the file stream and its
        later bytes silently lost). Call from the server's event loop
        (the CLI does) so the rename never races an in-flight append."""
        sealed, self._segment = self._segment, self._segment + 1
        if self.hidden_active:
            wip = os.path.join(self.spool_dir, f"_open_{sealed:06d}")
            if os.path.isdir(wip):
                os.rename(wip, os.path.join(self.spool_dir, f"{sealed:06d}"))
        return sealed

    # -------------------------------------------------------------- spool io
    def _segment_path(self, tag: str) -> str:
        name = (
            f"_open_{self._segment:06d}"
            if self.hidden_active
            else f"{self._segment:06d}"
        )
        d = os.path.join(self.spool_dir, name)
        os.makedirs(d, exist_ok=True)
        return os.path.join(d, f"{tag}.msgpack")

    async def _append(self, tag: str, blob: bytes, n_entries: int) -> None:
        async with self._lock:
            with open(self._segment_path(tag), "ab") as f:
                f.write(blob)
        self.stats["entries"] += n_entries

    # ------------------------------------------------------------ handshake
    async def _handshake(self, reader, writer) -> tuple[bool, bytes]:
        """Run the HELO/PING/PONG exchange. Returns (ok, leftover) where
        `leftover` is any bytes the client pipelined behind its PING frame
        (event frames sent without waiting for PONG) — the session loop
        must seed its buffer with them rather than drop them."""
        helo = _enc_array(
            [
                _enc_str("HELO"),
                _enc_map(
                    {"nonce": self._nonce, "auth": self._auth_salt, "keepalive": True}
                ),
            ]
        )
        writer.write(helo)
        await writer.drain()
        buf = bytearray()
        while True:
            got = _try_decode(bytes(buf))
            if got is not None:
                ping, consumed = got
                del buf[:consumed]
                break
            chunk = await reader.read(65536)
            if not chunk:
                return False, b""
            buf += chunk
        ok, reason = False, ""
        if (
            isinstance(ping, list)
            and len(ping) >= 4
            and ping[0] == "PING"
        ):
            _, hostname, salt, digest = ping[:4]
            salt_b = salt if isinstance(salt, bytes) else str(salt).encode()
            want = _sha512_hex(salt_b, hostname, self._nonce, self.shared_key)
            ok = isinstance(digest, str) and hmac.compare_digest(digest, want)
            reason = "" if ok else "shared_key digest mismatch"
        else:
            reason = "malformed PING"
        pong_digest = _sha512_hex(
            salt_b if ok else b"", self.server_hostname, self._nonce, self.shared_key
        )
        pong = _enc_array(
            [
                _enc_str("PONG"),
                b"\xc3" if ok else b"\xc2",
                _enc_str(reason),
                _enc_str(self.server_hostname),
                _enc_str(pong_digest),
            ]
        )
        writer.write(pong)
        await writer.drain()
        if not ok:
            self.stats["rejected"] += 1
        return ok, bytes(buf)

    # ------------------------------------------------------------- sessions
    async def _handle(self, reader, writer) -> None:
        self.stats["connections"] += 1
        task = asyncio.current_task()
        self._conn_tasks.add(task)
        self._conn_writers.add(writer)
        try:
            buf = bytearray()
            if self.shared_key is not None:
                ok, leftover = await self._handshake(reader, writer)
                if not ok:
                    return
                buf += leftover
            while True:
                # drain complete frames first — the handshake may have
                # seeded the buffer with pipelined event frames
                while True:
                    got = _try_decode(bytes(buf))
                    if got is None:
                        break
                    frame, consumed = got
                    del buf[:consumed]
                    await self._dispatch(frame, writer)
                # memory backstop: a client streaming bytes that never
                # decode into a frame (garbage, or a single frame larger
                # than max_buffer) would otherwise grow the buffer
                # without bound — drop the connection, keep the server
                if len(buf) > self.max_buffer:
                    self.stats["overflowed"] += 1
                    break
                chunk = await reader.read(65536)
                if not chunk:
                    break
                buf += chunk
        finally:
            self._conn_tasks.discard(task)
            self._conn_writers.discard(writer)
            writer.close()
            try:
                await writer.wait_closed()
            except BaseException:
                # includes CancelledError from server stop racing the
                # close waiter — the connection is gone either way
                pass

    async def _dispatch(self, frame, writer) -> None:
        if not isinstance(frame, list) or not frame or not isinstance(frame[0], str):
            raise MsgpackError("frame is not [tag, ...]")
        tag = frame[0]
        option = None
        if isinstance(frame[1], (bytes, bytearray)):
            # PackedForward / CompressedPackedForward: the binary IS the
            # spool format (concatenated entries) — land it verbatim
            # (gunzip first: segments are raw concatenations)
            blob = bytes(frame[1])
            if len(frame) > 2 and isinstance(frame[2], dict):
                option = frame[2]
            if blob[:2] == b"\x1f\x8b":
                blob = _gzip.decompress(blob)
            n = sum(1 for _ in _iter_entries(blob))
            await self._append(tag, blob, n)
        elif isinstance(frame[1], list):
            # Forward mode: [[time, record], ...]
            entries = frame[1]
            if len(frame) > 2 and isinstance(frame[2], dict):
                option = frame[2]
            blob = b"".join(
                encode_entry(_ts_of(e[0]), e[1]) for e in entries
            )
            await self._append(tag, blob, len(entries))
        else:
            # Message mode: [tag, time, record, option?]
            if len(frame) > 3 and isinstance(frame[3], dict):
                option = frame[3]
            blob = encode_entry(_ts_of(frame[1]), frame[2])
            await self._append(tag, blob, 1)
        if option and option.get("chunk") is not None:
            chunk = option["chunk"]
            if isinstance(chunk, bytes):
                chunk = chunk.decode("utf-8", "surrogateescape")
            writer.write(_enc_map({"ack": chunk}))
            await writer.drain()
            self.stats["acks"] += 1


def _ts_of(v):
    """Normalize a decoded time value to encode_entry's accepted forms."""
    if isinstance(v, tuple) and v and v[0] == "__ext__":
        sec, nsec = struct.unpack(">II", v[2])
        return (sec, nsec)
    return int(v)


def _iter_entries(blob: bytes):
    i, n = 0, len(blob)
    while i < n:
        entry, i = _decode_value(blob, i)
        yield entry


class _HeartbeatProtocol(asyncio.DatagramProtocol):
    """UDP heartbeat responder: any datagram gets a null byte back (the
    spec's keepalive probe; reference analogue server/server.go:60-86)."""

    def connection_made(self, transport):
        self.transport = transport

    def datagram_received(self, data, addr):
        self.transport.sendto(b"\x00", addr)


# ---------------------------------------------------------------- client


class ForwardClient:
    """Minimal fluent-forward client (handshake + all four event modes) —
    for tests and as the reference implementation of the client side of
    the same public spec."""

    def __init__(self, host: str, port: int, shared_key: str | None = None,
                 hostname: str = "fss-client", ssl_context=None) -> None:
        self.host, self.port = host, port
        self.shared_key, self.hostname = shared_key, hostname
        self._ssl = ssl_context
        self._r = self._w = None

    async def connect(self) -> bool:
        self._r, self._w = await asyncio.open_connection(
            self.host, self.port, ssl=self._ssl
        )
        if self.shared_key is None:
            return True
        helo = await self._read_frame()
        if not (isinstance(helo, list) and helo[0] == "HELO"):
            return False
        nonce = helo[1]["nonce"]
        salt = secrets.token_bytes(16)
        digest = _sha512_hex(salt, self.hostname, nonce, self.shared_key)
        ping = _enc_array(
            [
                _enc_str("PING"),
                _enc_str(self.hostname),
                b"\xc4" + struct.pack("B", len(salt)) + salt,
                _enc_str(digest),
                _enc_str(""),
                _enc_str(""),
            ]
        )
        self._w.write(ping)
        await self._w.drain()
        pong = await self._read_frame()
        return bool(isinstance(pong, list) and pong[0] == "PONG" and pong[1])

    async def _read_frame(self):
        buf = bytearray()
        while True:
            got = _try_decode(bytes(buf))
            if got is not None:
                return got[0]
            chunk = await self._r.read(65536)
            if not chunk:
                raise ConnectionError("peer closed during frame read")
            buf += chunk

    async def send_raw(self, payload: bytes, await_ack: bool = False):
        self._w.write(payload)
        await self._w.drain()
        if await_ack:
            return await self._read_frame()
        return None

    async def close(self) -> None:
        self._w.close()
        try:
            await self._w.wait_closed()
        except Exception:
            pass
