"""SFTP wire-path tests over a REAL loopback TCP server.

The container has no paramiko (and no way to install it), so the real
SSH wire protocol stays environment-blocked. This module gets as close
to the wire as the environment allows: a live TCP server thread speaks
a tiny length-prefixed file protocol, and an injected paramiko double
drives it over a REAL socket — so SFTPSource / RetryingFetcher are
exercised against actual connection lifecycle (connect, auth reject,
socket teardown), actual streamed byte transfer, and an actual
mid-transfer truncation (the failure S2's size-verify + retry exists
for; reference behavior: /root/reference/python/
01_ingest_sftp_pedidos.py:41-88). Unlike the in-memory double in
test_io.py, a leaked connection or an unclosed socket FAILS here.
"""

import os
import socket
import socketserver
import struct
import sys
import threading
import types

import pytest

from sftp_data_ingestion_spark.io.sources import RetryingFetcher, SFTPSource

# ---- the loopback server ----------------------------------------------------

OK = b"+"
ERR = b"-"


def _send_frame(sock, payload: bytes) -> None:
    sock.sendall(struct.pack(">I", len(payload)) + payload)


def _recv_exact(sock, n: int) -> bytes:
    buf = b""
    while len(buf) < n:
        chunk = sock.recv(n - len(buf))
        if not chunk:
            raise ConnectionError("peer closed")
        buf += chunk
    return buf


def _recv_frame(sock) -> bytes:
    (n,) = struct.unpack(">I", _recv_exact(sock, 4))
    return _recv_exact(sock, n)


class _FileServer(socketserver.ThreadingTCPServer):
    """Serves a local directory over the loopback protocol:
    AUTH user pw | LIST dir | GET path | QUIT. ``truncate_first``
    makes the FIRST GET of each path stream only half the bytes and
    drop the connection — the mid-transfer failure mode S2 retries."""

    allow_reuse_address = True
    daemon_threads = True

    def __init__(self, root: str, user: str, pw: str, truncate_first=False):
        self.root = root
        self.creds = (user, pw)
        self.truncate_first = truncate_first
        self.truncated: set[str] = set()
        self.lock = threading.Lock()
        self.live_connections = 0
        super().__init__(("127.0.0.1", 0), _Handler)


class _Handler(socketserver.BaseRequestHandler):
    def handle(self):
        srv: _FileServer = self.server
        with srv.lock:
            srv.live_connections += 1
        try:
            authed = False
            while True:
                try:
                    cmd = _recv_frame(self.request).decode()
                except (ConnectionError, struct.error):
                    return
                verb, _, arg = cmd.partition(" ")
                if verb == "AUTH":
                    user, _, pw = arg.partition(" ")
                    if (user, pw) == srv.creds:
                        authed = True
                        _send_frame(self.request, OK)
                    else:
                        _send_frame(self.request, ERR + b"auth failed")
                        return  # server hangs up on bad auth
                elif not authed:
                    _send_frame(self.request, ERR + b"not authed")
                    return
                elif verb == "LIST":
                    names = sorted(os.listdir(srv.root))
                    lines = [
                        f"{n} {os.path.getsize(os.path.join(srv.root, n))}"
                        for n in names
                        if os.path.isfile(os.path.join(srv.root, n))
                    ]
                    _send_frame(self.request, OK + "\n".join(lines).encode())
                elif verb == "GET":
                    path = os.path.join(srv.root, os.path.basename(arg))
                    if not os.path.isfile(path):
                        _send_frame(self.request, ERR + b"no such file")
                        continue
                    with open(path, "rb") as f:
                        data = f.read()
                    if srv.truncate_first and arg not in srv.truncated:
                        srv.truncated.add(arg)
                        # declare the full length, stream half, hang up
                        self.request.sendall(
                            OK + struct.pack(">I", len(data))
                            + data[: len(data) // 2]
                        )
                        return
                    self.request.sendall(
                        OK + struct.pack(">I", len(data)) + data
                    )
                elif verb == "QUIT":
                    return
                else:
                    _send_frame(self.request, ERR + b"bad verb")
        finally:
            with srv.lock:
                srv.live_connections -= 1


# ---- the socket-speaking paramiko double ------------------------------------


def _socket_paramiko():
    """paramiko double whose Transport/SFTPClient speak the loopback
    protocol over a REAL socket — connection, auth, listing, streamed
    GET, and close all hit the server; nothing is short-circuited."""

    class AuthenticationException(Exception):
        pass

    class Transport:
        def __init__(self, addr):
            self.sock = socket.create_connection(addr, timeout=5)

        def connect(self, username, password):
            _send_frame(self.sock, f"AUTH {username} {password}".encode())
            resp = _recv_frame(self.sock)
            if not resp.startswith(OK):
                raise AuthenticationException(resp[1:].decode())

        def close(self):
            try:
                self.sock.shutdown(socket.SHUT_RDWR)
            except OSError:
                pass
            self.sock.close()

    class SFTPClientImpl:
        def __init__(self, transport):
            self.sock = transport.sock

        def listdir_attr(self, remote_dir):
            _send_frame(self.sock, f"LIST {remote_dir}".encode())
            resp = _recv_frame(self.sock)
            assert resp.startswith(OK)
            out = []
            body = resp[1:].decode()
            for line in body.splitlines():
                name, size = line.rsplit(" ", 1)
                out.append(
                    types.SimpleNamespace(filename=name, st_size=int(size))
                )
            return out

        def get(self, remote_path, dest):
            _send_frame(self.sock, f"GET {remote_path}".encode())
            tag = _recv_exact(self.sock, 1)
            if tag != OK:
                n = struct.unpack(">I", _recv_exact(self.sock, 4))[0]
                raise IOError(_recv_exact(self.sock, n).decode())
            (n,) = struct.unpack(">I", _recv_exact(self.sock, 4))
            # stream to dest exactly as paramiko's get() does: whatever
            # arrives lands in the file; a dropped connection leaves a
            # real partial file behind
            with open(dest, "wb") as f:
                got = 0
                while got < n:
                    chunk = self.sock.recv(min(65536, n - got))
                    if not chunk:
                        raise ConnectionError(
                            f"connection lost at {got}/{n} bytes"
                        )
                    f.write(chunk)
                    got += len(chunk)

        def close(self):
            try:
                _send_frame(self.sock, b"QUIT")
            except OSError:
                pass

    mod = types.ModuleType("paramiko")
    mod.Transport = Transport
    mod.SFTPClient = types.SimpleNamespace(from_transport=SFTPClientImpl)
    mod.AuthenticationException = AuthenticationException
    return mod


@pytest.fixture()
def wire(tmp_path, monkeypatch):
    remote = tmp_path / "remote"
    remote.mkdir()
    servers = []

    def start(**kw):
        srv = _FileServer(str(remote), "user", "pw", **kw)
        threading.Thread(target=srv.serve_forever, daemon=True).start()
        servers.append(srv)
        return srv

    monkeypatch.setitem(sys.modules, "paramiko", _socket_paramiko())
    yield remote, start
    for srv in servers:
        srv.shutdown()
        srv.server_close()


# ---- tests -------------------------------------------------------------------


def test_wire_list_fetch_end_to_end(wire, tmp_path):
    """S1+S2+S5 against a live server: CSV-only case-insensitive
    listing with true remote sizes, sorted order, streamed verified
    download, connection torn down on close."""
    remote, start = wire
    (remote / "b.CSV").write_bytes(b"x;y\n" + b"1;2\n" * 500)
    (remote / "a.csv").write_bytes(b"x;y\n3;4\n")
    (remote / "skip.txt").write_bytes(b"not csv")
    srv = start()

    landing = tmp_path / "novos"
    with SFTPSource("127.0.0.1", srv.server_address[1], "user", "pw", "/up") as src:
        files = src.list_files()
        assert [f.name for f in files] == ["a.csv", "b.CSV"]
        assert files[1].size == len(b"x;y\n" + b"1;2\n" * 500)
        stats = RetryingFetcher(src, sleep_fn=lambda s: None).ingest(
            str(landing)
        )
    assert stats == {"fetched": 2, "skipped": 0, "failed": 0}
    assert (landing / "b.CSV").stat().st_size == files[1].size
    assert not list(landing.glob("*.part"))
    # the connection is really gone
    deadline = threading.Event()
    for _ in range(50):
        if srv.live_connections == 0:
            break
        deadline.wait(0.05)
    assert srv.live_connections == 0


def test_wire_auth_failure_closes_socket(wire):
    """Bad credentials: SFTPSource must raise AND close the real
    socket it opened (the leak the constructor's except guards
    against) — the server sees zero live connections after."""
    remote, start = wire
    srv = start()
    with pytest.raises(Exception, match="auth failed"):
        SFTPSource("127.0.0.1", srv.server_address[1], "user", "WRONG", "/up")
    for _ in range(50):
        if srv.live_connections == 0:
            break
        threading.Event().wait(0.05)
    assert srv.live_connections == 0


def test_wire_truncated_transfer_retries_to_success(wire, tmp_path):
    """Mid-transfer connection loss: the server streams half of each
    file's bytes on the FIRST GET and hangs up, leaving a real partial
    file. S2 must catch it, remove the .part, reconnect-free retry on
    the same source, and verify the full size on the second pass."""
    remote, start = wire
    payload = b"x;y\n" + b"9;9\n" * 1000
    (remote / "data.CSV").write_bytes(payload)
    srv = start(truncate_first=True)

    landing = tmp_path / "novos"
    # the truncating server drops the CONNECTION, so the retry needs a
    # fresh source per attempt — exactly what a reconnect wrapper does
    class Reconnecting:
        def fetch(self, name, dest):
            with SFTPSource(
                "127.0.0.1", srv.server_address[1], "user", "pw", "/up"
            ) as s:
                s.fetch(name, dest)

    with SFTPSource(
        "127.0.0.1", srv.server_address[1], "user", "pw", "/up"
    ) as src:
        files = src.list_files()
    fetcher = RetryingFetcher(Reconnecting(), sleep_fn=lambda s: None)
    os.makedirs(landing, exist_ok=True)
    assert fetcher.fetch_verified(files[0], str(landing))
    assert (landing / "data.CSV").read_bytes() == payload
    assert not list(landing.glob("*.part"))
