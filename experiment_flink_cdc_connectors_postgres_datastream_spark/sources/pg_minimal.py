"""Minimal pure-Python PostgreSQL client (psycopg2-compatible subset).

Why this exists: the CDC source's DB access layer
(`postgres_cdc.PostgresReplicationClient`) speaks through a tiny
psycopg2 surface — ``connect()``, cursor ``execute/fetchone/fetchall``
/ iteration, ``description``, context managers. Environments without
psycopg2 (like this container) can still run the LIVE integration
test against a real server through this fallback, which implements
exactly that subset over the PostgreSQL frontend/backend protocol
v3.0 (documented at postgresql.org/docs/current/protocol.html; simple
query flow §55.2.2).

Deliberate scope limits (test/integration harness, not a pool-ready
driver):

- Simple Query protocol only — statements are sent as text, so each
  ``execute`` autocommits unless an explicit BEGIN is issued (matches
  the ``autocommit = True`` mode every caller here uses).
- Client-side parameter rendering for ``%s`` placeholders (strings
  via standard_conforming '' doubling + E'' escapes for backslashes,
  ints/floats/bools/None/lists natively) — the callers only bind
  trusted test values, never untrusted input.
- Auth: trust, cleartext password, md5, and SCRAM-SHA-256 (RFC 7677,
  no channel binding — the default ``scram-sha-256`` HBA method on
  modern Postgres; the SCRAM proof computation is a pure function
  unit-tested against the RFC's published test vectors).
- Text result format, decoded to Python types by field OID: bool,
  int2/4/8, oid/xid, float4/8, numeric → float, bytea (``\\x`` hex)
  → bytes, everything else → str; NULL → None.
"""

from __future__ import annotations

import hashlib
import socket
import struct

# type OIDs (pg_type.dat — stable, documented catalog numbers)
_OID_BOOL = 16
_OID_BYTEA = 17
_OID_INT8 = 20
_OID_INT2 = 21
_OID_INT4 = 23
_OID_OID = 26
_OID_XID = 28
_OID_FLOAT4 = 700
_OID_FLOAT8 = 701
_OID_NUMERIC = 1700


class DatabaseError(Exception):
    """Server-reported error (ErrorResponse), message preserved."""


def scram_sha256_client_final(
    password: str, client_first_bare: str, server_first: str
) -> tuple[str, str]:
    """SCRAM-SHA-256 client-final-message + expected server signature
    (RFC 5802 algorithm with SHA-256 per RFC 7677), gs2 header "n,,"
    (no channel binding → ``c=biws``).

    Pure function so the proof math is unit-testable against the RFC
    7677 §3 test vectors without a server."""
    import base64
    import hmac as _hmac

    attrs = dict(p.split("=", 1) for p in server_first.split(","))
    full_nonce, salt, iters = attrs["r"], base64.b64decode(attrs["s"]), int(attrs["i"])
    salted = hashlib.pbkdf2_hmac("sha256", password.encode(), salt, iters)
    client_key = _hmac.new(salted, b"Client Key", hashlib.sha256).digest()
    stored_key = hashlib.sha256(client_key).digest()
    without_proof = f"c=biws,r={full_nonce}"
    auth_message = f"{client_first_bare},{server_first},{without_proof}".encode()
    client_sig = _hmac.new(stored_key, auth_message, hashlib.sha256).digest()
    proof = bytes(a ^ b for a, b in zip(client_key, client_sig))
    server_key = _hmac.new(salted, b"Server Key", hashlib.sha256).digest()
    server_sig = _hmac.new(server_key, auth_message, hashlib.sha256).digest()
    return (
        f"{without_proof},p={base64.b64encode(proof).decode()}",
        base64.b64encode(server_sig).decode(),
    )


def _decode(val: bytes | None, oid: int):
    if val is None:
        return None
    txt = val.decode("utf-8")
    if oid == _OID_BOOL:
        return txt == "t"
    if oid in (_OID_INT2, _OID_INT4, _OID_INT8, _OID_OID, _OID_XID):
        return int(txt)
    if oid in (_OID_FLOAT4, _OID_FLOAT8, _OID_NUMERIC):
        return float(txt)
    if oid == _OID_BYTEA:
        if txt.startswith("\\x"):
            return bytes.fromhex(txt[2:])
        return val  # escape format (legacy) — hand back raw bytes
    return txt


def _quote(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "TRUE" if v else "FALSE"
    if isinstance(v, float):
        # repr() of non-finite floats is bare `inf`/`nan`, which is not
        # valid SQL; render the quoted spellings Postgres accepts for
        # float8 input (same concern as similarity.py's _fd for Spark
        # literals).
        if v != v:
            return "'NaN'::float8"
        if v == float("inf"):
            return "'Infinity'::float8"
        if v == float("-inf"):
            return "'-Infinity'::float8"
        return repr(v)
    if isinstance(v, int):
        return repr(v)
    if isinstance(v, (list, tuple)):
        return "ARRAY[" + ",".join(_quote(x) for x in v) + "]"
    s = str(v)
    if "\\" in s:
        return "E'" + s.replace("\\", "\\\\").replace("'", "''") + "'"
    return "'" + s.replace("'", "''") + "'"


class Cursor:
    def __init__(self, conn: "Connection"):
        self._conn = conn
        self.description = None
        self._rows: list[tuple] = []
        self._pos = 0

    # -- psycopg2-compatible surface ------------------------------------
    def execute(self, sql: str, params=None) -> None:
        if params is not None:
            sql = sql % tuple(_quote(p) for p in params)
        self.description, self._rows = self._conn._query(sql)
        self._pos = 0

    def executemany(self, sql: str, seq_of_params) -> None:
        """Batched execute (the surface ``JdbcUpsertSink`` uses).

        All rendered statements for one chunk are sent in a SINGLE
        simple-query message: the v3 protocol runs a multi-statement
        simple query inside one implicit transaction (§55.2.2.1), so a
        chunk applies atomically and costs one round trip, which is the
        property a per-partition batched upsert wants. Chunked to keep
        the message size bounded."""
        chunk = 500
        stmts = [sql % tuple(_quote(p) for p in params) for params in seq_of_params]
        for i in range(0, len(stmts), chunk):
            self.description, self._rows = self._conn._query(
                "; ".join(stmts[i : i + chunk])
            )
            self._pos = 0

    def fetchone(self):
        if self._pos >= len(self._rows):
            return None
        row = self._rows[self._pos]
        self._pos += 1
        return row

    def fetchall(self):
        rows = self._rows[self._pos :]
        self._pos = len(self._rows)
        return rows

    def __iter__(self):
        while True:
            row = self.fetchone()
            if row is None:
                return
            yield row

    def close(self) -> None:
        self._rows = []

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
        return False


class Connection:
    def __init__(self, host: str, port: int, dbname: str, user: str, password: str):
        self.autocommit = True  # simple-query flow autocommits anyway
        self._closed = False
        if host.startswith("/"):
            self._sock = socket.socket(socket.AF_UNIX, socket.SOCK_STREAM)
            self._sock.connect(f"{host}/.s.PGSQL.{port}")
        else:
            self._sock = socket.create_connection((host, port))
        self._buf = b""
        self._startup(user, dbname, password)

    # -- wire helpers ---------------------------------------------------
    def _send(self, msg_type: bytes, payload: bytes) -> None:
        self._sock.sendall(msg_type + struct.pack(">I", len(payload) + 4) + payload)

    def _recv_exact(self, n: int) -> bytes:
        while len(self._buf) < n:
            chunk = self._sock.recv(65536)
            if not chunk:
                raise DatabaseError("server closed connection")
            self._buf += chunk
        out, self._buf = self._buf[:n], self._buf[n:]
        return out

    def _recv_msg(self) -> tuple[bytes, bytes]:
        head = self._recv_exact(5)
        typ = head[:1]
        (length,) = struct.unpack(">I", head[1:5])
        return typ, self._recv_exact(length - 4)

    @staticmethod
    def _error_text(payload: bytes) -> str:
        fields = {}
        for part in payload.split(b"\x00"):
            if part:
                fields[chr(part[0])] = part[1:].decode("utf-8", "replace")
        return f"{fields.get('S', 'ERROR')}: {fields.get('M', '?')} ({fields.get('C', '')})"

    def _startup(self, user: str, dbname: str, password: str) -> None:
        params = f"user\x00{user}\x00database\x00{dbname}\x00\x00".encode()
        payload = struct.pack(">I", 196608) + params  # protocol 3.0
        self._sock.sendall(struct.pack(">I", len(payload) + 4) + payload)
        scram_bare = ""
        scram_server_sig = ""
        while True:
            typ, body = self._recv_msg()
            if typ == b"R":
                (code,) = struct.unpack(">I", body[:4])
                if code == 0:  # AuthenticationOk
                    continue
                if code == 3:  # cleartext
                    self._send(b"p", password.encode() + b"\x00")
                    continue
                if code == 5:  # md5(md5(password+user)+salt)
                    salt = body[4:8]
                    inner = hashlib.md5(password.encode() + user.encode()).hexdigest()
                    digest = hashlib.md5(inner.encode() + salt).hexdigest()
                    self._send(b"p", b"md5" + digest.encode() + b"\x00")
                    continue
                if code == 10:  # AuthenticationSASL: pick SCRAM-SHA-256
                    mechs = [m for m in body[4:].split(b"\x00") if m]
                    if b"SCRAM-SHA-256" not in mechs:
                        raise DatabaseError(
                            f"no supported SASL mechanism in {mechs!r} "
                            "(channel-binding-only servers are not supported)"
                        )
                    import secrets  # noqa: PLC0415

                    scram_bare = f"n=,r={secrets.token_urlsafe(18)}"
                    initial = f"n,,{scram_bare}".encode()
                    self._send(
                        b"p",
                        b"SCRAM-SHA-256\x00"
                        + struct.pack(">i", len(initial))
                        + initial,
                    )
                    continue
                if code == 11:  # AuthenticationSASLContinue: server-first
                    server_first = body[4:].decode()
                    final, scram_server_sig = scram_sha256_client_final(
                        password, scram_bare, server_first
                    )
                    self._send(b"p", final.encode())
                    continue
                if code == 12:  # AuthenticationSASLFinal: verify server sig
                    attrs = dict(
                        p.split("=", 1) for p in body[4:].decode().split(",")
                    )
                    if attrs.get("v") != scram_server_sig:
                        raise DatabaseError("SCRAM server signature mismatch")
                    continue
                raise DatabaseError(
                    f"unsupported auth method {code} "
                    "(this client speaks trust/password/md5/scram-sha-256)"
                )
            if typ in (b"S", b"K", b"N"):  # ParameterStatus/BackendKeyData/Notice
                continue
            if typ == b"E":
                raise DatabaseError(self._error_text(body))
            if typ == b"Z":  # ReadyForQuery
                return

    def _query(self, sql: str):
        if self._closed:
            raise DatabaseError("connection is closed")
        self._send(b"Q", sql.encode() + b"\x00")
        description = None
        oids: list[int] = []
        rows: list[tuple] = []
        error: str | None = None
        while True:
            typ, body = self._recv_msg()
            if typ == b"T":  # RowDescription
                (nfields,) = struct.unpack(">H", body[:2])
                off = 2
                description, oids = [], []
                for _ in range(nfields):
                    end = body.index(b"\x00", off)
                    name = body[off:end].decode()
                    off = end + 1
                    _tbl, _att, typoid, _tlen, _tmod, _fmt = struct.unpack(
                        ">IHIhiH", body[off : off + 18]
                    )
                    off += 18
                    description.append((name, typoid, None, None, None, None, None))
                    oids.append(typoid)
            elif typ == b"D":  # DataRow
                (ncols,) = struct.unpack(">H", body[:2])
                off = 2
                vals = []
                for i in range(ncols):
                    (ln,) = struct.unpack(">i", body[off : off + 4])
                    off += 4
                    if ln == -1:
                        vals.append(None)
                    else:
                        vals.append(_decode(body[off : off + ln], oids[i]))
                        off += ln
                rows.append(tuple(vals))
            elif typ == b"E":
                error = self._error_text(body)
            elif typ == b"Z":  # ReadyForQuery — statement finished
                if error is not None:
                    raise DatabaseError(error)
                return description, rows
            # 'C' CommandComplete, 'N' Notice, 'I' EmptyQuery, 'S' — skip

    # -- psycopg2-compatible surface ------------------------------------
    def cursor(self) -> Cursor:
        return Cursor(self)

    def commit(self) -> None:  # simple-query flow: nothing buffered
        pass

    def rollback(self) -> None:
        pass

    def close(self) -> None:
        if not self._closed:
            try:
                self._send(b"X", b"")  # Terminate
            except Exception:
                pass
            self._sock.close()
            self._closed = True

    def __enter__(self):
        return self

    def __exit__(self, exc_type, *exc):
        # psycopg2 semantics commit/rollback WITHOUT closing; every
        # caller here opens a fresh connection per block, so closing is
        # the resource-correct behavior for this harness client
        self.close()
        return False


def connect(dsn: str | None = None, **kwargs) -> Connection:
    """``connect("host=… port=… dbname=… user=… password=…")`` or
    keyword form — the two call shapes the CDC code paths use."""
    params: dict[str, str] = {}
    if dsn:
        params.update(dict(kv.split("=", 1) for kv in dsn.split()))
    params.update({k: v for k, v in kwargs.items() if v is not None})
    return Connection(
        host=str(params.get("host", "localhost")),
        port=int(params.get("port", 5432)),
        dbname=str(params.get("dbname", "postgres")),
        user=str(params.get("user", "postgres")),
        password=str(params.get("password", "")),
    )
