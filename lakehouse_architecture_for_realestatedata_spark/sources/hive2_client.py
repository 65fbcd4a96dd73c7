"""Minimal pure-Python HiveServer2 wire client (thrift binary + SASL PLAIN).

The serving path's bundled-beeline client (``catalog.thrift_sql``) pays a
fresh JVM spawn per statement (~1.5-2 s with the full Spark jar classpath)
— pure client-side overhead that at 100 TB scale multiplies across every
dashboard/dbt statement. This module speaks the SAME wire protocol the
JDBC driver speaks — TCP socket → thrift SASL transport (PLAIN) → thrift
binary protocol → TCLIService RPCs (OpenSession / ExecuteStatement /
GetResultSetMetadata / FetchResults / CloseOperation / CloseSession) — with
zero subprocesses. Nothing shortcuts the in-process SparkSession: every
byte crosses the server's listening socket exactly as beeline's would.

Protocol references (all public): Apache Thrift binary-protocol + SASL
transport framing (thrift/doc/specs), Apache Hive service-rpc
``TCLIService.thrift`` (field ids below mirror the IDL), HiveServer2
client docs. Columnar result sets require protocol >= V6; Spark's bundled
HiveServer2 (Hive 2.3.x) speaks up to V10.

Scope: SELECT-style statements returning modest result sets (the serving
front door's shape). Types surface as Python values; ``thrift_sql``-style
callers stringify/cast as needed.
"""

from __future__ import annotations

import io
import socket
import struct

# --- thrift binary-protocol type codes ---
T_STOP = 0
T_BOOL = 2
T_BYTE = 3
T_DOUBLE = 4
T_I16 = 6
T_I32 = 8
T_I64 = 10
T_STRING = 11  # also binary
T_STRUCT = 12
T_MAP = 13
T_SET = 14
T_LIST = 15

_MSG_CALL = 1
_MSG_REPLY = 2
_MSG_EXCEPTION = 3
_VERSION_1 = 0x80010000

# SASL negotiation status bytes (thrift TSaslTransport)
_SASL_START = 1
_SASL_OK = 2
_SASL_BAD = 3
_SASL_ERROR = 4
_SASL_COMPLETE = 5


class _Writer:
    """Thrift binary-protocol writer over a bytearray."""

    def __init__(self) -> None:
        self.buf = bytearray()

    def message_begin(self, name: str, seqid: int) -> None:
        self.i32(_VERSION_1 | _MSG_CALL)
        self.string(name)
        self.i32(seqid)

    def field(self, ftype: int, fid: int) -> None:
        self.buf.append(ftype)
        self.buf += struct.pack(">h", fid)

    def stop(self) -> None:
        self.buf.append(T_STOP)

    def boolean(self, v: bool) -> None:
        self.buf.append(1 if v else 0)

    def i16(self, v: int) -> None:
        self.buf += struct.pack(">h", v)

    def i32(self, v: int) -> None:
        v &= 0xFFFFFFFF
        self.buf += struct.pack(">i", v - (1 << 32) if v > 0x7FFFFFFF else v)

    def i64(self, v: int) -> None:
        self.buf += struct.pack(">q", v)

    def string(self, v: str | bytes) -> None:
        b = v.encode() if isinstance(v, str) else v
        self.buf += struct.pack(">i", len(b))
        self.buf += b

    def map_begin(self, ktype: int, vtype: int, size: int) -> None:
        self.buf.append(ktype)
        self.buf.append(vtype)
        self.buf += struct.pack(">i", size)


class _Reader:
    """Thrift binary-protocol reader producing plain Python values.

    Structs decode to ``{field_id: value}`` dicts — the caller indexes by
    the TCLIService IDL field ids. Strings decode as bytes (callers decode
    utf-8 where the IDL says string; GUID/secret stay bytes)."""

    def __init__(self, data: bytes) -> None:
        self.s = io.BytesIO(data)

    def _read(self, n: int) -> bytes:
        b = self.s.read(n)
        if len(b) != n:
            raise EOFError("truncated thrift payload")
        return b

    def message_begin(self) -> tuple[str, int, int]:
        ver = struct.unpack(">i", self._read(4))[0]
        if ver >= 0:
            raise ValueError("unframed/old-style thrift message not supported")
        mtype = ver & 0xFF
        name = self._read(struct.unpack(">i", self._read(4))[0]).decode()
        seqid = struct.unpack(">i", self._read(4))[0]
        return name, mtype, seqid

    def value(self, ftype: int):
        if ftype == T_BOOL:
            return self._read(1) != b"\x00"
        if ftype == T_BYTE:
            return struct.unpack(">b", self._read(1))[0]
        if ftype == T_DOUBLE:
            return struct.unpack(">d", self._read(8))[0]
        if ftype == T_I16:
            return struct.unpack(">h", self._read(2))[0]
        if ftype == T_I32:
            return struct.unpack(">i", self._read(4))[0]
        if ftype == T_I64:
            return struct.unpack(">q", self._read(8))[0]
        if ftype == T_STRING:
            return self._read(struct.unpack(">i", self._read(4))[0])
        if ftype == T_STRUCT:
            return self.struct()
        if ftype == T_LIST or ftype == T_SET:
            etype = self._read(1)[0]
            n = struct.unpack(">i", self._read(4))[0]
            return [self.value(etype) for _ in range(n)]
        if ftype == T_MAP:
            ktype, vtype = self._read(1)[0], self._read(1)[0]
            n = struct.unpack(">i", self._read(4))[0]
            return {self.value(ktype): self.value(vtype) for _ in range(n)}
        raise ValueError(f"unknown thrift type {ftype}")

    def struct(self) -> dict[int, object]:
        out: dict[int, object] = {}
        while True:
            ftype = self._read(1)[0]
            if ftype == T_STOP:
                return out
            fid = struct.unpack(">h", self._read(2))[0]
            out[fid] = self.value(ftype)


class Hive2WireError(RuntimeError):
    pass


class Hive2Client:
    """One SASL-PLAIN thrift connection + one HiveServer2 session."""

    def __init__(
        self,
        host: str = "127.0.0.1",
        port: int = 10000,
        username: str = "anonymous",
        password: str = "anonymous",
        timeout: float = 120.0,
    ) -> None:
        self._seq = 0
        self.sock = socket.create_connection((host, port), timeout=timeout)
        try:
            self._sasl_plain_handshake(username, password)
            self.session = self._open_session(username, password)
        except BaseException:
            self.sock.close()
            raise

    # --- transport ---

    def _sasl_send(self, status: int, payload: bytes) -> None:
        self.sock.sendall(bytes([status]) + struct.pack(">i", len(payload)) + payload)

    def _recv_exact(self, n: int) -> bytes:
        chunks = []
        while n:
            b = self.sock.recv(n)
            if not b:
                raise Hive2WireError("connection closed during read")
            chunks.append(b)
            n -= len(b)
        return b"".join(chunks)

    def _sasl_recv(self) -> tuple[int, bytes]:
        hdr = self._recv_exact(5)
        status, ln = hdr[0], struct.unpack(">i", hdr[1:])[0]
        return status, self._recv_exact(ln) if ln else b""

    def _sasl_plain_handshake(self, user: str, password: str) -> None:
        self._sasl_send(_SASL_START, b"PLAIN")
        self._sasl_send(_SASL_OK, b"\x00" + user.encode() + b"\x00" + password.encode())
        status, payload = self._sasl_recv()
        if status != _SASL_COMPLETE:
            raise Hive2WireError(
                f"SASL PLAIN handshake failed: status={status} {payload[:200]!r}"
            )

    def _call(self, method: str, req_writer) -> dict[int, object]:
        """One framed RPC: method(args struct with the req at field 1)."""
        self._seq += 1
        w = _Writer()
        w.message_begin(method, self._seq)
        w.field(T_STRUCT, 1)
        req_writer(w)
        w.stop()  # end args struct
        frame = bytes(w.buf)
        self.sock.sendall(struct.pack(">i", len(frame)) + frame)
        ln = struct.unpack(">i", self._recv_exact(4))[0]
        r = _Reader(self._recv_exact(ln))
        name, mtype, _ = r.message_begin()
        if mtype == _MSG_EXCEPTION:
            exc = r.struct()
            raise Hive2WireError(
                f"{method} TApplicationException: {exc.get(1, b'').decode(errors='replace')}"
            )
        reply = r.struct()
        resp = reply.get(0)
        if not isinstance(resp, dict):
            raise Hive2WireError(f"{method}: malformed reply {reply!r}")
        self._check_status(method, resp.get(1))
        return resp

    @staticmethod
    def _check_status(method: str, status) -> None:
        # TStatus: 1 statusCode (0 SUCCESS, 1 SUCCESS_WITH_INFO), 5 errorMessage
        if isinstance(status, dict) and status.get(1, 0) not in (0, 1):
            msg = status.get(5, b"")
            msg = msg.decode(errors="replace") if isinstance(msg, bytes) else msg
            raise Hive2WireError(f"{method} failed: {msg}")

    # --- TCLIService RPCs ---

    @staticmethod
    def _write_handle(w: _Writer, fid: int, handle: dict) -> None:
        """Write a TSessionHandle/TOperationHandle parsed earlier (echo the
        exact guid/secret bytes; include operationType/hasResultSet for
        operation handles)."""
        w.field(T_STRUCT, fid)
        ident = handle[1]  # THandleIdentifier at field 1
        w.field(T_STRUCT, 1)
        w.field(T_STRING, 1)
        w.string(ident[1])
        w.field(T_STRING, 2)
        w.string(ident[2])
        w.stop()
        if 2 in handle:  # TOperationHandle.operationType
            w.field(T_I32, 2)
            w.i32(handle[2])
        if 3 in handle:  # TOperationHandle.hasResultSet
            w.field(T_BOOL, 3)
            w.boolean(bool(handle[3]))
        w.stop()

    def _open_session(self, user: str, password: str) -> dict:
        def req(w: _Writer) -> None:
            w.field(T_I32, 1)
            w.i32(9)  # TProtocolVersion V10; server negotiates down if needed
            w.field(T_STRING, 2)
            w.string(user)
            w.field(T_STRING, 3)
            w.string(password)
            w.stop()

        resp = self._call("OpenSession", req)
        handle = resp.get(3)
        if not isinstance(handle, dict):
            raise Hive2WireError("OpenSession returned no session handle")
        return handle

    def execute(self, sql: str) -> dict:
        """Blocking ExecuteStatement; returns the TOperationHandle."""

        def req(w: _Writer) -> None:
            self._write_handle(w, 1, self.session)
            w.field(T_STRING, 2)
            w.string(sql)
            w.stop()

        resp = self._call("ExecuteStatement", req)
        op = resp.get(2)
        if not isinstance(op, dict):
            raise Hive2WireError("ExecuteStatement returned no operation handle")
        return op

    def column_names(self, op: dict) -> list[str]:
        def req(w: _Writer) -> None:
            self._write_handle(w, 1, op)
            w.stop()

        resp = self._call("GetResultSetMetadata", req)
        schema = resp.get(2) or {}
        cols = schema.get(1) or []
        return [c[1].decode() for c in cols]  # TColumnDesc.columnName

    def fetch_all(self, op: dict, batch_rows: int = 10_000) -> list[list]:
        """FETCH_NEXT until exhausted; decodes columnar TRowSet (V6+)."""
        out_cols: list[list] = []
        while True:
            def req(w: _Writer) -> None:
                self._write_handle(w, 1, op)
                w.field(T_I32, 2)
                w.i32(0)  # FETCH_NEXT
                w.field(T_I64, 3)
                w.i64(batch_rows)
                w.stop()

            resp = self._call("FetchResults", req)
            rowset = resp.get(3) or {}
            cols = rowset.get(3) or []
            decoded = [self._decode_column(c) for c in cols]
            if not decoded or not decoded[0]:
                break
            if not out_cols:
                out_cols = decoded
            else:
                for acc, new in zip(out_cols, decoded):
                    acc.extend(new)
            if len(decoded[0]) < batch_rows:
                break
        if not out_cols:
            return []
        return [list(row) for row in zip(*out_cols)]

    @staticmethod
    def _decode_column(col: dict) -> list:
        # TColumn union: exactly one field set; T*Column = {1: values, 2: nulls}
        (fid, payload), = col.items()
        values = payload[1]
        nulls = payload[2]
        if fid == 7:  # stringVal
            values = [v.decode() for v in values]
        out = list(values)
        # nulls: little-endian bitmask over row positions
        if isinstance(nulls, (bytes, bytearray)) and any(nulls):
            for i in range(len(out)):
                if i // 8 < len(nulls) and (nulls[i // 8] >> (i % 8)) & 1:
                    out[i] = None
        return out

    def close_operation(self, op: dict) -> None:
        def req(w: _Writer) -> None:
            self._write_handle(w, 1, op)
            w.stop()

        self._call("CloseOperation", req)

    def close(self) -> None:
        try:
            def req(w: _Writer) -> None:
                self._write_handle(w, 1, self.session)
                w.stop()

            self._call("CloseSession", req)
        finally:
            self.sock.close()


def wire_sql(
    port: int, sql: str, host: str = "127.0.0.1", timeout: float = 120.0
) -> tuple[list[str], list[list[str]]]:
    """``thrift_sql``-shaped convenience: one connection, one statement,
    (columns, rows-as-strings). NULL → empty string, matching beeline
    csv2's rendering so the two transports are drop-in equivalent."""
    cli = Hive2Client(port=port, host=host, timeout=timeout)
    try:
        op = cli.execute(sql)
        cols = cli.column_names(op)
        rows = cli.fetch_all(op)
        cli.close_operation(op)
    finally:
        cli.close()
    def render(v) -> str:
        if v is None:
            return ""
        if isinstance(v, bool):  # csv2 prints lowercase true/false
            return "true" if v else "false"
        return str(v)

    return cols, [[render(v) for v in row] for row in rows]
