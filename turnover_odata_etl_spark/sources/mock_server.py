"""In-process mock OData server for connector tests.

Serves an in-memory entity set over HTTP with the protocol surface the
connector exercises: ``$select``/``$filter`` (eq, with ``''`` quote
un-escaping)/``$top``/``$format``, V2 (``d.results`` + ``__next``) or
V4 (``value`` + ``@odata.nextLink``) envelopes, server-driven
pagination, 404-with-segment-message for unknown ``$select`` fields
(drives the schema probe), and an optional per-value failure (drives
the skip-bad-partition option).
"""

from __future__ import annotations

import json
import re
import threading
import urllib.parse
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

# Quote-aware: the value is a run of non-quotes or doubled quotes.
# Grammar: conjunctions of `field op literal` terms where op ∈
# {eq, gt, le} and the literal is quoted (string) or bare (numeric) —
# the subset the connector emits (eq pushdown + incremental-stream
# cursor bounds). Anything else fails loudly (400) instead of silently
# matching.
_TERM_RE = re.compile(
    r"^\s*(\w+)\s+(eq|gt|le)\s+(?:'((?:[^']|'')*)'|(-?\d+(?:\.\d+)?))\s*$",
    re.DOTALL,
)


def _split_conjuncts(filt: str) -> list[str]:
    """Split a ``$filter`` on ``' and '`` OUTSIDE single-quoted string
    literals (doubled ``''`` is the in-literal escape, so a quote char
    simply toggles in/out-of-literal state — an escaped quote toggles
    twice and lands back inside). A naive ``split(" and ")`` would cut
    a pushed-down value like ``'rock and roll'`` in half."""
    parts, buf, in_quote = [], [], False
    i, n = 0, len(filt)
    while i < n:
        ch = filt[i]
        if ch == "'":
            in_quote = not in_quote
            buf.append(ch)
            i += 1
        elif not in_quote and filt.startswith(" and ", i):
            parts.append("".join(buf))
            buf = []
            i += 5
        else:
            buf.append(ch)
            i += 1
    parts.append("".join(buf))
    return parts


def _cmp(row_value, op: str, literal: str, quoted: bool) -> bool:
    s = str(row_value)
    if not quoted:
        try:
            a, b = float(s), float(literal)
        except (TypeError, ValueError):
            return False
        return {"eq": a == b, "gt": a > b, "le": a <= b}[op]
    return {"eq": s == literal, "gt": s > literal, "le": s <= literal}[op]


class MockOData:
    def __init__(
        self,
        rows: list[dict],
        fields: list[str],
        version: int = 2,
        page_size: int = 3,
        fail_values: set[str] | None = None,
        fail_field: str | None = None,
        field_types: dict[str, str] | None = None,
        entity_set: str = "Emp",
        key_field: str | None = None,
        relative_next: bool = False,
        fail_first: int = 0,
        fail_status: int = 503,
        retry_after: float | None = None,
        delay: float = 0.0,
    ):
        self.rows = rows
        self.fields = fields
        self.version = version
        self.page_size = page_size
        self.fail_values = fail_values or set()
        self.fail_field = fail_field
        # EDM types served by /$metadata (default: everything a string,
        # matching the wire payloads the row dicts actually carry)
        self.field_types = field_types or {}
        self.entity_set = entity_set
        # SAP V2 gateways emit __next RELATIVE to the service root;
        # opt in to exercise the client's link absolutization.
        self.relative_next = relative_next
        # Transient-failure injection: the first ``fail_first``
        # requests answer ``fail_status`` (with an optional numeric
        # Retry-After header) before the server recovers — drives the
        # client's bounded-retry path.
        self.fail_first = fail_first
        self.fail_status = fail_status
        self.retry_after = retry_after
        # Simulated round-trip latency per request — drives the page-
        # prefetch throughput A/B (SCALE.md).
        self.delay = delay
        self.requests: list[str] = []  # observed (for pushdown asserts)
        # Change tracking (OData V4 delta links): every apply_upsert/
        # apply_delete appends to the changelog; a tracked read's
        # deltaLink carries the current sequence as $deltatoken, and a
        # delta request replays entries beyond it (@removed tombstones
        # for deletes) ending in a fresh link.
        self.key_field = key_field or (fields[0] if fields else "Id")
        self.change_seq = 0
        self.changelog: list[tuple[int, str, dict]] = []
        self._httpd: ThreadingHTTPServer | None = None

    # -- server-side mutations (drive the delta-link tests) -----------------

    def apply_upsert(self, row: dict) -> None:
        key = row.get(self.key_field)
        for i, r in enumerate(self.rows):
            if r.get(self.key_field) == key:
                self.rows[i] = dict(row)
                break
        else:
            self.rows.append(dict(row))
        self.change_seq += 1
        self.changelog.append((self.change_seq, "upsert", dict(row)))

    def apply_delete(self, key_value) -> None:
        self.rows = [
            r for r in self.rows if r.get(self.key_field) != key_value
        ]
        self.change_seq += 1
        self.changelog.append(
            (self.change_seq, "delete", {self.key_field: key_value})
        )

    # -- request handling ---------------------------------------------------

    def metadata_document(self) -> str:
        """A minimal CSDL document in the generation matching
        ``version`` (V2: microsoft ado namespace; V4: oasis)."""
        edm_ns = (
            "http://docs.oasis-open.org/odata/ns/edm"
            if self.version == 4
            else "http://schemas.microsoft.com/ado/2008/09/edm"
        )
        props = "".join(
            f'<Property Name="{f}" Type="{self.field_types.get(f, "Edm.String")}" '
            'Nullable="true"/>'
            for f in self.fields
        )
        return (
            '<?xml version="1.0" encoding="utf-8"?>'
            '<edmx:Edmx xmlns:edmx="http://schemas.microsoft.com/ado/2007/06/edmx" '
            'Version="1.0"><edmx:DataServices>'
            f'<Schema xmlns="{edm_ns}" Namespace="Mock">'
            f'<EntityType Name="{self.entity_set}Type">{props}</EntityType>'
            "<EntityContainer Name=\"Container\">"
            f'<EntitySet Name="{self.entity_set}" '
            f'EntityType="Mock.{self.entity_set}Type"/>'
            "</EntityContainer></Schema>"
            "</edmx:DataServices></edmx:Edmx>"
        )

    def handle(
        self,
        path: str,
        query: dict[str, list[str]],
        headers: dict[str, str] | None = None,
    ) -> tuple[int, dict | str]:
        if path.rstrip("/").endswith("$metadata"):
            return 200, self.metadata_document()
        qs = {k: v[0] for k, v in query.items()}
        if "$deltatoken" in qs:
            return self._handle_delta(path, qs)
        select = qs.get("$select")
        filt = qs.get("$filter")
        top = int(qs["$top"]) if "$top" in qs else None
        skip = int(qs.get("$skiptoken", "0"))

        if select:
            for f in select.split(","):
                if f not in self.fields:
                    return 404, (
                        "Resource not found for the segment "
                        f"'{f}' of the request URL."
                    )

        rows = self.rows
        if filt:
            terms = []
            for part in _split_conjuncts(filt):
                m = _TERM_RE.match(part)
                if not m:
                    return 400, f"unsupported $filter: {filt}"
                field, op = m.group(1), m.group(2)
                quoted = m.group(3) is not None
                raw = m.group(3) if quoted else m.group(4)
                value = raw.replace("''", "'") if quoted else raw
                if (
                    op == "eq"
                    and self.fail_field == field
                    and value in self.fail_values
                ):
                    return 500, f"simulated backend failure for {field}={value!r}"
                terms.append((field, op, value, quoted))
            rows = [
                r
                for r in rows
                if all(_cmp(r.get(f), op, v, q) for f, op, v, q in terms)
            ]

        if select:
            cols = select.split(",")
            rows = [{c: r.get(c) for c in cols} for r in rows]
        if top is not None:
            rows = rows[:top]

        page = rows[skip : skip + self.page_size]
        has_more = skip + self.page_size < len(rows)
        next_link = None
        if has_more:
            nq = dict(qs)
            nq["$skiptoken"] = str(skip + self.page_size)
            if self.relative_next:
                next_link = f"{path.lstrip('/')}?{urllib.parse.urlencode(nq)}"
            else:
                next_link = f"{self.base_url}{path}?{urllib.parse.urlencode(nq)}"

        if self.version == 2:
            d: dict = {"results": page}
            if next_link:
                d["__next"] = next_link
            # V2 has no delta links: Prefer: odata.track-changes is
            # silently ignored (spec-accurate — drives the client's
            # loud no-deltaLink failure).
            return 200, {"d": d}
        body: dict = {"value": page}
        if next_link:
            body["@odata.nextLink"] = next_link
        elif self.version == 4 and "odata.track-changes" in (
            (headers or {}).get("Prefer", "")
        ):
            body["@odata.deltaLink"] = (
                f"{self.base_url}{path}?$deltatoken={self.change_seq}"
            )
        return 200, body

    def _handle_delta(
        self, path: str, qs: dict[str, str]
    ) -> tuple[int, dict]:
        """Serve a delta request: changelog entries beyond $deltatoken,
        paginated, @removed tombstones for deletes, fresh deltaLink on
        the final page (OData V4 §11.3)."""
        token = int(qs["$deltatoken"])
        skip = int(qs.get("$skiptoken", "0"))
        pending = [e for e in self.changelog if e[0] > token]
        page = pending[skip : skip + self.page_size]
        out = []
        for _seq, kind, data in page:
            if kind == "delete":
                out.append({"@removed": {"reason": "deleted"}, **data})
            else:
                out.append(data)
        body: dict = {"value": out}
        if skip + self.page_size < len(pending):
            nq = {
                "$deltatoken": str(token),
                "$skiptoken": str(skip + self.page_size),
            }
            body["@odata.nextLink"] = (
                f"{self.base_url}{path}?{urllib.parse.urlencode(nq)}"
            )
        else:
            body["@odata.deltaLink"] = (
                f"{self.base_url}{path}?$deltatoken={self.change_seq}"
            )
        return 200, body

    # -- lifecycle ----------------------------------------------------------

    def start(self) -> str:
        mock = self

        class Handler(BaseHTTPRequestHandler):
            def do_GET(self):
                parsed = urllib.parse.urlparse(self.path)
                mock.requests.append(self.path)
                if mock.delay:
                    import time

                    time.sleep(mock.delay)
                if mock.fail_first > 0:
                    mock.fail_first -= 1
                    payload = b"simulated transient failure"
                    self.send_response(mock.fail_status)
                    self.send_header("Content-Type", "text/plain")
                    self.send_header("Content-Length", str(len(payload)))
                    if mock.retry_after is not None:
                        self.send_header("Retry-After", str(mock.retry_after))
                    self.end_headers()
                    self.wfile.write(payload)
                    return
                status, body = mock.handle(
                    parsed.path,
                    urllib.parse.parse_qs(parsed.query),
                    dict(self.headers),
                )
                payload = (
                    json.dumps(body) if isinstance(body, dict) else body
                ).encode()
                self.send_response(status)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(payload)))
                self.end_headers()
                self.wfile.write(payload)

            def log_message(self, *args):  # quiet
                pass

        self._httpd = ThreadingHTTPServer(("127.0.0.1", 0), Handler)
        self.base_url = f"http://127.0.0.1:{self._httpd.server_port}"
        threading.Thread(target=self._httpd.serve_forever, daemon=True).start()
        return self.base_url

    def stop(self) -> None:
        if self._httpd:
            self._httpd.shutdown()
            self._httpd.server_close()
