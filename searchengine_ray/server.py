"""Thin stdlib HTTP serving layer — the reference's user-facing REST surface
(``controllers/ApiController.java:26-69``) over the rebuilt engine.

Endpoints (JSON envelopes identical to the corresponding CLI commands —
``cli.py`` routes both through the same helpers, so they cannot drift):

=========================  ==================================================
``GET /api/search``         ``?query=Q&offset=0&limit=10[&site=S]`` —
                            SearchResponse (``dto/search/SearchResponse.java:
                            8-13``: result, error, count, data)
``GET /api/statistics``     global + per-shard + per-site stats
                            (``services/StatisticsServiceImpl.java:30-62``)
``GET /api/startIndexing``  launch a build over the configured input in a
                            background thread; 400 if already running
                            (``IndexingServiceImpl.java:74-96``)
``GET /api/stopIndexing``   cooperative stop flag — in-flight shards finish,
                            the build exits resumable; 400 if not running
                            (``IndexingServiceImpl.java:99-107``)
``POST /api/indexPage``     doc-grain insert-or-replace: JSON body of one row
                            or a list of rows (``conv_id, turn_idx, role,
                            text``) → one delta generation
                            (``IndexingServiceImpl.java:215-240``)
``DELETE /api/deleteAll``   drop the index (``ApiController.java:46-49``)
=========================  ==================================================

stdlib ``http.server`` only: the sandbox ships Ray without ``aiohttp``, so
the dashboard/job-submission HTTP stack cannot start (BASELINE.md) — this
module is the standalone serving surface instead. The server owns NO Ray
session; the ``serve`` CLI command (or the embedding application) does.
Serving state follows the engine rules: single-process ``QueryEngine`` by
default, ``ShardedQueryService`` (per-shard actors, driver-side exact merge)
with ``actors > 1``.
"""

from __future__ import annotations

import base64
import hashlib
import hmac
import json
import os
import shutil
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse

ERROR_ALREADY_INDEXING = "indexing already running"  # "Индексация уже запущена"
ERROR_NOT_INDEXING = "indexing is not running"  # "Индексация не запущена"
ERROR_NO_INPUT = "no input corpus configured for this server"
ERROR_NO_INDEX = "index not built"
ERROR_UNAUTHORIZED = "authentication required"
ERROR_FORBIDDEN = "admin role required"

# The reference's seeded default admin (config/DataInitializer.java:32-42:
# admin/changeme, ROLE_ADMIN, created when no users exist).
DEFAULT_ADMIN = ("admin", "changeme", "ROLE_ADMIN")


class _AuthTable:
    """Basic-auth user table (config/SecurityConfig.java:21-32 semantics:
    the four mutating endpoints need ROLE_ADMIN; search/statistics stay
    open — the graft keeps them unauthenticated so driver/CLI envelopes
    never change). Passwords are held as sha256 digests and compared
    constant-time — the stdlib stand-in for the reference's
    BCryptPasswordEncoder (SecurityConfig.java:49-52)."""

    def __init__(self, users) -> None:
        self._users = {
            u: (hashlib.sha256(p.encode("utf-8")).digest(), role)
            for u, p, role in users
        }

    def role_of(self, auth_header: str | None) -> str | None:
        """Role for an ``Authorization: Basic ...`` header, or None when
        absent/invalid."""
        # RFC 7235: the auth scheme token is case-insensitive
        if not auth_header or not auth_header[:6].lower() == "basic ":
            return None
        try:
            raw = base64.b64decode(auth_header[6:], validate=True).decode("utf-8")
            user, _, password = raw.partition(":")
        except (ValueError, UnicodeDecodeError):
            return None
        rec = self._users.get(user)
        if rec is None:
            return None
        digest, role = rec
        got = hashlib.sha256(password.encode("utf-8")).digest()
        return role if hmac.compare_digest(digest, got) else None


def index_statistics(index_dir: str) -> dict:
    """Statistics envelope (shared by ``cli.cmd_stats`` and the HTTP
    endpoint): manifest totals with the doc-level upsert overlay folded in,
    exactly like ``IndexReader`` does for serving."""
    from searchengine_ray.delta import load_state

    with open(os.path.join(index_dir, "manifest.json")) as f:
        m = json.load(f)
    st = load_state(index_dir)
    n_docs, total_len = m["n_docs"], m["total_len"]
    sites = {k: dict(v) for k, v in (m.get("sites") or {}).items()}
    if st:
        n_docs += int(st["n_docs_delta"])
        total_len += int(st["total_len_delta"])
        for site, (dn, dlen) in st.get("sites_delta", {}).items():
            e = sites.setdefault(site, {"n_docs": 0, "total_len": 0, "avgdl": 0.0})
            e["n_docs"] = int(e.get("n_docs", 0)) + int(dn)
            e["total_len"] = int(e.get("total_len", 0)) + int(dlen)
            e["avgdl"] = (e["total_len"] / e["n_docs"]) if e["n_docs"] else 0.0
        sites = {k: v for k, v in sites.items() if v["n_docs"] > 0}
    avgdl = (total_len / n_docs) if n_docs else 0.0
    return {
        "result": True,
        "statistics": {
            "total": {
                "docs": n_docs,
                "lemmas": m["n_lemmas"],
                "avgdl": round(avgdl, 4),
                "shards": len(m["shards"]),
                "pending_upserts": len(st["generations"]) if st else 0,
                "indexing": False,
            },
            "detailed": [
                {
                    "shard": s["shard"],
                    "status": s["status"],
                    "rows": s["n_input_rows"],
                    "wall_sec": s["wall_sec"],
                }
                for s in m["shards"]
            ],
            "sites": {
                name: {"docs": s["n_docs"], "avgdl": round(s["avgdl"], 4)}
                for name, s in sites.items()
            },
        },
    }


class EngineService:
    """Engine lifecycle + endpoint semantics behind the HTTP handler.

    The query engine opens lazily and reopens after any mutation (build,
    upsert, deleteAll) so served results always reflect the current index
    state. The lock guards only the engine REFERENCE (acquire/release is
    O(1)); searches run OUTSIDE it, concurrently, against the generation
    they acquired — a mutation swaps the reference immediately and the
    retired engine shuts down when its last in-flight search drains."""

    def __init__(
        self,
        index_dir: str,
        input_dir: str | None = None,
        actors: int = 1,
        config=None,
    ):
        self.index_dir = index_dir
        self.input_dir = input_dir
        self.actors = int(actors)
        self.config = config
        self._engine = None
        self._lock = threading.RLock()  # engine reference (O(1) holds only)
        self._mut_lock = threading.RLock()  # serializes index mutations
        # id(engine) → in-flight search count; retired engines awaiting
        # drain are tracked so the LAST search out shuts them down
        self._inflight: dict[int, int] = {}
        self._retired: dict[int, object] = {}
        self._build_thread: threading.Thread | None = None
        self._build_error: str | None = None

    # -- serving -----------------------------------------------------------

    def _open_engine(self):
        if self.actors > 1:
            from searchengine_ray.query import ShardedQueryService

            return ShardedQueryService(self.index_dir, num_actors=self.actors)
        from searchengine_ray.query import QueryEngine

        return QueryEngine(self.index_dir)

    def _acquire_engine(self):
        with self._lock:
            if self._engine is None:
                if not os.path.exists(os.path.join(self.index_dir, "manifest.json")):
                    return None
                self._engine = self._open_engine()
            eng = self._engine
            self._inflight[id(eng)] = self._inflight.get(id(eng), 0) + 1
            return eng

    def _release_engine(self, eng) -> None:
        to_shutdown = None
        with self._lock:
            k = id(eng)
            n = self._inflight.get(k, 1) - 1
            if n > 0:
                self._inflight[k] = n
            else:
                self._inflight.pop(k, None)
                to_shutdown = self._retired.pop(k, None)
        if to_shutdown is not None and hasattr(to_shutdown, "shutdown"):
            to_shutdown.shutdown()

    def _invalidate(self) -> None:
        to_shutdown = None
        with self._lock:
            eng = self._engine
            self._engine = None
            if eng is not None:
                if self._inflight.get(id(eng), 0) > 0:
                    self._retired[id(eng)] = eng  # last search out shuts it down
                else:
                    to_shutdown = eng
        if to_shutdown is not None and hasattr(to_shutdown, "shutdown"):
            to_shutdown.shutdown()

    def search(self, query: str, offset: int, limit: int, site: str | None) -> dict:
        from searchengine_ray.results import error_response

        eng = self._acquire_engine()
        if eng is None:
            return error_response(ERROR_NO_INDEX)
        try:
            return eng.search(query, offset, limit, site=site)
        finally:
            self._release_engine(eng)

    def statistics(self) -> dict:
        if not os.path.exists(os.path.join(self.index_dir, "manifest.json")):
            return {"result": False, "error": ERROR_NO_INDEX}
        try:
            out = index_statistics(self.index_dir)
        except (FileNotFoundError, NotADirectoryError):
            # existence check → read is not atomic: a concurrent
            # /api/deleteAll can remove the index between them (the same
            # TOCTOU the search path guards); answer NO_INDEX, not a
            # dropped connection
            return {"result": False, "error": ERROR_NO_INDEX}
        out["statistics"]["total"]["indexing"] = self.indexing
        if self._build_error:
            out["statistics"]["total"]["last_error"] = self._build_error
        return out

    # -- indexing lifecycle --------------------------------------------------

    @property
    def indexing(self) -> bool:
        t = self._build_thread
        return t is not None and t.is_alive()

    def _build_config(self):
        """Rebuild config: injected > round-tripped from the served index's
        manifest (layout-affecting fields MUST survive, or /api/startIndexing
        silently rebuilds with the wrong layout — site sentinels dropped,
        html_content extraction skipped) > defaults for a first build."""
        if self.config is not None:
            return self.config
        mpath = os.path.join(self.index_dir, "manifest.json")
        if os.path.exists(mpath):
            from searchengine_ray.build import config_from_manifest

            with open(mpath) as f:
                return config_from_manifest(json.load(f))
        from searchengine_ray.config import DEFAULT_CONFIG

        return DEFAULT_CONFIG

    def start_indexing(self) -> tuple[int, dict]:
        # check-then-spawn under the MUTATION lock: concurrent
        # /api/startIndexing calls must not both pass the liveness check
        # and race two builds over the same index_dir, and a build must
        # not launch between another mutation's indexing-check and its
        # write (indexPage/deleteAll hold the same lock)
        with self._mut_lock:
            if self.indexing:
                return 400, {"result": False, "error": ERROR_ALREADY_INDEXING}
            if not self.input_dir:
                return 400, {"result": False, "error": ERROR_NO_INPUT}
            from searchengine_ray.build import build_index

            # build_index consumes any stale STOP flag at entry itself
            cfg = self._build_config()

            def run() -> None:
                self._build_error = None
                try:
                    build_index(self.input_dir, self.index_dir, cfg)
                except Exception as e:  # surfaced via /api/statistics
                    self._build_error = f"{type(e).__name__}: {e}"
                finally:
                    self._invalidate()

            self._build_thread = threading.Thread(target=run, daemon=True)
            self._build_thread.start()
        return 200, {"result": True, "error": ""}

    def stop_indexing(self) -> tuple[int, dict]:
        if not self.indexing:
            return 400, {"result": False, "error": ERROR_NOT_INDEXING}
        from searchengine_ray.build import request_stop

        request_stop(self.index_dir)
        return 200, {"result": True, "error": ""}

    def index_page(self, rows: list[dict]) -> tuple[int, dict]:
        from searchengine_ray.delta import upsert_docs

        # mutations serialize on their OWN lock (two concurrent indexPage
        # calls would both read the same generation count and write the
        # same gen directory — upsert_docs is single-writer by design), so
        # a large upsert never parks searches: they only touch self._lock
        # for the O(1) engine acquire and keep serving the pre-upsert
        # generation until _invalidate swaps it.
        with self._mut_lock:
            # a running build owns index_dir without any lock (it is a
            # minutes-long background thread); a delta generation written
            # now would be stamped with the OLD build_id and destroyed by
            # the build's post-finalize clear_delta AFTER we acknowledged
            # it with a 200 — reject instead, like the reference does
            # while indexing
            if self.indexing:
                return 400, {"result": False, "error": ERROR_ALREADY_INDEXING}
            if not os.path.exists(os.path.join(self.index_dir, "manifest.json")):
                return 400, {"result": False, "error": ERROR_NO_INDEX}
            try:
                out = upsert_docs(self.index_dir, rows)
            except (KeyError, ValueError) as e:
                return 400, {"result": False, "error": str(e)}
            self._invalidate()
        return 200, {"result": True, **out}

    def delete_all(self) -> tuple[int, dict]:
        # rmtree BEFORE dropping the cached engine, under BOTH locks: the
        # mutation lock excludes a concurrent upsert, and holding the
        # engine lock means a racing search either acquired the old engine
        # earlier (it may still hit vanished postings files mid-read — the
        # handler maps that to an error envelope) or blocks on acquire and
        # then sees no manifest — it can never cache a fresh engine over
        # files that are about to vanish and serve the deleted index
        # forever. A running build would re-create the dir after rmtree —
        # reject, mirroring the reference's lifecycle.
        with self._mut_lock:
            if self.indexing:
                return 400, {"result": False, "error": ERROR_ALREADY_INDEXING}
            with self._lock:
                shutil.rmtree(self.index_dir, ignore_errors=True)
                self._invalidate()
        return 200, {"result": True}

    def close(self) -> None:
        self._invalidate()


class _Handler(BaseHTTPRequestHandler):
    service: EngineService  # set on the subclass by make_server
    auth: _AuthTable | None = None  # None = auth disabled

    # -- plumbing ------------------------------------------------------------

    def log_message(self, fmt, *args):  # quiet by default
        pass

    def _send(self, code: int, payload: dict, ensure_ascii: bool = True,
              challenge: bool = False) -> None:
        body = json.dumps(payload, ensure_ascii=ensure_ascii).encode("utf-8")
        self.send_response(code)
        self.send_header("Content-Type", "application/json; charset=utf-8")
        self.send_header("Content-Length", str(len(body)))
        if challenge:
            self.send_header("WWW-Authenticate", 'Basic realm="searchengine"')
        self.end_headers()
        self.wfile.write(body)

    def _not_found(self) -> None:
        self._send(404, {"result": False, "error": "unknown endpoint"})

    def _admin_ok(self) -> bool:
        """Gate for the mutating endpoints (SecurityConfig.java:23-29:
        startIndexing / stopIndexing / indexPage / deleteAll need
        ROLE_ADMIN). Sends the 401/403 envelope itself on failure."""
        if self.auth is None:
            return True
        role = self.auth.role_of(self.headers.get("Authorization"))
        if role is None:
            self._send(401, {"result": False, "error": ERROR_UNAUTHORIZED},
                       challenge=True)
            return False
        if role != "ROLE_ADMIN":
            self._send(403, {"result": False, "error": ERROR_FORBIDDEN})
            return False
        return True

    # -- routing -------------------------------------------------------------

    def do_GET(self) -> None:  # noqa: N802 (stdlib naming)
        url = urlparse(self.path)
        if url.path == "/api/search":
            q = parse_qs(url.query)
            query = q.get("query", [""])[0]
            try:
                offset = int(q.get("offset", ["0"])[0])
                limit = int(q.get("limit", ["10"])[0])
            except ValueError:
                self._send(400, {"result": False, "error": "offset/limit must be integers"})
                return
            site = q.get("site", [None])[0]
            try:
                out = self.service.search(query, offset, limit, site)
            except Exception as e:  # noqa: BLE001 — e.g. a search in flight
                # across a deleteAll hits vanished postings files; return a
                # clean envelope instead of dropping the connection
                self._send(500, {"result": False, "error": f"{type(e).__name__}: {e}"})
                return
            # ensure_ascii=False matches the CLI search output byte-for-byte
            self._send(200, out, ensure_ascii=False)
        elif url.path == "/api/statistics":
            try:
                out = self.service.statistics()
            except Exception as e:  # noqa: BLE001 — same clean-envelope
                # contract as /api/search: never drop the connection
                self._send(500, {"result": False, "error": f"{type(e).__name__}: {e}"})
                return
            self._send(200 if out.get("result") else 400, out)
        elif url.path == "/api/startIndexing":
            if not self._admin_ok():
                return
            code, out = self.service.start_indexing()
            self._send(code, out)
        elif url.path == "/api/stopIndexing":
            if not self._admin_ok():
                return
            code, out = self.service.stop_indexing()
            self._send(code, out)
        else:
            self._not_found()

    def do_POST(self) -> None:  # noqa: N802
        url = urlparse(self.path)
        if url.path != "/api/indexPage":
            self._not_found()
            return
        if not self._admin_ok():
            return
        try:
            n = int(self.headers.get("Content-Length", "0"))
            obj = json.loads(self.rfile.read(n).decode("utf-8") or "null")
        except (ValueError, UnicodeDecodeError):
            self._send(400, {"result": False, "error": "body must be JSON"})
            return
        if isinstance(obj, dict):
            obj = [obj]
        if not isinstance(obj, list) or not obj:
            self._send(400, {"result": False, "error": "body must be a row or list of rows"})
            return
        code, out = self.service.index_page(obj)
        self._send(code, out)

    def do_DELETE(self) -> None:  # noqa: N802
        url = urlparse(self.path)
        if url.path != "/api/deleteAll":
            self._not_found()
            return
        if not self._admin_ok():
            return
        code, out = self.service.delete_all()
        self._send(code, out)


def make_server(
    index_dir: str,
    host: str = "127.0.0.1",
    port: int = 8080,
    input_dir: str | None = None,
    actors: int = 1,
    config=None,
    auth: bool | None = None,
) -> ThreadingHTTPServer:
    """Build (but don't start) the HTTP server; ``port=0`` picks a free
    port (read it back from ``server.server_address``). The caller owns the
    Ray session when ``actors > 1`` or indexing is used.

    ``auth``: None (default) enables basic auth iff ``config.auth_users``
    is non-empty; True forces it on, seeding the reference's default
    admin/changeme when no users are configured
    (config/DataInitializer.java:32-42); False forces it off."""
    service = EngineService(index_dir, input_dir=input_dir, actors=actors, config=config)
    users = tuple(getattr(service.config, "auth_users", ()) or ())
    if auth is None:
        auth = bool(users)
    table = None
    if auth:
        table = _AuthTable(users or (DEFAULT_ADMIN,))
    handler = type("Handler", (_Handler,), {"service": service, "auth": table})
    srv = ThreadingHTTPServer((host, port), handler)
    srv.service = service  # type: ignore[attr-defined]
    return srv


def start_in_thread(srv: ThreadingHTTPServer) -> threading.Thread:
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    return t
