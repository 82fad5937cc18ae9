"""HTTP serving surface tests (reference ``controllers/ApiController.java:26-69``).

The round-3 verdict's last §2.10 gap: the reference's user-facing contract is
HTTP, the rebuild's was CLI-only. These tests pin (a) the endpoint envelopes
byte-identical to the CLI commands, (b) the indexing lifecycle
(start/stop/indexPage/deleteAll) semantics, and (c) error status codes
mirroring the reference's BadRequest paths."""

import json
import shutil
import urllib.request
from urllib.error import HTTPError

import pytest

from searchengine_ray.corpus import write_transcripts
from searchengine_ray.server import make_server, start_in_thread


def _get(port: int, path: str):
    try:
        with urllib.request.urlopen(f"http://127.0.0.1:{port}{path}") as r:
            return r.status, r.read().decode("utf-8")
    except HTTPError as e:
        return e.code, e.read().decode("utf-8")


def _post(port: int, path: str, obj):
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}{path}",
        data=json.dumps(obj).encode("utf-8"),
        headers={"Content-Type": "application/json"},
        method="POST",
    )
    try:
        with urllib.request.urlopen(req) as r:
            return r.status, r.read().decode("utf-8")
    except HTTPError as e:
        return e.code, e.read().decode("utf-8")


def _delete(port: int, path: str):
    req = urllib.request.Request(f"http://127.0.0.1:{port}{path}", method="DELETE")
    try:
        with urllib.request.urlopen(req) as r:
            return r.status, r.read().decode("utf-8")
    except HTTPError as e:
        return e.code, e.read().decode("utf-8")


@pytest.fixture(scope="module")
def http_index(ray_session, tmp_path_factory):
    from searchengine_ray.build import build_index
    from searchengine_ray.config import EngineConfig

    root = tmp_path_factory.mktemp("http")
    write_transcripts(str(root / "corpus"), n_convs=30)
    build_index(
        str(root / "corpus"),
        str(root / "index"),
        EngineConfig(num_shards=2, lemmatizer_concurrency=(1, 2)),
    )
    return root


@pytest.fixture(scope="module")
def server(http_index):
    srv = make_server(str(http_index / "index"), port=0, input_dir=str(http_index / "corpus"))
    start_in_thread(srv)
    yield srv
    srv.service.close()
    srv.shutdown()
    srv.server_close()


def _port(srv) -> int:
    return srv.server_address[1]


class TestEnvelopes:
    def test_search_matches_cli_bytes(self, server, http_index):
        """GET /api/search body == the CLI search line, byte for byte."""
        from searchengine_ray.query import QueryEngine

        code, body = _get(_port(server), "/api/search?query=%D1%81%D1%83%D0%B4&offset=0&limit=10")
        assert code == 200
        engine = QueryEngine(str(http_index / "index"))
        expected = json.dumps(engine.search("суд", 0, 10), ensure_ascii=False)
        assert body == expected
        assert json.loads(body)["result"] is True

    def test_search_error_envelope(self, server):
        code, body = _get(_port(server), "/api/search?query=&offset=0&limit=10")
        assert code == 200  # envelope error, reference returns the DTO
        out = json.loads(body)
        assert out["result"] is False and out["count"] == 0 and out["data"] == []

    def test_search_site_param(self, server):
        code, body = _get(
            _port(server), "/api/search?query=%D1%81%D1%83%D0%B4&site=nosuchsite"
        )
        assert code == 200
        assert json.loads(body)["result"] is False  # unknown site → error envelope

    def test_statistics_matches_cli_bytes(self, server, http_index, capsys):
        from searchengine_ray.cli import main

        code, body = _get(_port(server), "/api/statistics")
        assert code == 200
        rc = main(["stats", "--index", str(http_index / "index")])
        assert rc == 0
        cli_line = capsys.readouterr().out.strip().splitlines()[-1]
        # the server adds live `indexing` state on top of the shared builder;
        # with no build running the bodies are identical
        assert body == cli_line
        assert json.loads(body)["statistics"]["total"]["shards"] == 2

    def test_unknown_endpoint_404(self, server):
        code, body = _get(_port(server), "/api/nope")
        assert code == 404 and json.loads(body)["result"] is False


class TestIndexingLifecycle:
    def test_stop_without_build_is_400(self, server):
        code, out = _get(_port(server), "/api/stopIndexing")
        assert code == 400 and json.loads(out)["result"] is False

    def test_index_page_upsert_then_search(self, ray_session, http_index, tmp_path):
        # private server over a COPY: mutations must not leak into the shared fixture
        idx = tmp_path / "index"
        shutil.copytree(http_index / "index", idx)
        srv = make_server(str(idx), port=0)
        start_in_thread(srv)
        try:
            row = {
                "conv_id": "conv-http",
                "turn_idx": 0,
                "role": "user",
                "text": "уникальнейшее словосочетание",
            }
            code, out = _post(_port(srv), "/api/indexPage", row)
            assert code == 200
            assert json.loads(out)["result"] is True
            assert json.loads(out)["added"] == 1
            code, body = _get(
                _port(srv),
                "/api/search?query=%D1%83%D0%BD%D0%B8%D0%BA%D0%B0%D0%BB%D1%8C%D0%BD%D0%B5%D0%B9%D1%88%D0%B5%D0%B5",
            )
            hit = json.loads(body)
            assert hit["result"] is True and hit["count"] == 1
            assert hit["data"][0]["conv_id"] == "conv-http"
        finally:
            srv.service.close()
            srv.shutdown()
            srv.server_close()

    def test_index_page_bad_body_400(self, server):
        code, out = _post(_port(server), "/api/indexPage", [])
        assert code == 400 and json.loads(out)["result"] is False

    def test_start_stop_and_delete_all_roundtrip(self, ray_session, http_index, tmp_path):
        # fresh index dir: startIndexing builds it, deleteAll drops it
        idx = tmp_path / "index2"
        srv = make_server(str(idx), port=0, input_dir=str(http_index / "corpus"))
        start_in_thread(srv)
        try:
            code, body = _get(_port(srv), "/api/search?query=test")
            assert json.loads(body)["result"] is False  # not built yet
            code, out = _get(_port(srv), "/api/startIndexing")
            assert code == 200 and json.loads(out)["result"] is True
            # second start while running → 400 (reference "already running"),
            # OR the tiny build already finished — accept either, then wait
            code2, out2 = _get(_port(srv), "/api/startIndexing")
            assert code2 in (200, 400)
            t = srv.service._build_thread
            t.join(timeout=300)
            assert not t.is_alive()
            assert srv.service._build_error is None, srv.service._build_error
            code, body = _get(_port(srv), "/api/statistics")
            stats = json.loads(body)
            assert stats["result"] is True
            assert stats["statistics"]["total"]["docs"] > 0
            code, body = _get(_port(srv), "/api/search?query=%D1%81%D1%83%D0%B4")
            assert json.loads(body)["result"] is True
            code, out = _delete(_port(srv), "/api/deleteAll")
            assert code == 200 and json.loads(out)["result"] is True
            assert not idx.exists()
            code, body = _get(_port(srv), "/api/search?query=%D1%81%D1%83%D0%B4")
            assert json.loads(body)["result"] is False  # index gone
        finally:
            srv.service.close()
            srv.shutdown()
            srv.server_close()


class TestStatisticsRace:
    def test_statistics_vanished_index_mid_call(self, server, monkeypatch):
        """TOCTOU (code-review r4 follow-up): the manifest-exists check and
        the index_statistics read are not atomic — a concurrent
        /api/deleteAll between them must yield the clean NO_INDEX envelope,
        not a dropped connection (the same contract as /api/search)."""
        import searchengine_ray.server as srvmod

        def _vanished(index_dir):
            raise FileNotFoundError("manifest.json")

        monkeypatch.setattr(srvmod, "index_statistics", _vanished)
        code, body = _get(_port(server), "/api/statistics")
        assert code == 400
        assert json.loads(body) == {"result": False, "error": srvmod.ERROR_NO_INDEX}

    def test_statistics_unexpected_error_is_clean_500(self, server, monkeypatch):
        """Any other exception maps to a JSON 500 envelope, mirroring the
        search route's hardening."""
        import searchengine_ray.server as srvmod

        def _boom(index_dir):
            raise RuntimeError("corrupt shard")

        monkeypatch.setattr(srvmod, "index_statistics", _boom)
        code, body = _get(_port(server), "/api/statistics")
        assert code == 500
        out = json.loads(body)
        assert out["result"] is False and "RuntimeError" in out["error"]


class TestShardedServing:
    def test_sharded_search_matches_single_process(self, ray_session, server, http_index):
        """actors=2 HTTP serving returns the identical envelope."""
        srv2 = make_server(str(http_index / "index"), port=0, actors=2)
        start_in_thread(srv2)
        try:
            q = "/api/search?query=%D1%81%D1%83%D0%B4%20%D1%80%D0%B5%D1%88%D0%B5%D0%BD%D0%B8%D0%B5&limit=10"
            _, single = _get(_port(server), q)
            _, sharded = _get(_port(srv2), q)
            assert json.loads(sharded) == json.loads(single)
        finally:
            srv2.service.close()
            srv2.shutdown()
            srv2.server_close()


class TestAuth:
    """Basic-auth gate on the mutating endpoints
    (config/SecurityConfig.java:21-32; seeded users
    config/DataInitializer.java:27-68). Search/statistics stay open so the
    driver/CLI envelopes never change."""

    @pytest.fixture(scope="class")
    def auth_server(self, http_index):
        from searchengine_ray.config import EngineConfig

        cfg = EngineConfig(
            num_shards=2,
            lemmatizer_concurrency=(1, 2),
            auth_users=(
                ("admin", "changeme", "ROLE_ADMIN"),
                ("reader", "readonly", "ROLE_USER"),
            ),
        )
        srv = make_server(
            str(http_index / "index"), port=0,
            input_dir=str(http_index / "corpus"), config=cfg,
        )
        start_in_thread(srv)
        yield srv
        srv.service.close()
        srv.shutdown()
        srv.server_close()

    @staticmethod
    def _basic(user, password):
        import base64

        tok = base64.b64encode(f"{user}:{password}".encode()).decode()
        return {"Authorization": f"Basic {tok}"}

    def _get_h(self, port, path, headers=None):
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}{path}", headers=headers or {})
        try:
            with urllib.request.urlopen(req) as r:
                return r.status, r.read().decode("utf-8"), dict(r.headers)
        except HTTPError as e:
            return e.code, e.read().decode("utf-8"), dict(e.headers)

    def test_mutators_401_without_credentials(self, auth_server):
        port = _port(auth_server)
        for method, path in (
            ("GET", "/api/startIndexing"),
            ("GET", "/api/stopIndexing"),
            ("POST", "/api/indexPage"),
            ("DELETE", "/api/deleteAll"),
        ):
            if method == "GET":
                code, body, headers = self._get_h(port, path)
            elif method == "POST":
                code, body = _post(port, path, {"conv_id": "c", "turn_idx": 0,
                                                "role": "user", "text": "x"})
                headers = {}
            else:
                code, body = _delete(port, path)
                headers = {}
            assert code == 401, (path, code, body)
            out = json.loads(body)
            assert out["result"] is False
            assert out["error"] == "authentication required"
            if headers:
                assert headers.get("WWW-Authenticate", "").startswith("Basic")

    def test_wrong_password_401_and_non_admin_403(self, auth_server):
        port = _port(auth_server)
        code, body, _ = self._get_h(port, "/api/stopIndexing",
                                    self._basic("admin", "wrong"))
        assert code == 401
        code, body, _ = self._get_h(port, "/api/stopIndexing",
                                    self._basic("reader", "readonly"))
        assert code == 403
        assert json.loads(body)["error"] == "admin role required"

    def test_admin_envelope_unchanged(self, auth_server, server):
        """With admin credentials the mutator envelope is byte-identical to
        the unauthenticated server's (the auth layer only gates)."""
        port = _port(auth_server)
        code, body, _ = self._get_h(port, "/api/stopIndexing",
                                    self._basic("admin", "changeme"))
        code0, body0 = _get(_port(server), "/api/stopIndexing")
        assert (code, body) == (code0, body0)

    def test_search_and_statistics_stay_open(self, auth_server, server):
        port = _port(auth_server)
        q = "/api/search?query=%D1%81%D1%83%D0%B4&limit=3"
        code, body, _ = self._get_h(port, q)
        assert code == 200
        assert json.loads(body) == json.loads(_get(_port(server), q)[1])
        code, body, _ = self._get_h(port, "/api/statistics")
        assert code == 200 and json.loads(body)["result"] is True

    def test_auth_true_seeds_default_admin(self, http_index):
        """make_server(auth=True) with no configured users seeds the
        reference's admin/changeme (DataInitializer.java:32-42)."""
        srv = make_server(str(http_index / "index"), port=0, auth=True)
        start_in_thread(srv)
        try:
            port = _port(srv)
            code, _, _ = self._get_h(port, "/api/stopIndexing")
            assert code == 401
            code, body, _ = self._get_h(port, "/api/stopIndexing",
                                        self._basic("admin", "changeme"))
            assert code == 400  # authenticated; not indexing → domain 400
            assert json.loads(body)["error"] == "indexing is not running"
        finally:
            srv.service.close()
            srv.shutdown()
            srv.server_close()
