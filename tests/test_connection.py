"""ConnectionRegistry truth table (reference core/db.py:20-258 semantics
via an injected fake pymongo-shaped client). No Spark, no network."""

from __future__ import annotations

import pytest

from mongo_analyser_spark.sources.connection import ConnectionRegistry


class FakeDB:
    def __init__(self, name):
        self.name = name


class FakeAdmin:
    def __init__(self, client):
        self.client = client

    def command(self, cmd):
        assert cmd == "ping"
        self.client.pings += 1
        if self.client.fail_ping:
            err = ConnectionError("ping failed")
            err.code = 11
            raise err
        return {"ok": 1}


class FakeClient:
    def __init__(self, uri, default_db="from_uri", **options):
        self.uri = uri
        self.options = options
        self.default_db = default_db
        self.pings = 0
        self.fail_ping = False
        self.closed = False
        self.admin = FakeAdmin(self)

    def __getitem__(self, name):
        return FakeDB(name)

    def get_database(self):
        return FakeDB(self.default_db)

    def close(self):
        self.closed = True


class Factory:
    def __init__(self, fail_connect=False):
        self.created = []
        self.fail_connect = fail_connect

    def __call__(self, uri, **options):
        if self.fail_connect:
            err = ConnectionError("refused")
            err.code = 6
            raise err
        c = FakeClient(uri, **options)
        self.created.append(c)
        return c


def test_connect_resolves_db_and_records_state():
    f = Factory()
    reg = ConnectionRegistry(client_factory=f)
    assert reg.connection_active("mongodb://h:27017/", "mydb") is True
    assert reg.current_uri() == "mongodb://h:27017/"
    assert reg.current_db_name() == "mydb"
    assert reg.get_db().name == "mydb"
    assert f.created[0].options["serverSelectionTimeoutMS"] == 5000
    assert reg.last_connection_error() is None


def test_connect_without_db_name_uses_uri_default():
    reg = ConnectionRegistry(client_factory=Factory())
    assert reg.connection_active("mongodb://h:27017/") is True
    assert reg.current_db_name() == "from_uri"


def test_same_uri_reuses_client_with_ping():
    f = Factory()
    reg = ConnectionRegistry(client_factory=f)
    reg.connection_active("mongodb://h:27017/", "mydb")
    assert reg.connection_active("mongodb://h:27017/", "mydb") is True
    assert len(f.created) == 1  # no new client
    assert f.created[0].pings >= 2  # revalidated


def test_db_context_switch_on_live_client():
    f = Factory()
    reg = ConnectionRegistry(client_factory=f)
    reg.connection_active("mongodb://h:27017/", "db1")
    assert reg.connection_active("mongodb://h:27017/", "db2") is True
    assert len(f.created) == 1  # same client, new db handle
    assert reg.current_db_name() == "db2"


def test_failed_ping_reconnects():
    f = Factory()
    reg = ConnectionRegistry(client_factory=f)
    reg.connection_active("mongodb://h:27017/", "mydb")
    f.created[0].fail_ping = True
    assert reg.connection_active("mongodb://h:27017/", "mydb") is True
    assert len(f.created) == 2  # fresh client after dead ping
    assert reg.current_db_name() == "mydb"
    # the dead client must be close()d on reconnect, not just dropped —
    # leaked clients keep sockets/monitor threads alive (round-2 advice)
    assert f.created[0].closed is True


def test_force_reconnect_builds_new_client():
    f = Factory()
    reg = ConnectionRegistry(client_factory=f)
    reg.connection_active("mongodb://h:27017/", "mydb")
    assert reg.connection_active("mongodb://h:27017/", "mydb", force_reconnect=True)
    assert len(f.created) == 2
    assert f.created[0].closed is True


def test_connect_failure_returns_false_and_captures_error():
    reg = ConnectionRegistry(client_factory=Factory(fail_connect=True))
    assert reg.connection_active("mongodb://h:27017/", "mydb") is False
    msg, code = reg.last_connection_error()
    assert "refused" in msg and code == 6
    with pytest.raises(RuntimeError):
        reg.get_db()


def test_disconnect_clears_state_idempotently():
    f = Factory()
    reg = ConnectionRegistry(client_factory=f)
    reg.connection_active("mongodb://h:27017/", "mydb")
    reg.disconnect()
    assert f.created[0].closed is True
    assert reg.current_uri() is None and reg.current_db_name() is None
    reg.disconnect()  # no raise


def test_default_factory_gives_actionable_error_without_pymongo():
    reg = ConnectionRegistry()
    ok = reg.connection_active("mongodb://h:27017/", "mydb")
    assert ok is False
    msg, _ = reg.last_connection_error()
    assert "pymongo" in msg


def test_srv_uri_pins_server_api_marker():
    f = Factory()
    reg = ConnectionRegistry(client_factory=f)
    assert reg.connection_active("mongodb+srv://cluster.example/", "mydb") is True
    assert f.created[0].options["server_api_version"] == "1"
    # non-SRV URIs don't get it
    reg2 = ConnectionRegistry(client_factory=f)
    reg2.connection_active("mongodb://h:27017/", "mydb")
    assert "server_api_version" not in f.created[1].options
