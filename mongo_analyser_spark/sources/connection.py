"""Connection/session management (SURVEY §2.1 S12, reference
core/db.py:20-258): a cached client registry with the reference's
observable semantics —

* same-URI reuse revalidated by ping; a failed ping reconnects;
* database-context switch on a live client without reconnecting;
* last-error capture as (message, code) for the UI/error surface;
* explicit disconnect (and disconnect_all) closing the client.

Construction differs from the reference (a pymongo module singleton):
``client_factory`` is injected — any callable ``(uri, **options) ->
client`` where the client is pymongo-shaped (``client.admin.command
('ping')``, ``client[db_name]``, ``client.get_database()``, ``.close()``).
Tests drive the full truth table with a fake; live use passes
``pymongo.MongoClient``. The registry itself is pure Python on the
driver — connection state never belongs in the data plane."""

from __future__ import annotations

import logging

from mongo_analyser_spark.sources.mongodb import redact_uri_password

logger = logging.getLogger(__name__)


def _default_client_factory(uri: str, **options):
    try:
        from pymongo import MongoClient  # not bundled in this environment
    except ImportError as e:
        raise RuntimeError(
            "pymongo is not installed — pass client_factory=MongoClient-like "
            "callable to ConnectionRegistry for live use"
        ) from e
    version = options.pop("server_api_version", None)
    if version is not None:
        from pymongo.server_api import ServerApi

        options["server_api"] = ServerApi(version)
    return MongoClient(uri, **options)


class ConnectionRegistry:
    """One active (client, db) pair, reference-cached by URI."""

    def __init__(self, client_factory=None):
        self._factory = client_factory or _default_client_factory
        self._client = None
        self._db = None
        self._uri: str | None = None
        self._resolved_db_name: str | None = None
        self._last_error: tuple[str, int | None] | None = None

    # -- reference accessors (db.py:189-229) ------------------------------

    def last_connection_error(self) -> tuple[str, int | None] | None:
        return self._last_error

    def current_uri(self) -> str | None:
        return self._uri

    def current_db_name(self) -> str | None:
        return self._resolved_db_name

    def get_db(self):
        if self._db is None:
            raise RuntimeError("no active MongoDB connection (db.py:193-207)")
        return self._db

    # -- lifecycle ---------------------------------------------------------

    def _ping(self) -> None:
        self._client.admin.command("ping")

    def _record_error(self, e: Exception) -> None:
        self._last_error = (str(e), getattr(e, "code", None))

    def connection_active(
        self,
        uri: str,
        db_name: str | None = None,
        server_timeout_ms: int = 5000,
        force_reconnect: bool = False,
        **options,
    ) -> bool:
        """True when a pinged connection to (uri, db) is active —
        db.py:20-187's decision tree: reuse on same URI + OK ping;
        switch db context in place; otherwise (re)connect fresh.
        Never raises: failures return False with the error captured."""
        self._last_error = None
        redacted = redact_uri_password(uri)

        if not force_reconnect and self._client is not None and self._uri == uri:
            target = db_name or self._resolved_db_name
            if self._db is not None and self._db.name == target:
                try:
                    self._ping()
                    return True
                except Exception as e:
                    logger.warning("cached connection ping failed: %s — reconnecting", e)
                    self._record_error(e)
                    # close before dropping the reference (db.py closes the
                    # dead client on reconnect) — nulling first would leak
                    # the client's sockets/monitor threads every retry
                    self.disconnect()
            elif db_name:
                try:
                    self._db = self._client[db_name]
                    self._ping()
                    self._resolved_db_name = self._db.name
                    logger.info("switched db context to %r", db_name)
                    return True
                except Exception as e:
                    logger.error("db-context switch to %r failed: %s", db_name, e)
                    self._record_error(e)
                    self.disconnect()

        self.disconnect()
        try:
            logger.info("connecting to %s (db=%s)", redacted, db_name)
            if uri.startswith("mongodb+srv://"):
                # db.py:85-87: SRV URIs get the stable server API pinned;
                # passed as a plain marker the factory translates (the
                # default pymongo factory builds ServerApi("1") from it)
                options.setdefault("server_api_version", "1")
            client = self._factory(
                uri, serverSelectionTimeoutMS=server_timeout_ms, **options
            )
            db = client[db_name] if db_name else client.get_database()
            client.admin.command("ping")
        except Exception as e:
            logger.error("connection to %s failed: %s", redacted, e)
            self._record_error(e)
            return False
        self._client, self._db = client, db
        self._uri = uri
        self._resolved_db_name = db.name
        return True

    def disconnect(self) -> None:
        """db.py:231-247: close and clear; idempotent."""
        if self._client is not None:
            try:
                self._client.close()
            except Exception as e:
                logger.warning("error closing client: %s", e)
        self._client = None
        self._db = None
        self._uri = None
        self._resolved_db_name = None
