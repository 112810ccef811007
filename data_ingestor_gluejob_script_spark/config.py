"""C5: pluggable config + credential fetch.

The reference pulls two JSON documents from SSM / SecretsManager —
job parameters (hosts, ports, database names, bucket/lake locations;
gluejob.py:68-76) and credentials (users, passwords; gluejob.py:58-66)
— selected by the ``Environment`` job parameter (gluejob.py:603,
iac.yaml:80). This module is that seam as a small protocol with two
local implementations (environment variables, JSON files), so
``JdbcConfig`` and the lake/watermark paths are assembled from a
provider instead of hand-built by every caller.

Deliberate fix, not a port: the reference's fetchers swallow every
exception and *return the exception object* (gluejob.py:56,66,76),
which downstream code then subscripts — a latent TypeError that
masks the real failure. Here every lookup failure raises
``ConfigError`` naming the missing piece.
"""

from __future__ import annotations

import json
import os
from typing import Protocol

from .sources.jdbc import JdbcConfig


class ConfigError(RuntimeError):
    """A parameter/credential document or key is missing or invalid."""


class ConfigProvider(Protocol):
    """Two-document contract mirroring the reference's SSM layout:
    ``parameters()`` (non-secret facts) and ``credentials()``
    (secrets). Implementations raise ConfigError, never return it."""

    def parameters(self) -> dict: ...

    def credentials(self) -> dict: ...


def _parse(doc: str, what: str) -> dict:
    try:
        out = json.loads(doc)
    except json.JSONDecodeError as e:
        raise ConfigError(f"{what} is not valid JSON: {e}") from None
    if not isinstance(out, dict):
        raise ConfigError(f"{what} must be a JSON object")
    return out


class EnvConfigProvider:
    """Documents in environment variables
    ``INGESTOR_{ENV}_PARAMETERS`` / ``INGESTOR_{ENV}_CREDENTIALS``
    (JSON strings) — the deployment injects per-stage values the same
    way the reference selects an SSM namespace per Environment."""

    def __init__(self, environment: str):
        self.environment = environment
        self._prefix = f"INGESTOR_{environment.upper()}"

    def _fetch(self, suffix: str) -> dict:
        name = f"{self._prefix}_{suffix}"
        doc = os.environ.get(name)
        if doc is None:
            raise ConfigError(f"environment variable {name} is not set")
        return _parse(doc, name)

    def parameters(self) -> dict:
        return self._fetch("PARAMETERS")

    def credentials(self) -> dict:
        return self._fetch("CREDENTIALS")


class JsonFileConfigProvider:
    """Documents at ``{root}/{environment}/parameters.json`` and
    ``{root}/{environment}/credentials.json``."""

    def __init__(self, root: str, environment: str):
        self.root = root
        self.environment = environment

    def _fetch(self, filename: str) -> dict:
        path = os.path.join(self.root, self.environment, filename)
        try:
            with open(path) as f:
                doc = f.read()
        except OSError as e:
            raise ConfigError(f"cannot read config file {path}: {e}") from None
        return _parse(doc, path)

    def parameters(self) -> dict:
        return self._fetch("parameters.json")

    def credentials(self) -> dict:
        return self._fetch("credentials.json")


def _require(doc: dict, key: str, what: str) -> str:
    if key not in doc:
        raise ConfigError(f"{what} is missing required key {key!r}")
    return str(doc[key])


_URL_SHAPES = {
    "psql": "jdbc:postgresql://{host}:{port}/{database}",
    "sqlserver": "jdbc:sqlserver://{host}:{port};databaseName={database}",
}


def jdbc_config(
    provider: ConfigProvider, source: str, kind: str = "psql"
) -> JdbcConfig:
    """Assemble a ``JdbcConfig`` for one source database from the
    provider's documents, using the reference's key naming —
    ``{source}_host/port/database`` in parameters (gluejob.py:246-251)
    and ``{source}_user/password`` in credentials (gluejob.py:247-249).
    """
    if kind not in _URL_SHAPES:
        raise ConfigError(f"unknown jdbc kind {kind!r}")
    params = provider.parameters()
    creds = provider.credentials()
    url = _URL_SHAPES[kind].format(
        host=_require(params, f"{source}_host", "parameters"),
        port=_require(params, f"{source}_port", "parameters"),
        database=_require(params, f"{source}_database", "parameters"),
    )
    return JdbcConfig(
        url=url,
        user=_require(creds, f"{source}_user", "credentials"),
        password=_require(creds, f"{source}_password", "credentials"),
        kind=kind,
    )
