"""C5 config provider seam (gluejob.py:50-76): env/JSON-file
implementations, JdbcConfig assembly, and the strict failure contract
(raise ConfigError — never return the exception like the reference's
swallowed-exception fetchers at gluejob.py:56,66,76)."""

from __future__ import annotations

import json
import os

import pytest

from data_ingestor_gluejob_script_spark.config import (
    ConfigError,
    EnvConfigProvider,
    JsonFileConfigProvider,
    jdbc_config,
)

PARAMS = {
    "corleone_host": "db.internal",
    "corleone_port": "5432",
    "corleone_database": "corleone",
    "checkout_host": "mssql.internal",
    "checkout_port": "1433",
    "checkout_database": "checkout",
    "lake_root": "/lake",
}
CREDS = {
    "corleone_user": "ingestor",
    "corleone_password": "s3cret",
    "checkout_user": "ingestor2",
    "checkout_password": "hunter2",
}


@pytest.fixture()
def file_provider(tmp_path):
    env_dir = tmp_path / "prod"
    env_dir.mkdir()
    (env_dir / "parameters.json").write_text(json.dumps(PARAMS))
    (env_dir / "credentials.json").write_text(json.dumps(CREDS))
    return JsonFileConfigProvider(str(tmp_path), "prod")


def test_json_file_provider_roundtrip(file_provider):
    assert file_provider.parameters() == PARAMS
    assert file_provider.credentials() == CREDS


def test_env_provider_roundtrip(monkeypatch):
    monkeypatch.setenv("INGESTOR_STAGING_PARAMETERS", json.dumps(PARAMS))
    monkeypatch.setenv("INGESTOR_STAGING_CREDENTIALS", json.dumps(CREDS))
    p = EnvConfigProvider("staging")
    assert p.parameters() == PARAMS
    assert p.credentials()["corleone_user"] == "ingestor"


def test_jdbc_config_psql(file_provider):
    cfg = jdbc_config(file_provider, "corleone", kind="psql")
    assert cfg.url == "jdbc:postgresql://db.internal:5432/corleone"
    assert cfg.user == "ingestor"
    assert cfg.password == "s3cret"
    assert cfg.kind == "psql"


def test_jdbc_config_sqlserver(file_provider):
    cfg = jdbc_config(file_provider, "checkout", kind="sqlserver")
    assert cfg.url == "jdbc:sqlserver://mssql.internal:1433;databaseName=checkout"
    assert cfg.kind == "sqlserver"


def test_missing_env_var_raises(monkeypatch):
    monkeypatch.delenv("INGESTOR_DEV_PARAMETERS", raising=False)
    with pytest.raises(ConfigError, match="INGESTOR_DEV_PARAMETERS"):
        EnvConfigProvider("dev").parameters()


def test_missing_file_raises(tmp_path):
    with pytest.raises(ConfigError, match="parameters.json"):
        JsonFileConfigProvider(str(tmp_path), "nope").parameters()


def test_invalid_json_raises(monkeypatch):
    monkeypatch.setenv("INGESTOR_DEV_PARAMETERS", "{not json")
    with pytest.raises(ConfigError, match="not valid JSON"):
        EnvConfigProvider("dev").parameters()


def test_missing_key_names_it(file_provider):
    with pytest.raises(ConfigError, match="'billing_host'"):
        jdbc_config(file_provider, "billing")


def test_unknown_kind_raises(file_provider):
    with pytest.raises(ConfigError, match="oracle"):
        jdbc_config(file_provider, "corleone", kind="oracle")


def test_cli_resolves_paths_from_environment_config(spark, tmp_path, capsys):
    """--environment supplies source/lake/watermark paths from the
    config namespace (the reference's Environment parameter selecting
    an SSM namespace, gluejob.py:603)."""
    from data_ingestor_gluejob_script_spark.__main__ import main

    cfg_root = tmp_path / "cfg"
    env_dir = cfg_root / "prod"
    env_dir.mkdir(parents=True)
    (env_dir / "parameters.json").write_text(json.dumps({
        "source_root": str(tmp_path / "load"),
        "lake_root": str(tmp_path / "lake"),
        "watermark_path": str(tmp_path / "wm.json"),
    }))
    (env_dir / "credentials.json").write_text("{}")
    os.makedirs(tmp_path / "load", exist_ok=True)

    rc = main([
        "--trigger-origin", "Mystery",  # no-op flow; tests resolution only
        "--environment", "prod",
        "--config-root", str(cfg_root),
    ])
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["flow"] == "no-op"


def test_cli_missing_environment_config_fails(tmp_path, capsys):
    from data_ingestor_gluejob_script_spark.__main__ import main

    rc = main([
        "--environment", "ghost",
        "--config-root", str(tmp_path),
    ])
    assert rc == 2
    assert "config error" in capsys.readouterr().err


def test_cli_config_root_without_environment_errors(tmp_path, capsys):
    """--config-root alone used to be silently ignored (the provider
    branch only runs under --environment), leaving the user with
    'required' errors for path flags they expected the config to
    supply. It must fail loudly instead."""
    import pytest

    from data_ingestor_gluejob_script_spark.__main__ import main

    with pytest.raises(SystemExit) as exc:
        main(["--config-root", str(tmp_path)])
    assert exc.value.code == 2
    assert "requires --environment" in capsys.readouterr().err
