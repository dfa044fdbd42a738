"""Config seam tests: env-default loading and the pluggable
credentials provider (the cloud-secrets-manager deployment seam)."""

from __future__ import annotations

from knightshift_spark.config import load_config


def test_env_defaults(monkeypatch):
    monkeypatch.delenv("KS_JDBC_URL", raising=False)
    monkeypatch.setenv("KS_SECONDS_PER_FETCH", "0.25")
    cfg = load_config()
    assert cfg.jdbc_url is None
    assert cfg.seconds_per_fetch == 0.25


def test_credentials_provider_overrides_env(monkeypatch):
    monkeypatch.setenv("KS_JDBC_URL", "jdbc:derby:env")
    monkeypatch.setenv("KS_JDBC_USER", "env_user")
    monkeypatch.delenv("KS_JDBC_PASSWORD", raising=False)

    vault = {"KS_JDBC_URL": "jdbc:derby:vault", "KS_JDBC_PASSWORD": "s3cret"}
    cfg = load_config(credentials_provider=vault.get)
    assert cfg.jdbc_url == "jdbc:derby:vault"  # provider wins
    assert cfg.jdbc_user == "env_user"  # provider miss → env fallback
    assert cfg.jdbc_password == "s3cret"  # provider-only key


def test_credentials_provider_never_breaks_non_secrets(monkeypatch):
    monkeypatch.setenv("KS_FETCH_PARTITIONS", "12")
    cfg = load_config(credentials_provider=lambda name: None)
    assert cfg.fetch_partitions == 12
