"""Secrets providers — the configuration surface the reference carried
but never actually exercised.

Reference parity: ``utils/secrets_manger.py:18-135`` implements an AWS
Secrets Manager client (cached JSON secret → per-key lookup with
default), but the file name is typo'd and its importers reference the
non-existent ``utils.secrets_manager``, so the whole path is dead code
in practice (SURVEY.md §3.4). Here the surface is live and backend-
pluggable:

- :class:`EnvSecretsProvider` — secrets from environment variables
  (optionally prefix-scoped): the container/k8s-native default.
- :class:`JsonFileSecretsProvider` — secrets from a mounted JSON file
  (the shape a k8s Secret volume or SOPS-decrypted file provides).
- :class:`AwsSecretsProvider` — the reference's AWS Secrets Manager
  backend, import-try-gated on boto3 (not present in this container);
  same contract: one cached ``GetSecretValue`` JSON fetch, per-key
  access with defaults.

All providers share the reference's two semantics worth keeping: the
secret payload is fetched/parsed once and cached, and per-key access
never raises (missing key → default). Values are never logged."""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional


class SecretsProvider:
    """Contract mirroring the reference ``SecretsManager``
    (``utils/secrets_manger.py:54-128``): bulk fetch + per-key access."""

    def get_secret_values(self) -> Dict[str, Any]:
        raise NotImplementedError

    def get_secret_value(self, key: str, default: Optional[str] = None) -> Optional[str]:
        try:
            return self.get_secret_values().get(key, default)
        except Exception:
            # reference parity: per-key access degrades to the default
            # rather than failing the job (utils/secrets_manger.py:124-128)
            return default


class EnvSecretsProvider(SecretsProvider):
    """Secrets straight from the process environment. With a prefix,
    ``get_secret_value("DB_PASSWORD")`` reads ``<prefix>DB_PASSWORD`` —
    the pattern k8s ``envFrom: secretRef`` produces."""

    def __init__(self, prefix: str = "") -> None:
        self.prefix = prefix

    def get_secret_values(self) -> Dict[str, Any]:
        if not self.prefix:
            return dict(os.environ)
        return {
            k[len(self.prefix):]: v
            for k, v in os.environ.items()
            if k.startswith(self.prefix)
        }


class JsonFileSecretsProvider(SecretsProvider):
    """Secrets from a JSON file (a mounted k8s Secret volume). Parsed
    once and cached, like the reference's cached AWS fetch."""

    def __init__(self, path: str) -> None:
        self.path = path
        self._cached: Optional[Dict[str, Any]] = None

    def get_secret_values(self) -> Dict[str, Any]:
        if self._cached is None:
            with open(self.path) as f:
                self._cached = json.load(f)
            if not isinstance(self._cached, dict):
                raise ValueError(f"secrets file {self.path} must hold a JSON object")
        return self._cached


class AwsSecretsProvider(SecretsProvider):
    """AWS Secrets Manager backend (reference
    ``utils/secrets_manger.py:24-104``): one ``GetSecretValue`` call,
    JSON-parsed and cached. Requires boto3 — absent in this container,
    so construction raises a clear ImportError rather than failing
    deep inside a job."""

    def __init__(self, secret_name: Optional[str] = None, region_name: str = "us-east-1") -> None:
        try:
            import boto3  # noqa: F401
        except ImportError as e:
            raise ImportError(
                "AwsSecretsProvider requires boto3; use EnvSecretsProvider "
                "or JsonFileSecretsProvider in environments without it"
            ) from e
        import boto3

        self.secret_name = secret_name or os.environ.get("AWS_SECRET_NAME", "")
        if not self.secret_name:
            raise ValueError("secret_name or AWS_SECRET_NAME is required")
        self._client = boto3.session.Session().client(
            service_name="secretsmanager", region_name=region_name
        )
        self._cached: Optional[Dict[str, Any]] = None

    def get_secret_values(self) -> Dict[str, Any]:
        if self._cached is None:
            resp = self._client.get_secret_value(SecretId=self.secret_name)
            self._cached = json.loads(resp["SecretString"])
        return self._cached


def get_secrets_provider() -> SecretsProvider:
    """Factory selected by ``SPARK_ETL_SECRETS_SOURCE``:

    - ``env`` (default) → :class:`EnvSecretsProvider`, prefix from
      ``SPARK_ETL_SECRETS_PREFIX``
    - ``file`` → :class:`JsonFileSecretsProvider` at
      ``SPARK_ETL_SECRETS_FILE``
    - ``aws`` → :class:`AwsSecretsProvider` (boto3 required)
    """
    source = os.environ.get("SPARK_ETL_SECRETS_SOURCE", "env").lower()
    if source == "env":
        return EnvSecretsProvider(os.environ.get("SPARK_ETL_SECRETS_PREFIX", ""))
    if source == "file":
        path = os.environ.get("SPARK_ETL_SECRETS_FILE", "")
        if not path:
            raise ValueError("SPARK_ETL_SECRETS_FILE is required for file source")
        return JsonFileSecretsProvider(path)
    if source == "aws":
        return AwsSecretsProvider()
    raise ValueError(f"unknown SPARK_ETL_SECRETS_SOURCE {source!r}")
