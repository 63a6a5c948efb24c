"""Config resolution with reference parity (config.go:14-29, 92-166):
defaults < EXECUTESYNC_* env < CLI flags. Field set mirrors the reference;
DATABASE_TYPE gains spark-native values (parquet, jdbc) and EXECUTE_URL may
be a ``file://`` feed directory (the file-based source)."""

from __future__ import annotations

import os
from dataclasses import dataclass, fields
from typing import Optional

_ENV_PREFIX = "EXECUTESYNC_"

_FIELD_ENV = {
    "execute_url": "EXECUTE_URL",
    "execute_key_id": "EXECUTE_APIKEY_ID",
    "execute_key_secret": "EXECUTE_APIKEY_SECRET",
    "max_documents": "MAX_DOCUMENTS",
    "database_type": "DATABASE_TYPE",
    "database_dsn": "DATABASE_DSN",
    "state_dir": "STATE_DIR",
    "wait": "WAIT",
    "chunk_size": "CHUNK_SIZE",
    "include_calcs": "INCLUDE_CALCS",
    "hide_inactive_fields": "HIDE_INACTIVE_FIELDS",
    "log_level": "LOG_LEVEL",
    "force": "FORCE",
}

_SECRET_FIELDS = {"execute_key_secret", "database_dsn"}


@dataclass
class Config:
    execute_url: str = ""
    execute_key_id: str = ""
    execute_key_secret: str = ""
    max_documents: int = 10000
    database_type: str = "parquet"
    database_dsn: str = ""
    state_dir: str = "."
    wait: int = 600
    chunk_size: int = 10000
    include_calcs: bool = False
    hide_inactive_fields: bool = False
    log_level: str = "info"
    force: bool = False
    # spark extras (not in the reference)
    compat_chunking: bool = False  # chunk-split is off by default in Spark

    def redacted(self) -> dict:
        out = {}
        for f in fields(self):
            v = getattr(self, f.name)
            out[f.name] = "********" if f.name in _SECRET_FIELDS and v else v
        return out


def _coerce(value: str, target_type: type):
    if target_type is bool:
        return value.strip().lower() in ("1", "true", "yes", "on")
    if target_type is int:
        return int(value)
    return value


def resolve_config(cli_overrides: Optional[dict] = None) -> Config:
    """defaults < env < CLI flags (None CLI values are ignored)."""
    cfg = Config()
    for f in fields(Config):
        env_name = _FIELD_ENV.get(f.name)
        if env_name:
            raw = os.environ.get(_ENV_PREFIX + env_name)
            if raw is not None:
                setattr(cfg, f.name, _coerce(raw, f.type if isinstance(f.type, type) else type(getattr(cfg, f.name))))
    for key, value in (cli_overrides or {}).items():
        if value is not None and hasattr(cfg, key):
            setattr(cfg, key, value)
    # SQLite-style default DSN under state dir (config.go:132-136 analog)
    if not cfg.database_dsn and cfg.database_type == "parquet":
        cfg.database_dsn = os.path.join(cfg.state_dir, "execute_documents")
    return cfg
