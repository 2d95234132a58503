"""Config/profile persistence (reference core/config_manager.py:1-215).

Same contract, engine-shaped settings: JSON file under an XDG-style app
data dir, defaults overlaid by whatever the file holds, invalid values
falling back to defaults instead of raising (the reference's theme /
log-level truth tables — here the validated enum is the LLM provider and
the numerics are sample sizes / timeouts / export batch size, the knobs
this engine actually reads). The TUI-only keys (theme) are intentionally
absent: this engine has no Textual front-end.

Validation policy (mirrors config_manager.py:123-137, 162-194):
* enum keys   — invalid value → reset to default, with a warning;
* log level   — case-insensitive, canonicalized to upper;
* numeric     — wrong type / non-positive → reset to default;
* temperature — must parse as float in [0, 2] → else default;
* unknown keys pass through untouched (forward compatibility).
"""

from __future__ import annotations

import json
import logging
import os
from pathlib import Path
from typing import Any

logger = logging.getLogger(__name__)

APP_DIR_NAME = "mongo_analyser_spark"
DEFAULT_CONFIG_FILE_NAME = "config.json"

VALID_PROVIDERS = ["ollama", "openai", "google", "litellm", "universal", "echo"]
VALID_LOG_LEVELS = ["DEBUG", "INFO", "WARNING", "ERROR", "CRITICAL", "OFF"]

DEFAULT_SETTINGS: dict[str, Any] = {
    "default_log_level": "OFF",
    "schema_analysis_default_sample_size": 1000,
    "data_explorer_default_sample_size": 10,
    "export_batch_size": 10_000,
    "connect_timeout_sec": 30,
    "llm_default_provider": "ollama",
    "llm_default_model_ollama": "gemma3:4b",
    "llm_default_model_openai": "gpt-4.1-nano",
    "llm_default_model_google": "models/gemini-2.0-flash-lite",
    "llm_default_temperature": 0.7,
    "llm_default_max_history": 20,
    "spark_shuffle_partitions": 32,
}

# keys whose values must be positive ints
_POSITIVE_INT_KEYS = {
    "schema_analysis_default_sample_size",
    "data_explorer_default_sample_size",
    "export_batch_size",
    "connect_timeout_sec",
    "llm_default_max_history",
    "spark_shuffle_partitions",
}


def _valid_positive_int(value: Any) -> bool:
    return isinstance(value, int) and not isinstance(value, bool) and value > 0


def _valid_temperature(value: Any) -> bool:
    return isinstance(value, (int, float)) and not isinstance(value, bool) and 0 <= value <= 2


class ConfigManager:
    """Load-on-init, explicit save, validated getters/setters."""

    def __init__(self, base_app_data_dir_override: Path | None = None):
        if base_app_data_dir_override:
            self._base_app_data_dir = Path(base_app_data_dir_override).expanduser().resolve()
        else:
            self._base_app_data_dir = self._default_base_app_data_dir()
        try:
            self._base_app_data_dir.mkdir(parents=True, exist_ok=True)
        except OSError as e:
            logger.error("cannot create app data dir %s: %s", self._base_app_data_dir, e)
        self._config_file_path = self._base_app_data_dir / DEFAULT_CONFIG_FILE_NAME
        self._config: dict[str, Any] = {}
        self.load_config()

    @staticmethod
    def _default_base_app_data_dir() -> Path:
        xdg = os.environ.get("XDG_DATA_HOME")
        if xdg:
            return Path(xdg) / APP_DIR_NAME
        return Path.home() / ".local" / "share" / APP_DIR_NAME

    # -- paths ------------------------------------------------------------

    def get_base_app_data_dir(self) -> Path:
        return self._base_app_data_dir

    def get_config_file_path(self) -> Path:
        return self._config_file_path

    def _get_or_create_subdir(self, name: str) -> Path:
        subdir = self._base_app_data_dir / name
        try:
            subdir.mkdir(parents=True, exist_ok=True)
        except OSError as e:
            logger.error("cannot create subdir %s: %s", subdir, e)
        return subdir

    def get_logs_dir(self) -> Path:
        return self._get_or_create_subdir("logs")

    def get_chats_dir(self) -> Path:
        return self._get_or_create_subdir("chats")

    def get_exports_dir(self) -> Path:
        return self._get_or_create_subdir("exports")

    # -- load/save --------------------------------------------------------

    def _sanitize(self, config: dict[str, Any]) -> dict[str, Any]:
        """Apply the invalid-value fallback truth table in place."""
        if config.get("llm_default_provider") not in VALID_PROVIDERS:
            logger.warning(
                "invalid llm_default_provider %r — resetting to default",
                config.get("llm_default_provider"),
            )
            config["llm_default_provider"] = DEFAULT_SETTINGS["llm_default_provider"]

        level = config.get("default_log_level")
        if isinstance(level, str) and level.upper() in VALID_LOG_LEVELS:
            config["default_log_level"] = level.upper()
        else:
            logger.warning("invalid default_log_level %r — resetting to default", level)
            config["default_log_level"] = DEFAULT_SETTINGS["default_log_level"]

        for key in _POSITIVE_INT_KEYS:
            if key in config and not _valid_positive_int(config[key]):
                logger.warning("invalid %s %r — resetting to default", key, config[key])
                config[key] = DEFAULT_SETTINGS[key]

        if "llm_default_temperature" in config and not _valid_temperature(
            config["llm_default_temperature"]
        ):
            logger.warning(
                "invalid llm_default_temperature %r — resetting to default",
                config["llm_default_temperature"],
            )
            config["llm_default_temperature"] = DEFAULT_SETTINGS["llm_default_temperature"]
        return config

    def load_config(self) -> None:
        loaded: dict[str, Any] = {}
        if self._config_file_path.is_file():
            try:
                with open(self._config_file_path, encoding="utf-8") as f:
                    loaded = json.load(f)
                if not isinstance(loaded, dict):
                    logger.error("config file is not a JSON object — using defaults")
                    loaded = {}
            except (OSError, json.JSONDecodeError) as e:
                logger.error("error loading %s: %s — using defaults", self._config_file_path, e)
                loaded = {}
        self._config = DEFAULT_SETTINGS.copy()
        self._config.update(loaded)
        self._sanitize(self._config)

    def save_config(self) -> bool:
        try:
            self._base_app_data_dir.mkdir(parents=True, exist_ok=True)
            with open(self._config_file_path, "w", encoding="utf-8") as f:
                json.dump(self._config, f, indent=2)
            return True
        except OSError as e:
            logger.error("error saving %s: %s", self._config_file_path, e)
            return False

    # -- settings ---------------------------------------------------------

    def get_setting(self, key: str, default: Any = None) -> Any:
        if key in self._config:
            return self._config[key]
        return DEFAULT_SETTINGS.get(key, default)

    def update_setting(self, key: str, value: Any) -> None:
        self._config[key] = value
        self._sanitize(self._config)

    def update_settings(self, new_settings: dict[str, Any]) -> None:
        for key, value in new_settings.items():
            self.update_setting(key, value)

    def get_all_settings(self) -> dict[str, Any]:
        effective = DEFAULT_SETTINGS.copy()
        effective.update(self._config)
        return self._sanitize(effective)
