"""ConfigManager truth tables — port of the reference's
tests/core/test_config_manager.py:20-287 with the engine's validated keys
(llm_default_provider plays the reference's theme role; numerics are the
sample-size/timeout/batch-size knobs). No Spark session needed."""

from __future__ import annotations

import json

import pytest

from mongo_analyser_spark.config import (
    DEFAULT_SETTINGS,
    VALID_LOG_LEVELS,
    VALID_PROVIDERS,
    ConfigManager,
)


@pytest.fixture
def base_dir(tmp_path):
    return tmp_path / "mongo_analyser_spark"


@pytest.fixture
def cm_empty(base_dir):
    return ConfigManager(base_app_data_dir_override=base_dir)


def write_config(base_dir, settings):
    base_dir.mkdir(parents=True, exist_ok=True)
    (base_dir / "config.json").write_text(json.dumps(settings))


# -- load ------------------------------------------------------------------


def test_no_file_yields_defaults(cm_empty):
    for key, val in DEFAULT_SETTINGS.items():
        assert cm_empty.get_setting(key) == val


def test_default_path_respects_xdg_data_home(monkeypatch, tmp_path):
    monkeypatch.setenv("XDG_DATA_HOME", str(tmp_path / "xdg"))
    cm = ConfigManager()
    assert cm.get_config_file_path() == tmp_path / "xdg" / "mongo_analyser_spark" / "config.json"


def test_default_path_falls_back_to_home_local_share(monkeypatch, tmp_path):
    monkeypatch.delenv("XDG_DATA_HOME", raising=False)
    monkeypatch.setattr("pathlib.Path.home", lambda: tmp_path / "home")
    cm = ConfigManager()
    assert cm.get_config_file_path() == (
        tmp_path / "home" / ".local" / "share" / "mongo_analyser_spark" / "config.json"
    )


def test_file_values_overlay_defaults(base_dir):
    write_config(base_dir, {"llm_default_provider": "openai",
                            "schema_analysis_default_sample_size": 50})
    cm = ConfigManager(base_app_data_dir_override=base_dir)
    assert cm.get_setting("llm_default_provider") == "openai"
    assert cm.get_setting("schema_analysis_default_sample_size") == 50
    # untouched keys keep defaults
    assert cm.get_setting("export_batch_size") == DEFAULT_SETTINGS["export_batch_size"]


def test_invalid_json_uses_defaults_and_logs(base_dir, caplog):
    base_dir.mkdir(parents=True)
    (base_dir / "config.json").write_text("this is not json")
    with caplog.at_level("ERROR", logger="mongo_analyser_spark.config"):
        cm = ConfigManager(base_app_data_dir_override=base_dir)
    assert cm.get_all_settings() == DEFAULT_SETTINGS
    assert "error loading" in caplog.text


def test_invalid_enum_in_file_resets_with_warning(base_dir, caplog):
    write_config(base_dir, {"llm_default_provider": "not-a-provider",
                            "schema_analysis_default_sample_size": 50})
    with caplog.at_level("WARNING", logger="mongo_analyser_spark.config"):
        cm = ConfigManager(base_app_data_dir_override=base_dir)
    assert cm.get_setting("llm_default_provider") == DEFAULT_SETTINGS["llm_default_provider"]
    assert cm.get_setting("schema_analysis_default_sample_size") == 50
    assert "llm_default_provider" in caplog.text


def test_log_level_canonicalized_to_upper(base_dir):
    write_config(base_dir, {"default_log_level": "debug"})
    cm = ConfigManager(base_app_data_dir_override=base_dir)
    assert cm.get_setting("default_log_level") == "DEBUG"


def test_invalid_numerics_reset(base_dir):
    write_config(
        base_dir,
        {
            "schema_analysis_default_sample_size": -5,
            "export_batch_size": "many",
            "connect_timeout_sec": 0,
            "llm_default_max_history": True,  # bool is not a count
            "llm_default_temperature": 9.5,
        },
    )
    cm = ConfigManager(base_app_data_dir_override=base_dir)
    for key in (
        "schema_analysis_default_sample_size",
        "export_batch_size",
        "connect_timeout_sec",
        "llm_default_max_history",
        "llm_default_temperature",
    ):
        assert cm.get_setting(key) == DEFAULT_SETTINGS[key], key


# -- save ------------------------------------------------------------------


def test_save_creates_file_and_roundtrips(cm_empty):
    cm_empty.update_setting("new_key", "new_value")
    assert not cm_empty.get_config_file_path().exists()
    assert cm_empty.save_config() is True
    saved = json.loads(cm_empty.get_config_file_path().read_text())
    expected = DEFAULT_SETTINGS.copy()
    expected["new_key"] = "new_value"
    assert saved == expected


def test_save_io_error_returns_false(cm_empty, monkeypatch, caplog):
    def boom(*a, **k):
        raise OSError("disk full")

    monkeypatch.setattr("json.dump", boom)
    with caplog.at_level("ERROR", logger="mongo_analyser_spark.config"):
        assert cm_empty.save_config() is False
    assert "error saving" in caplog.text


# -- get/update ------------------------------------------------------------


def test_get_setting_fallback_chain(cm_empty):
    assert cm_empty.get_setting("no_such_key", "fallback") == "fallback"
    assert cm_empty.get_setting("no_such_key") is None
    assert (
        cm_empty.get_setting("llm_default_provider")
        == DEFAULT_SETTINGS["llm_default_provider"]
    )


def test_update_setting_valid_enum(cm_empty):
    cm_empty.update_setting("llm_default_provider", "google")
    assert cm_empty.get_setting("llm_default_provider") == "google"


def test_update_setting_invalid_enum_resets_with_warning(cm_empty, caplog):
    with caplog.at_level("WARNING", logger="mongo_analyser_spark.config"):
        cm_empty.update_setting("llm_default_provider", "bogus")
    assert cm_empty.get_setting("llm_default_provider") == DEFAULT_SETTINGS["llm_default_provider"]
    assert "llm_default_provider" in caplog.text


def test_update_settings_bulk_validates_each(cm_empty):
    cm_empty.update_settings(
        {
            "llm_default_temperature": 0.9,
            "data_explorer_default_sample_size": 50,
            "llm_default_provider": "bogus",
        }
    )
    assert cm_empty.get_setting("llm_default_temperature") == 0.9
    assert cm_empty.get_setting("data_explorer_default_sample_size") == 50
    assert cm_empty.get_setting("llm_default_provider") == DEFAULT_SETTINGS["llm_default_provider"]


def test_get_all_settings_returns_corrected_copy(base_dir):
    write_config(base_dir, {"llm_default_provider": "bogus", "another_key": "value"})
    cm = ConfigManager(base_app_data_dir_override=base_dir)
    allset = cm.get_all_settings()
    assert allset["llm_default_provider"] == DEFAULT_SETTINGS["llm_default_provider"]
    assert allset["another_key"] == "value"
    allset["llm_default_provider"] = "mutated"
    assert cm.get_setting("llm_default_provider") == DEFAULT_SETTINGS["llm_default_provider"]


def test_subdirs_created_on_demand(cm_empty):
    for getter in (cm_empty.get_logs_dir, cm_empty.get_chats_dir, cm_empty.get_exports_dir):
        d = getter()
        assert d.is_dir()


def test_constants_are_sane():
    assert DEFAULT_SETTINGS["llm_default_provider"] in VALID_PROVIDERS
    assert DEFAULT_SETTINGS["default_log_level"] in VALID_LOG_LEVELS
    assert all(isinstance(p, str) for p in VALID_PROVIDERS)
