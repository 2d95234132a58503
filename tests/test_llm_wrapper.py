"""UniversalProvider truth tables (reference llm_chat/wrapper.py:84-396):
model-string routing, name qualification, payload defaults, error-string
formats, and blocklist-filtered listing — all offline via fake transport,
mirroring the reference's mocked-SDK test strategy."""

from __future__ import annotations

from mongo_analyser_spark.llm.wrapper import UniversalProvider, list_models_for
from tests.test_llm_providers import FakeTransport

# ------------------------------------------------------------- routing


def test_provider_guess_truth_table():
    """wrapper.py:105-125 — guessed provider and qualified model name."""
    cases = [
        ("gpt-4o", "openai", "gpt-4o"),
        ("openai/gpt-4.1", "openai", "openai/gpt-4.1"),
        ("gemini-1.5-pro", "google", "gemini/gemini-1.5-pro"),
        ("models/gemini-2.0", "google", "models/gemini-2.0"),
        ("ollama/llama3", "ollama", "ollama/llama3"),
        ("claude-3-haiku", "anthropic", "claude-3-haiku"),
        ("mistral/mixtral-8x7b", "mistral", "mistral/mixtral-8x7b"),
        ("open-mistral-7b", "mistral", "open-mistral-7b"),
        # 'mixtral' alone has no 'mistral' substring — the reference's
        # guess (wrapper.py:114-121) also returns None for it
        ("mixtral-8x7b", None, "mixtral-8x7b"),
        # note: 'azure/gpt-4' guesses openai — the reference checks the
        # 'gpt-4' substring before the azure/ prefix (wrapper.py:107,122)
        ("azure/my-deployment", "azure", "azure/my-deployment"),
        ("totally-unknown", None, "totally-unknown"),
    ]
    for raw, provider, qualified in cases:
        p = UniversalProvider(raw, transport=FakeTransport(), api_key="k")
        assert p.provider_hint == provider, raw
        assert p.model_name == qualified, raw


def test_provider_hint_overrides_guess():
    """wrapper.py:87-90: an explicit hint wins over the name shape, and a
    bare name under an ollama hint gets the router prefix."""
    p = UniversalProvider("llama3", provider_hint="ollama", transport=FakeTransport())
    assert p.provider_hint == "ollama"
    assert p.model_name == "ollama/llama3"
    # the vendor-facing delegate sees the bare name again
    assert p._delegate.model_name == "llama3"


def test_config_defaults_and_extra_passthrough():
    """wrapper.py:128-141: temperature 0.7 / max_tokens 2048 defaults;
    unknown kwargs pass through to the completion params (:177-192)."""
    p = UniversalProvider(
        "gpt-4o", transport=FakeTransport(), api_key="k", seed=7, top_p=0.5
    )
    assert p.temperature == 0.7 and p.max_tokens == 2048
    assert p._delegate.completion_kwargs["temperature"] == 0.7
    assert p._delegate.completion_kwargs["max_tokens"] == 2048
    assert p._delegate.completion_kwargs["seed"] == 7
    assert p._delegate.completion_kwargs["top_p"] == 0.5


def test_google_route_carries_generation_config():
    p = UniversalProvider(
        "gemini-1.5-flash", transport=FakeTransport(), api_key="k",
        temperature=0.2, max_tokens=64,
    )
    assert p._delegate.generation_config == {
        "temperature": 0.2, "maxOutputTokens": 64,
    }


# ------------------------------------------------------------- payload


def test_system_prompt_prepended_and_history_forwarded():
    """wrapper.py:148-161: system first, history next, user message last."""
    t = FakeTransport(post={"choices": [{"message": {"content": " hi "}}]})
    p = UniversalProvider(
        "gpt-4o", transport=t, api_key="k", system_prompt="be terse"
    )
    out = p.send_message("q", history=[{"role": "ai", "content": "prev"}])
    assert out == "hi"  # stripped like wrapper.py:213
    payload = t.requests[-1][2]
    assert payload["messages"] == [
        {"role": "system", "content": "be terse"},
        {"role": "assistant", "content": "prev"},
        {"role": "user", "content": "q"},
    ]


# ------------------------------------------------------------- errors


def test_unroutable_provider_yields_reference_error_string():
    """anthropic/mistral/azure/unknown have no REST delegate here: the
    failure surfaces as wrapper.py:215-221's error string, not a raise."""
    p = UniversalProvider("claude-3-haiku", transport=FakeTransport())
    out = p.send_message("hello")
    assert out.startswith("Error from LLM (claude-3-haiku): ValueError - ")
    chunks = list(p.stream_message("hello"))
    assert len(chunks) == 1
    assert chunks[0].startswith("Error streaming from LLM (claude-3-haiku):")


def test_delegate_construction_failure_defers_to_send():
    """A missing Google API key raises in the vendor ctor; the wrapper
    defers it to send_message as the error string (no exception at
    construction, matching the reference's lazy completion failure)."""
    import os

    assert "GOOGLE_API_KEY" not in os.environ or os.environ.get("GOOGLE_API_KEY")
    old = os.environ.pop("GOOGLE_API_KEY", None)
    try:
        p = UniversalProvider("gemini-1.5-pro", transport=FakeTransport())
        out = p.send_message("q")
        assert out.startswith("Error from LLM (gemini-1.5-pro): ValueError - ")
    finally:
        if old is not None:
            os.environ["GOOGLE_API_KEY"] = old


# ------------------------------------------------------------- listing


def test_list_models_applies_blocklist_to_base_and_fq_names():
    """wrapper.py:284-295: ':tag' stripped to the base name, blocklist
    checked against BOTH forms, result deduped + sorted."""
    t = FakeTransport(get={"models": [
        {"name": "llama3:latest"},
        {"name": "llama3:8b"},
        {"name": "nomic-embed-text:latest"},  # blocked: .*embed.*
        {"name": "bge-m3:latest"},            # blocked: bge-.*
        {"name": "mistral:7b"},
    ]})
    p = UniversalProvider("llama3", provider_hint="ollama", transport=t)
    assert p.list_models() == ["llama3", "mistral"]


def test_list_models_for_without_provider_is_empty():
    assert list_models_for(None) == []
    assert list_models_for("") == []


def test_list_models_for_routes_and_survives_failure():
    t = FakeTransport(get={"models": [{"name": "phi3:latest"}]})
    assert list_models_for("ollama", transport=t) == ["phi3"]
    dead = FakeTransport(fail=True)
    assert list_models_for("ollama", transport=dead) == []


def test_make_provider_universal_route(tmp_path):
    from mongo_analyser_spark.config import ConfigManager
    from mongo_analyser_spark.llm.factory import make_provider

    cm = ConfigManager(base_app_data_dir_override=tmp_path / "app")
    cm.update_setting("llm_default_provider", "litellm")
    p = make_provider(cm, transport=FakeTransport(), model="gpt-4o", api_key="k")
    assert isinstance(p, UniversalProvider)
    assert p.provider_hint == "openai"
    assert p.temperature == 0.7  # config default reaches the wrapper
    import pytest

    with pytest.raises(ValueError):
        make_provider(cm, transport=FakeTransport())  # no model string
