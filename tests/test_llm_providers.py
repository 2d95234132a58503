"""Provider-client truth tables, mirroring the reference's mocked-SDK tests
(tests/llm_chat/test_{ollama,openai,google}.py) with a fake transport in
place of mocked vendor SDKs. No network, no Spark session needed."""

from __future__ import annotations

import pytest

from mongo_analyser_spark.llm.providers import (
    GoogleProvider,
    OllamaProvider,
    OpenAIProvider,
)


class FakeTransport:
    """Canned HTTP-JSON responses; records every request for assertions."""

    def __init__(self, get=None, post=None, stream=None, fail=False):
        self.get_resp = get or {}
        self.post_resp = post or {}
        self.stream_events = stream or []
        self.fail = fail
        self.requests = []

    def get_json(self, url, headers=None, timeout=30.0):
        self.requests.append(("GET", url, None, headers))
        if self.fail:
            raise OSError("connection refused")
        return self.get_resp

    def post_json(self, url, payload, headers=None, timeout=30.0):
        self.requests.append(("POST", url, payload, headers))
        if self.fail:
            raise OSError("connection refused")
        return self.post_resp

    def post_stream(self, url, payload, headers=None, timeout=30.0):
        self.requests.append(("STREAM", url, payload, headers))
        if self.fail:
            raise OSError("connection refused")
        yield from self.stream_events


# ---------------------------------------------------------------- ollama


def _ollama(transport):
    return OllamaProvider("m1", host="http://h:11434", transport=transport)


def test_ollama_send_builds_messages_and_merges_options():
    t = FakeTransport(post={"message": {"content": "hi there"}})
    p = OllamaProvider(
        "m1",
        host="http://h:11434",
        transport=t,
        options={"num_ctx": 2048, "temperature": 0.1},
        temperature=0.7,  # config temperature overrides options temperature
    )
    out = p.send_message("hello", history=[{"role": "ai", "content": "prev"}])
    assert out == "hi there"
    _, url, payload, _ = t.requests[-1]
    assert url == "http://h:11434/api/chat"
    # 'ai' canonicalized to 'assistant'; user message appended last
    assert payload["messages"] == [
        {"role": "assistant", "content": "prev"},
        {"role": "user", "content": "hello"},
    ]
    assert payload["options"] == {"num_ctx": 2048, "temperature": 0.7}
    assert payload["keep_alive"] == "5m"
    assert payload["stream"] is False


def test_ollama_non_dict_options_reset_to_empty():
    t = FakeTransport(post={"message": {"content": "x"}})
    p = OllamaProvider("m1", host="http://h", transport=t, options="not-a-dict")
    p.send_message("q")
    assert "options" not in t.requests[-1][2]  # empty options omitted


def test_ollama_init_unreachable_raises_connection_error():
    with pytest.raises(ConnectionError):
        OllamaProvider("m1", host="http://h", transport=FakeTransport(fail=True))


def test_ollama_stream_yields_until_done():
    t = FakeTransport(
        stream=[
            {"message": {"content": "a"}},
            {"message": {"content": ""}},  # empty chunk skipped
            {"message": {"content": "b"}},
            {"done": True, "message": {"content": "ignored"}},
        ]
    )
    assert list(_ollama(t).stream_message("q")) == ["a", "b"]


def test_ollama_send_error_returns_string_not_raise():
    p = _ollama(FakeTransport())
    p.transport = FakeTransport(fail=True)
    assert p.send_message("q").startswith("Error:")
    assert list(p.stream_message("q"))[0].startswith("Error:")


def test_ollama_list_models_filters_blocklist_sorted_distinct():
    t = FakeTransport(
        get={
            "models": [
                {"model": "llama3:latest"},
                {"name": "zeta:1b"},  # legacy 'name' key accepted
                {"model": "llama3:latest"},  # duplicate dropped
                {"model": "nomic-embed-text:latest"},  # blocklisted
                {},
            ]
        }
    )
    assert _ollama(t).list_models() == ["llama3:latest", "zeta:1b"]


# ---------------------------------------------------------------- openai


def test_openai_missing_key_warns_but_constructs(monkeypatch, caplog):
    monkeypatch.delenv("OPENAI_API_KEY", raising=False)
    monkeypatch.delenv("OPENAI_BASE_URL", raising=False)
    with caplog.at_level("WARNING"):
        p = OpenAIProvider("gpt-x", transport=FakeTransport())
    assert p.api_key is None
    assert any("API key" in r.message for r in caplog.records)


def test_openai_send_strips_and_sends_bearer(monkeypatch):
    monkeypatch.delenv("OPENAI_BASE_URL", raising=False)
    t = FakeTransport(post={"choices": [{"message": {"content": "  answer \n"}}]})
    p = OpenAIProvider("gpt-x", api_key="sk-test", transport=t, temperature=0.2)
    assert p.send_message("q", history=[{"role": "ai", "content": "h"}]) == "answer"
    _, url, payload, headers = t.requests[-1]
    assert url == "https://api.openai.com/v1/chat/completions"
    assert headers == {"Authorization": "Bearer sk-test"}
    assert payload["messages"][0] == {"role": "assistant", "content": "h"}
    assert payload["temperature"] == 0.2  # extra kwargs pass through


def test_openai_stream_yields_deltas():
    t = FakeTransport(
        stream=[
            {"choices": [{"delta": {"role": "assistant"}}]},  # no content
            {"choices": [{"delta": {"content": "he"}}]},
            {"choices": [{"delta": {"content": "llo"}}]},
            {"choices": [{"delta": {}}]},
        ]
    )
    p = OpenAIProvider("gpt-x", api_key="k", transport=t)
    assert list(p.stream_message("q")) == ["he", "llo"]


def test_openai_list_models_requires_key_for_openai_dot_com(monkeypatch, caplog):
    monkeypatch.delenv("OPENAI_API_KEY", raising=False)
    monkeypatch.delenv("OPENAI_BASE_URL", raising=False)
    p = OpenAIProvider("gpt-x", transport=FakeTransport(get={"data": [{"id": "m"}]}))
    assert p.list_models() == []
    # but a self-hosted compatible endpoint lists fine without a key
    p2 = OpenAIProvider(
        "gpt-x",
        base_url="http://localhost:8000/v1",
        transport=FakeTransport(get={"data": [{"id": "m"}]}),
    )
    assert p2.list_models() == ["m"]


def test_openai_list_models_filters_exact_and_prefix():
    t = FakeTransport(
        get={
            "data": [
                {"id": "gpt-4o"},
                {"id": "whisper-1"},  # exact blocklist
                {"id": "o1-mini"},  # prefix blocklist
                {"id": "codex-mini-latest"},  # prefix blocklist
                {"id": "a-chat-model"},
            ]
        }
    )
    p = OpenAIProvider("gpt-x", api_key="k", transport=t)
    assert p.list_models() == ["a-chat-model", "gpt-4o"]


# ---------------------------------------------------------------- google


def test_google_requires_api_key(monkeypatch):
    monkeypatch.delenv("GOOGLE_API_KEY", raising=False)
    with pytest.raises(ValueError):
        GoogleProvider("gemini-x", transport=FakeTransport())


def test_google_history_remaps_roles_and_wraps_parts():
    t = FakeTransport(
        post={"candidates": [{"content": {"parts": [{"text": "ok"}]}}]}
    )
    p = GoogleProvider("gemini-x", api_key="k", transport=t)
    out = p.send_message(
        "q",
        history=[
            {"role": "assistant", "content": "prev"},
            {"role": "user", "content": ""},  # empty content dropped
            {"role": "user", "content": "u"},
        ],
    )
    assert out == "ok"
    _, url, payload, headers = t.requests[-1]
    assert url.endswith("models/gemini-x:generateContent")
    assert headers == {"x-goog-api-key": "k"}
    assert payload["contents"] == [
        {"role": "model", "parts": [{"text": "prev"}]},
        {"role": "user", "parts": [{"text": "u"}]},
        {"role": "user", "parts": [{"text": "q"}]},
    ]


def test_google_blocked_prompt_and_abnormal_finish():
    blocked = FakeTransport(post={"promptFeedback": {"blockReason": "SAFETY"}})
    p = GoogleProvider("gemini-x", api_key="k", transport=blocked)
    assert p.send_message("q") == "Error: Prompt blocked by Google. Reason: SAFETY."

    stopped = FakeTransport(post={"candidates": [{"finishReason": "RECITATION"}]})
    p2 = GoogleProvider("gemini-x", api_key="k", transport=stopped)
    assert p2.send_message("q") == "Error: Response generation stopped. Reason: RECITATION."

    # MAX_TOKENS is a normal finish: empty text but no error
    ok = FakeTransport(post={"candidates": [{"finishReason": "MAX_TOKENS"}]})
    p3 = GoogleProvider("gemini-x", api_key="k", transport=ok)
    assert p3.send_message("q") == ""


def test_google_stream_stops_on_safety():
    t = FakeTransport(
        stream=[
            {"candidates": [{"content": {"parts": [{"text": "a"}]}}]},
            {"candidates": [{"content": {"parts": [{"text": "b"}]}, "finishReason": "SAFETY"}]},
            {"candidates": [{"content": {"parts": [{"text": "never"}]}}]},
        ]
    )
    p = GoogleProvider("gemini-x", api_key="k", transport=t)
    assert list(p.stream_message("q")) == [
        "a",
        "b",
        "Error: Streaming stopped due to safety filters.",
    ]


def test_google_list_models_filters_and_sorts():
    t = FakeTransport(
        get={
            "models": [
                {"name": "models/gemini-2.0-pro", "supportedGenerationMethods": ["generateContent"]},
                {"name": "models/embedding-001", "supportedGenerationMethods": ["embedContent"]},
                {"name": "models/aqa", "supportedGenerationMethods": ["generateContent"]},
                {"name": "models/gemini-x-preview", "supportedGenerationMethods": ["generateContent"]},
                {"name": "models/a-model", "supportedGenerationMethods": ["generateContent"]},
            ]
        }
    )
    p = GoogleProvider("gemini-x", api_key="k", transport=t)
    assert p.list_models() == ["models/a-model", "models/gemini-2.0-pro"]


# ---------------------------------------------------------------- factory


def test_guess_provider_truth_table():
    from mongo_analyser_spark.llm.factory import guess_provider

    assert guess_provider("gpt-4o") == "openai"
    assert guess_provider("openai/gpt-4.1") == "openai"
    assert guess_provider("gemini-2.0-flash") == "google"
    assert guess_provider("models/gemini-2.0-pro") == "google"
    assert guess_provider("ollama/llama3") == "ollama"
    assert guess_provider("claude-sonnet") == "anthropic"
    assert guess_provider("anthropic/claude") == "anthropic"
    assert guess_provider("mistral/mixtral-8x7b") == "mistral"
    assert guess_provider("open-mistral-7b") == "mistral"
    # bare 'mixtral' lacks the 'mistral' substring the gate requires —
    # unresolvable in the reference too (wrapper.py:115-121)
    assert guess_provider("mixtral-8x7b") is None
    assert guess_provider("azure/my-deployment") == "azure"
    # 'gpt-4' wins before the azure/ check — reference quirk preserved
    # (wrapper.py:107 runs before :122)
    assert guess_provider("azure/gpt-4") == "openai"
    assert guess_provider("some-local-model") is None


def test_qualify_model_name():
    from mongo_analyser_spark.llm.factory import qualify_model_name

    assert qualify_model_name("llama3", "ollama") == "ollama/llama3"
    assert qualify_model_name("ollama/llama3", "ollama") == "ollama/llama3"
    assert qualify_model_name("gemini-2.0-flash", "google") == "gemini/gemini-2.0-flash"
    assert qualify_model_name("models/gemini-x", "google") == "models/gemini-x"
    assert qualify_model_name("gpt-4o", "openai") == "gpt-4o"


def test_is_model_blocked_tolerates_invalid_regex(caplog):
    from mongo_analyser_spark.llm.factory import is_model_blocked, valid_patterns

    # the openai list ships one invalid pattern ('*-embedding-.*'):
    # matching must not raise and valid patterns still apply
    assert is_model_blocked("whisper-1", "openai") is True
    assert is_model_blocked("gpt-4o", "openai") is False
    assert is_model_blocked("nomic-embed-text", "ollama") is True
    assert is_model_blocked("anything", None) is False
    assert "*-embedding-.*" not in valid_patterns("openai")
    assert r"tts-.*" in valid_patterns("openai")


def test_valid_patterns_safe_for_engine_filter(spark):
    """The sanitized pattern list must run through the DataFrame-side
    blocklist filter without throwing."""
    from mongo_analyser_spark.llm.blocklist import filter_blocklisted
    from mongo_analyser_spark.llm.factory import valid_patterns

    df = spark.createDataFrame(
        [("gpt-4o",), ("whisper-1",), ("text-embedding-3-small",)], "name string"
    )
    out = filter_blocklisted(df, patterns=valid_patterns("openai"))
    assert [r.name for r in out.collect()] == ["gpt-4o"]


def test_make_provider_from_config(tmp_path):
    from mongo_analyser_spark.config import ConfigManager
    from mongo_analyser_spark.llm.factory import make_provider
    from mongo_analyser_spark.llm.provider import EchoProvider
    from mongo_analyser_spark.llm.providers import OllamaProvider, OpenAIProvider

    cm = ConfigManager(base_app_data_dir_override=tmp_path / "app")
    assert isinstance(make_provider(cm, transport=FakeTransport()), OllamaProvider)

    cm.update_setting("llm_default_provider", "openai")
    p = make_provider(cm, transport=FakeTransport(), api_key="k")
    assert isinstance(p, OpenAIProvider)
    assert p.model_name == "gpt-4.1-nano"  # config default model
    assert p.completion_kwargs["temperature"] == 0.7

    cm.update_setting("llm_default_provider", "echo")
    assert isinstance(make_provider(cm), EchoProvider)

    import pytest as _pytest

    with _pytest.raises(ValueError):
        make_provider(cm, provider="not-real")


def test_make_provider_google_applies_config_temperature(tmp_path):
    """Round-2 advice: the configured default temperature must reach the
    google provider's generation_config (it silently no-opped before)."""
    from mongo_analyser_spark.config import ConfigManager
    from mongo_analyser_spark.llm.factory import make_provider

    cm = ConfigManager(base_app_data_dir_override=tmp_path / "app")
    cm.update_setting("llm_default_provider", "google")
    cm.update_setting("llm_default_temperature", 0.25)
    p = make_provider(cm, transport=FakeTransport(), api_key="k")
    assert p.generation_config["temperature"] == 0.25
    # caller-supplied generation_config wins on key conflicts
    p2 = make_provider(
        cm, transport=FakeTransport(), api_key="k",
        generation_config={"temperature": 0.9, "topK": 4},
    )
    assert p2.generation_config == {"temperature": 0.9, "topK": 4}
