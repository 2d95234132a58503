"""Provider selection & model-name policy (reference llm_chat/wrapper.py):
guess the provider from a model name, qualify the name the way the
multi-provider router expects, apply per-provider regex blocklists, and
construct the right ChatProvider from a ConfigManager.

The reference routes through LiteLLM (wrapper.py:84-396); this engine
already speaks each vendor's REST API directly (llm/providers.py), so the
wrapper's surviving value is its POLICY layer, ported here as data +
pure functions:
* provider guessing truth table (wrapper.py:105-125);
* model-name qualification — bare ollama/google names get their router
  prefix (wrapper.py:96-101);
* regex blocklists incl. tolerance of invalid patterns (wrapper.py:12-82 —
  the reference ships one invalid regex and skips it via re.error).
"""

from __future__ import annotations

import logging
import re

from mongo_analyser_spark.llm.provider import ChatProvider, EchoProvider

logger = logging.getLogger(__name__)

#: per-provider regex blocklists (wrapper.py:12-63) — policy DATA, applied
#: with unanchored case-insensitive re.search like the reference.
MODEL_BLOCKLIST_PATTERNS: dict[str, list[str]] = {
    "openai": [
        r"babbage.*",
        r"davinci.*",
        r"curie.*",
        r"ada.*",
        r"dall-e.*",
        r"text-embedding.*",
        r"*-embedding-.*",  # invalid regex, kept: must be skipped, not crash
        r"tts-.*",
        r"whisper-.*",
        r"gpt-3\.5-turbo-instruct.*",
        r"text-moderation-.*",
    ],
    "google": [
        r"models/embedding-.*",
        r"models/aqa",
        r".*-tts",
        r".*-transcribe",
        r".*-vision",
    ],
    "ollama": [
        r".*embed.*",
        r"all-minilm",
        r"bge-.*",
        r"e5-.*",
        r"sentence-transformers/.*",
        r"llava",
    ],
}


def is_model_blocked(model_name: str, provider: str | None) -> bool:
    """re.search each provider pattern, case-insensitive; invalid regexes
    log and are skipped (wrapper.py:66-82)."""
    for pattern in MODEL_BLOCKLIST_PATTERNS.get((provider or "").lower(), []):
        try:
            if re.search(pattern, model_name, re.IGNORECASE):
                return True
        except re.error as e:
            logger.warning("invalid blocklist regex %r: %s", pattern, e)
    return False


def valid_patterns(provider: str) -> list[str]:
    """The provider's blocklist with invalid regexes removed — safe to
    feed to the engine-side DataFrame filter (llm/blocklist.py rlike),
    which would otherwise throw on a malformed pattern."""
    out = []
    for pattern in MODEL_BLOCKLIST_PATTERNS.get(provider.lower(), []):
        try:
            re.compile(pattern)
            out.append(pattern)
        except re.error:
            continue
    return out


def guess_provider(model_name: str) -> str | None:
    """Provider from model-name shape (wrapper.py:105-125 truth table)."""
    m = model_name.lower()
    if m.startswith("gpt-") or "openai/" in m or "gpt-4" in m:
        return "openai"
    if "gemini" in m or "google/" in m or m.startswith("models/"):
        return "google"
    if m.startswith("ollama/"):
        return "ollama"
    if "claude" in m or "anthropic/" in m:
        return "anthropic"
    if "mistral" in m and ("mistral/" in m or "open-mistral" in m or "mixtral" in m):
        return "mistral"
    if "azure/" in m:
        return "azure"
    return None


def qualify_model_name(model_name: str, provider: str | None) -> str:
    """Router-qualified name: bare ollama names get 'ollama/', bare google
    names 'gemini/' (wrapper.py:96-101); everything else passes through."""
    if provider == "ollama" and not model_name.startswith("ollama/"):
        return f"ollama/{model_name}"
    if provider == "google" and not model_name.startswith("gemini/") and "/" not in model_name:
        return f"gemini/{model_name}"
    return model_name


def make_provider(config, transport=None, **overrides) -> ChatProvider:
    """Construct the configured ChatProvider from a ConfigManager (or any
    object with .get_setting): provider choice, per-provider default
    model, and temperature come from config; ``transport``/overrides are
    forwarded (tests inject a fake transport)."""
    from mongo_analyser_spark.llm.providers import (
        GoogleProvider,
        OllamaProvider,
        OpenAIProvider,
    )

    name = overrides.pop("provider", None) or config.get_setting("llm_default_provider")
    temperature = config.get_setting("llm_default_temperature")
    if name == "echo":
        return EchoProvider()
    if name == "ollama":
        model = overrides.pop("model", None) or config.get_setting("llm_default_model_ollama")
        return OllamaProvider(model, transport=transport, temperature=temperature, **overrides)
    if name == "openai":
        model = overrides.pop("model", None) or config.get_setting("llm_default_model_openai")
        return OpenAIProvider(model, transport=transport, temperature=temperature, **overrides)
    if name in ("litellm", "universal"):
        # the reference's fourth provider path (wrapper.py:84-396): any
        # model string, provider guessed from its shape unless hinted
        from mongo_analyser_spark.llm.wrapper import UniversalProvider

        model = overrides.pop("model", None)
        if not model:
            raise ValueError("universal provider needs an explicit model string")
        return UniversalProvider(
            model, transport=transport, temperature=temperature, **overrides
        )
    if name == "google":
        model = overrides.pop("model", None) or config.get_setting("llm_default_model_google")
        # temperature rides generation_config for the Gemini REST schema —
        # merged under any caller-supplied config (parity with the
        # reference wrapper, which applies temperature to every provider)
        gen_cfg = {"temperature": temperature, **(overrides.pop("generation_config", None) or {})}
        return GoogleProvider(model, transport=transport, generation_config=gen_cfg, **overrides)
    raise ValueError(f"unknown provider {name!r}")
