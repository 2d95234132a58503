"""Universal catch-all chat provider (reference llm_chat/wrapper.py:84-396,
the LiteLLM-backed fourth provider path): accept ANY model string, guess
the provider from its shape, qualify the name the way a multi-provider
router expects, and route the completion to the engine's own REST
providers — same policy surface, no router dependency.

Parity map (reference wrapper.py):
* provider guessing + hint override        — :87-90, 105-125
* router-qualified model name              — :96-101
* config param handling with defaults
  (temperature 0.7, max_tokens 2048) and
  passthrough of unknown kwargs            — :128-141, 177-192
* system-prompt + history payload assembly — :148-161
* completion errors returned as
  'Error from LLM (raw): Class - msg'      — :215-221
* streaming error string twin              — :223-246
* static list_models with per-provider
  blocklist filtering, [] without provider — :247-396

The reference sets vendor env keys and calls ``litellm.completion``; this
engine speaks each vendor's REST API directly (llm/providers.py) through
an injectable transport, so the wrapper is pure routing + policy — the
part of wrapper.py that carries behavior a test can pin offline.
"""

from __future__ import annotations

import logging
from collections.abc import Iterator

from mongo_analyser_spark.llm.factory import (
    guess_provider,
    is_model_blocked,
    qualify_model_name,
)
from mongo_analyser_spark.llm.provider import ChatProvider

logger = logging.getLogger(__name__)

#: config keys consumed by the wrapper itself; anything else passes
#: through to the completion call (wrapper.py:177-192)
_KNOWN_CONFIG_KEYS = {
    "model_name",
    "provider_hint",
    "api_key",
    "base_url",
    "temperature",
    "max_tokens",
    "system_prompt",
    "max_history_messages",
}


class UniversalProvider(ChatProvider):
    """LiteLLM-style universal provider: model-string routing behind the
    same ChatProvider ABC + transport injection as the vendor providers."""

    def __init__(
        self,
        model_name: str,
        provider_hint: str | None = None,
        transport=None,
        **config,
    ):
        self.raw_model_name = model_name
        self.provider_hint = (
            provider_hint.lower() if provider_hint else guess_provider(model_name)
        )
        self.model_name = qualify_model_name(model_name, self.provider_hint)
        self.api_key = config.get("api_key")
        self.base_url = config.get("base_url")
        self.temperature = float(config.get("temperature", 0.7))
        self.max_tokens = int(config.get("max_tokens", 2048))
        self.system_prompt = config.get("system_prompt")
        self.extra_params = {
            k: v for k, v in config.items() if k not in _KNOWN_CONFIG_KEYS
        }
        self._transport = transport
        self._delegate = self._build_delegate()

    # -- routing ----------------------------------------------------------

    def _bare_model(self) -> str:
        """Vendor-facing name: the router prefix stripped back off."""
        name = self.model_name
        for prefix in ("ollama/", "gemini/"):
            if name.startswith(prefix):
                return name[len(prefix):]
        return name

    def _build_delegate(self) -> ChatProvider | None:
        from mongo_analyser_spark.llm.providers import (
            GoogleProvider,
            OllamaProvider,
            OpenAIProvider,
        )

        try:
            if self.provider_hint == "ollama":
                kwargs: dict = {"transport": self._transport}
                if self.base_url:
                    kwargs["host"] = self.base_url
                return OllamaProvider(
                    self._bare_model(),
                    options={"temperature": self.temperature,
                             "num_predict": self.max_tokens},
                    **kwargs,
                    **self.extra_params,
                )
            if self.provider_hint == "openai":
                return OpenAIProvider(
                    self._bare_model(),
                    api_key=self.api_key,
                    base_url=self.base_url,
                    transport=self._transport,
                    temperature=self.temperature,
                    max_tokens=self.max_tokens,
                    **self.extra_params,
                )
            if self.provider_hint == "google":
                return GoogleProvider(
                    self._bare_model(),
                    api_key=self.api_key,
                    base_url=self.base_url,
                    transport=self._transport,
                    generation_config={
                        "temperature": self.temperature,
                        "maxOutputTokens": self.max_tokens,
                        **self.extra_params,
                    },
                )
        except Exception as e:
            # constructor failures (e.g. missing API key) surface on
            # send_message as the reference's error string, not at build
            logger.error("delegate construction failed for %s: %s", self.model_name, e)
            self._delegate_error = e
            return None
        self._delegate_error = ValueError(
            f"no routable provider for model {self.raw_model_name!r} "
            f"(hint: {self.provider_hint})"
        )
        return None

    # -- payload ----------------------------------------------------------

    def _history_with_system(self, history: list[dict] | None) -> list[dict]:
        """wrapper.py:148-161: system prompt first, then history; the user
        message itself rides the delegate's ``message`` argument."""
        payload: list[dict] = []
        if self.system_prompt:
            payload.append({"role": "system", "content": self.system_prompt})
        if history:
            payload.extend(history)
        return payload

    # -- ChatProvider surface ---------------------------------------------

    def send_message(self, message: str, history: list[dict] | None = None) -> str:
        if self._delegate is None:
            e = self._delegate_error
            return (
                f"Error from LLM ({self.raw_model_name}): "
                f"{e.__class__.__name__} - {str(e)[:100]}"
            )
        try:
            return self._delegate.send_message(
                message, self._history_with_system(history)
            ).strip()
        except Exception as e:  # wrapper.py:215-221
            logger.error("completion error for %s: %s", self.model_name, e)
            return (
                f"Error from LLM ({self.raw_model_name}): "
                f"{e.__class__.__name__} - {str(e)[:100]}"
            )

    def stream_message(
        self, message: str, history: list[dict] | None = None
    ) -> Iterator[str]:
        if self._delegate is None:
            e = self._delegate_error
            yield (
                f"Error streaming from LLM ({self.raw_model_name}): "
                f"{e.__class__.__name__} - {str(e)[:100]}"
            )
            return
        try:
            yield from self._delegate.stream_message(
                message, self._history_with_system(history)
            )
        except Exception as e:  # wrapper.py:242-246
            logger.error("streaming error for %s: %s", self.model_name, e)
            yield (
                f"Error streaming from LLM ({self.raw_model_name}): "
                f"{e.__class__.__name__} - {str(e)[:100]}"
            )

    def list_models(self) -> list[str]:
        """Delegate listing filtered through the wrapper's own blocklist
        for the guessed provider (wrapper.py:284-295 applies the filter to
        both the fully-qualified and the base name)."""
        if self._delegate is None:
            return []
        out = []
        for name in self._delegate.list_models():
            base = name.split(":")[0]
            if not is_model_blocked(base, self.provider_hint) and not is_model_blocked(
                name, self.provider_hint
            ):
                out.append(base)
        return sorted(set(out))


def list_models_for(
    provider: str | None,
    transport=None,
    client_config: dict | None = None,
) -> list[str]:
    """Static listing entry point (wrapper.py:247-396): dynamic listing
    through the provider client when reachable, blocklist-filtered,
    deduped base names sorted; no provider → [] (wrapper.py:390-396)."""
    if not provider:
        logger.warning("list_models_for called without a provider")
        return []
    cfg = dict(client_config or {})
    probe = UniversalProvider(
        qualify_model_name(cfg.pop("model", "probe"), provider.lower()),
        provider_hint=provider,
        transport=transport,
        **cfg,
    )
    try:
        return probe.list_models()
    except Exception as e:
        logger.error("dynamic model listing failed for %s: %s", provider, e)
        return []
