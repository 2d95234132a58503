"""Concrete LLM chat providers (SURVEY §2.11 L4): Ollama, OpenAI-compatible
and Google Generative Language clients behind the ChatProvider ABC.

Reference parity (mongo_analyser/llm_chat/ollama.py:16-194, openai.py:74-238,
google.py:75-281) — same observable behavior, different construction: the
reference wraps each vendor SDK; here every provider speaks its vendor's
PUBLIC REST API through a constructor-injected ``Transport``, so the
providers are unit-testable offline with a fake transport (this container
has no network and no vendor SDKs) and run live when handed the default
urllib transport.

Shared behavioral contract carried over from the reference:
* ``send_message`` returns (never raises) — transport/API failures come
  back as ``"Error: ..."`` strings (ollama.py:105-110, openai.py:159-164,
  google.py:194-198);
* ``stream_message`` yields chunks and yields a final ``"Error: ..."``
  string on failure (ollama.py:133-142, openai.py:189-194);
* ``list_models`` returns a sorted, blocklist-filtered list and ``[]`` on
  any failure (ollama.py:144-194, openai.py:196-238, google.py:242-281);
* history roles are canonicalized before sending ('ai' → 'assistant';
  Google remaps 'assistant' → 'model' and wraps content in parts).
"""

from __future__ import annotations

import json
import logging
import os
import urllib.error
import urllib.request
from collections.abc import Iterator

from mongo_analyser_spark.llm.provider import ChatProvider, format_history

logger = logging.getLogger(__name__)

# ---------------------------------------------------------------------------
# Model blocklists: provider listings hide non-chat / retired models.
# Exact names + prefix/suffix patterns, applied like the reference
# (ollama.py:10-13, openai.py:11-71 + "codex-/o1-/o3-/o4-" prefixes
# (openai.py:224), google.py:17-72). The lists are policy DATA — a user can
# replace them; filter_blocklisted in llm/blocklist.py applies the same
# policy engine-side to DataFrames of model names.
# ---------------------------------------------------------------------------

OLLAMA_MODEL_BLOCKLIST = [
    "granite-embedding:latest",
    "nomic-embed-text:latest",
]

OPENAI_MODEL_BLOCKLIST = [
    "babbage-002",
    "dall-e-2",
    "dall-e-3",
    "davinci-002",
    "gpt-3.5-turbo-instruct-0914",
    "text-embedding-3-large",
    "text-embedding-3-small",
    "text-embedding-ada-002",
    "tts-1",
    "tts-1-hd",
    "whisper-1",
    "omni-moderation-latest",
    "gpt-image-1",
]

OPENAI_MODEL_PREFIX_BLOCKLIST = ["codex-", "o1-", "o3-", "o4-"]

GOOGLE_MODEL_BLOCKLIST = [
    "models/text-bison-001",
    "models/chat-bison-001",
    "models/embedding-gecko-001",
    "models/embedding-001",
    "models/aqa",
]

GOOGLE_MODEL_SUFFIX_BLOCKLIST = [
    "-exp",
    "-preview",
    "-tuning",
    "-thinking",
    "-tts",
    "-experimental",
]


# ---------------------------------------------------------------------------
# Transport: the injectable seam between provider logic and the network.
# ---------------------------------------------------------------------------


class UrllibTransport:
    """Stdlib HTTP-JSON transport (no third-party dependency). Streaming
    responses are parsed per line: SSE ``data: {...}`` frames (OpenAI,
    Google ``alt=sse``) and NDJSON (Ollama) both reduce to one JSON object
    per yielded event; SSE ``[DONE]`` sentinels are swallowed."""

    def get_json(self, url: str, headers: dict | None = None, timeout: float = 30.0) -> dict:
        req = urllib.request.Request(url, headers=headers or {})
        with urllib.request.urlopen(req, timeout=timeout) as resp:
            return json.loads(resp.read().decode("utf-8"))

    def post_json(
        self, url: str, payload: dict, headers: dict | None = None, timeout: float = 30.0
    ) -> dict:
        body = json.dumps(payload).encode("utf-8")
        req = urllib.request.Request(
            url, data=body, headers={"Content-Type": "application/json", **(headers or {})}
        )
        with urllib.request.urlopen(req, timeout=timeout) as resp:
            return json.loads(resp.read().decode("utf-8"))

    def post_stream(
        self, url: str, payload: dict, headers: dict | None = None, timeout: float = 30.0
    ) -> Iterator[dict]:
        body = json.dumps(payload).encode("utf-8")
        req = urllib.request.Request(
            url, data=body, headers={"Content-Type": "application/json", **(headers or {})}
        )
        with urllib.request.urlopen(req, timeout=timeout) as resp:
            for raw in resp:
                line = raw.decode("utf-8").strip()
                if not line:
                    continue
                if line.startswith("data:"):
                    line = line[len("data:"):].strip()
                    if line == "[DONE]":
                        break
                yield json.loads(line)


class ProviderError(Exception):
    """Transport/API failure a provider converts into an Error: string."""


class OllamaProvider(ChatProvider):
    """Ollama REST client (POST /api/chat, GET /api/tags).

    Reference parity (llm_chat/ollama.py): non-dict ``options`` resets to
    {} with a warning (:21-27); per-call options = constructor options
    overlaid with config options then config temperature (:71-81);
    ``keep_alive`` defaults '5m' (:29); init pings the model listing and
    raises ConnectionError when unreachable (:57-69)."""

    def __init__(
        self,
        model_name: str,
        host: str = "http://localhost:11434",
        timeout: float = 60.0,
        transport=None,
        options: dict | None = None,
        keep_alive: str = "5m",
        **config,
    ):
        if options is not None and not isinstance(options, dict):
            logger.warning("invalid 'options' (%s) — resetting to {}", type(options))
            options = None
        self.model_name = model_name
        self.host = host.rstrip("/")
        self.timeout = timeout
        self.transport = transport or UrllibTransport()
        self.options = dict(options or {})
        self.keep_alive = keep_alive
        self.config = config
        try:
            self.transport.get_json(f"{self.host}/api/tags", timeout=self.timeout)
        except Exception as e:
            raise ConnectionError(f"Failed to connect to Ollama at {self.host}: {e}") from e

    def _effective_options(self) -> dict:
        opts = dict(self.options)
        if isinstance(self.config.get("options"), dict):
            opts.update(self.config["options"])
        if self.config.get("temperature") is not None:
            opts["temperature"] = self.config["temperature"]
        return opts

    def _payload(self, message: str, history: list[dict] | None, stream: bool) -> dict:
        messages = format_history(history or []) + [{"role": "user", "content": message}]
        payload = {
            "model": self.model_name,
            "messages": messages,
            "stream": stream,
            "keep_alive": self.config.get("keep_alive", self.keep_alive),
        }
        opts = self._effective_options()
        if opts:
            payload["options"] = opts
        return payload

    def send_message(self, message: str, history: list[dict] | None = None) -> str:
        try:
            resp = self.transport.post_json(
                f"{self.host}/api/chat",
                self._payload(message, history, stream=False),
                timeout=self.timeout,
            )
            return resp.get("message", {}).get("content", "")
        except Exception as e:
            logger.error("Ollama send_message failed: %s", e)
            return f"Error: Could not get response from Ollama. {e.__class__.__name__}: {e}"

    def stream_message(self, message: str, history: list[dict] | None = None) -> Iterator[str]:
        try:
            for event in self.transport.post_stream(
                f"{self.host}/api/chat",
                self._payload(message, history, stream=True),
                timeout=self.timeout,
            ):
                if event.get("done", False):
                    break
                chunk = event.get("message", {}).get("content", "")
                if chunk:
                    yield chunk
        except Exception as e:
            logger.error("Ollama stream_message failed: %s", e)
            yield f"Error: Could not stream response. {e.__class__.__name__}: {e}"

    def list_models(self) -> list[str]:
        try:
            data = self.transport.get_json(f"{self.host}/api/tags", timeout=self.timeout)
            names = {
                info.get("model") or info.get("name")
                for info in data.get("models", [])
                if info.get("model") or info.get("name")
            }
            return [n for n in sorted(names) if n not in OLLAMA_MODEL_BLOCKLIST]
        except Exception as e:
            logger.error("Ollama list_models failed: %s", e)
            return []


class OpenAIProvider(ChatProvider):
    """OpenAI-compatible chat-completions client (POST /chat/completions,
    GET /models) — also fronts any compatible server via ``base_url``.

    Reference parity (llm_chat/openai.py): key from arg or OPENAI_API_KEY,
    base_url from arg or OPENAI_BASE_URL (:84-85); missing key only warns
    (a non-OpenAI base_url may not need one, :92-98); extra constructor
    kwargs pass through as completion params (:139-152); responses are
    ``.strip()``-ed (:158); list_models returns [] without a key when
    targeting api.openai.com (:210-212) and filters exact + prefix
    blocklists (:219-226)."""

    DEFAULT_BASE_URL = "https://api.openai.com/v1"

    def __init__(
        self,
        model_name: str,
        api_key: str | None = None,
        base_url: str | None = None,
        timeout: float = 30.0,
        transport=None,
        **completion_kwargs,
    ):
        self.model_name = model_name
        self.api_key = api_key or os.getenv("OPENAI_API_KEY")
        self.base_url = (base_url or os.getenv("OPENAI_BASE_URL") or self.DEFAULT_BASE_URL).rstrip("/")
        self.timeout = timeout
        self.transport = transport or UrllibTransport()
        self.completion_kwargs = completion_kwargs
        if not self.api_key and "api.openai.com" in self.base_url:
            logger.warning("OpenAI API key not provided; calls to api.openai.com will fail.")

    def _headers(self) -> dict:
        return {"Authorization": f"Bearer {self.api_key}"} if self.api_key else {}

    def _payload(self, message: str, history: list[dict] | None, stream: bool) -> dict:
        messages = format_history(history or []) + [{"role": "user", "content": message}]
        return {
            "model": self.model_name,
            "messages": messages,
            "stream": stream,
            **self.completion_kwargs,
        }

    def send_message(self, message: str, history: list[dict] | None = None) -> str:
        try:
            resp = self.transport.post_json(
                f"{self.base_url}/chat/completions",
                self._payload(message, history, stream=False),
                headers=self._headers(),
                timeout=self.timeout,
            )
            choices = resp.get("choices") or []
            content = (choices[0].get("message") or {}).get("content") if choices else None
            return (content or "").strip()
        except Exception as e:
            logger.error("OpenAI send_message failed: %s", e)
            return f"Error: Could not get response. {e.__class__.__name__}"

    def stream_message(self, message: str, history: list[dict] | None = None) -> Iterator[str]:
        try:
            for event in self.transport.post_stream(
                f"{self.base_url}/chat/completions",
                self._payload(message, history, stream=True),
                headers=self._headers(),
                timeout=self.timeout,
            ):
                choices = event.get("choices") or []
                delta = (choices[0].get("delta") or {}) if choices else {}
                if delta.get("content") is not None:
                    yield delta["content"]
        except Exception as e:
            logger.error("OpenAI stream_message failed: %s", e)
            yield f"Error: Could not stream response. {e.__class__.__name__}"

    def list_models(self) -> list[str]:
        if not self.api_key and "api.openai.com" in self.base_url:
            logger.warning("Cannot list OpenAI models from api.openai.com without API key.")
            return []
        try:
            resp = self.transport.get_json(
                f"{self.base_url}/models", headers=self._headers(), timeout=self.timeout
            )
            ids = sorted(m["id"] for m in resp.get("data", []) if m.get("id"))
            return [
                mid
                for mid in ids
                if mid not in OPENAI_MODEL_BLOCKLIST
                and not any(p in mid for p in OPENAI_MODEL_PREFIX_BLOCKLIST)
            ]
        except Exception as e:
            logger.error("OpenAI list_models failed: %s", e)
            return []


class GoogleProvider(ChatProvider):
    """Google Generative Language REST client
    (POST models/{m}:generateContent / :streamGenerateContent?alt=sse,
    GET /models).

    Reference parity (llm_chat/google.py): a missing key raises ValueError
    (:78-82); history remaps 'assistant' → 'model' and wraps text in
    ``parts``, dropping empty-content messages (:147-157); a blocked
    prompt or abnormal finish reason becomes an ``Error:`` string
    (:171-192); streaming stops after a safety block (:224-237);
    list_models keeps only generateContent-capable models, filters exact
    + suffix blocklists, sorted (:253-272). REST uses camelCase keys
    (promptFeedback/blockReason/finishReason/supportedGenerationMethods)
    where the reference's SDK used snake_case."""

    DEFAULT_BASE_URL = "https://generativelanguage.googleapis.com/v1beta"
    _NORMAL_FINISH = {"STOP", "UNSPECIFIED", "FINISH_REASON_UNSPECIFIED", "MAX_TOKENS"}

    def __init__(
        self,
        model_name: str,
        api_key: str | None = None,
        base_url: str | None = None,
        timeout: float = 30.0,
        transport=None,
        generation_config: dict | None = None,
        safety_settings: list[dict] | None = None,
    ):
        self.api_key = api_key or os.getenv("GOOGLE_API_KEY")
        if not self.api_key:
            raise ValueError("Google API key is required for GoogleProvider.")
        self.model_name = model_name if model_name.startswith("models/") else f"models/{model_name}"
        self.base_url = (base_url or self.DEFAULT_BASE_URL).rstrip("/")
        self.timeout = timeout
        self.transport = transport or UrllibTransport()
        self.generation_config = generation_config
        self.safety_settings = safety_settings

    def _headers(self) -> dict:
        return {"x-goog-api-key": self.api_key}

    def format_history(self, history: list[dict]) -> list[dict]:
        out = []
        for m in history or []:
            content = m.get("content")
            if not content:
                continue
            role = "model" if m.get("role") in ("assistant", "ai", "model") else "user"
            out.append({"role": role, "parts": [{"text": content}]})
        return out

    def _payload(self, message: str, history: list[dict] | None) -> dict:
        contents = self.format_history(history or []) + [
            {"role": "user", "parts": [{"text": message}]}
        ]
        payload: dict = {"contents": contents}
        if self.generation_config:
            payload["generationConfig"] = self.generation_config
        if self.safety_settings:
            payload["safetySettings"] = self.safety_settings
        return payload

    @staticmethod
    def _candidate_text(resp: dict) -> str:
        cands = resp.get("candidates") or []
        parts = ((cands[0].get("content") or {}).get("parts") or []) if cands else []
        return "".join(p.get("text", "") for p in parts)

    @staticmethod
    def _block_reason(resp: dict) -> str | None:
        return (resp.get("promptFeedback") or {}).get("blockReason")

    @classmethod
    def _finish_reason(cls, resp: dict) -> str | None:
        cands = resp.get("candidates") or []
        return cands[0].get("finishReason") if cands else None

    def send_message(self, message: str, history: list[dict] | None = None) -> str:
        try:
            resp = self.transport.post_json(
                f"{self.base_url}/{self.model_name}:generateContent",
                self._payload(message, history),
                headers=self._headers(),
                timeout=self.timeout,
            )
            text = self._candidate_text(resp)
            if not text:
                block = self._block_reason(resp)
                if block:
                    return f"Error: Prompt blocked by Google. Reason: {block}."
                finish = self._finish_reason(resp)
                if finish and finish not in self._NORMAL_FINISH:
                    return f"Error: Response generation stopped. Reason: {finish}."
            return text
        except Exception as e:
            logger.error("Google send_message failed: %s", e)
            return f"Error: Could not get response from Google AI. {e.__class__.__name__}: {e}"

    def stream_message(self, message: str, history: list[dict] | None = None) -> Iterator[str]:
        try:
            for event in self.transport.post_stream(
                f"{self.base_url}/{self.model_name}:streamGenerateContent?alt=sse",
                self._payload(message, history),
                headers=self._headers(),
                timeout=self.timeout,
            ):
                block = self._block_reason(event)
                if block:
                    yield f"Error: Prompt blocked by Google. Reason: {block}."
                    return
                text = self._candidate_text(event)
                if text:
                    yield text
                finish = self._finish_reason(event)
                if finish == "SAFETY":
                    yield "Error: Streaming stopped due to safety filters."
                    return
        except Exception as e:
            logger.error("Google stream_message failed: %s", e)
            yield f"Error: Could not stream response. {e.__class__.__name__}: {e}"

    def list_models(self) -> list[str]:
        try:
            resp = self.transport.get_json(
                f"{self.base_url}/models", headers=self._headers(), timeout=self.timeout
            )
            names = [
                m["name"]
                for m in resp.get("models", [])
                if m.get("name")
                and "generateContent" in (m.get("supportedGenerationMethods") or [])
            ]
            return sorted(
                n
                for n in names
                if n not in GOOGLE_MODEL_BLOCKLIST
                and not any(s in n for s in GOOGLE_MODEL_SUFFIX_BLOCKLIST)
            )
        except Exception as e:
            logger.error("Google list_models failed: %s", e)
            return []
