"""LLM provider abstraction (SURVEY §2.11 L4): the reference's chat ABC
(mongo_analyser/llm_chat/base.py:8-47 — send_message / stream_message /
list_models / format_history) kept as the engine-independent seam. The
network provider implementations (ollama/openai/google/litellm) are out
of the analytics engine's scope; plug any client in by subclassing.

Role normalization (F13): history roles are canonicalized 'ai' →
'assistant' (base.py:35-47); Google-style providers remap 'assistant' →
'model' (google.py:147-157)."""

from __future__ import annotations

from abc import ABC, abstractmethod
from collections.abc import Iterator

#: canonical role mapping (base.py:35-47)
_CANONICAL_ROLES = {"ai": "assistant", "user": "user", "assistant": "assistant", "system": "system"}


def normalize_role(role: str, provider_style: str = "default") -> str:
    """'ai' → 'assistant'; Google-style providers use 'model' for the
    assistant side (google.py:147-157)."""
    canonical = _CANONICAL_ROLES.get(role, role)
    if provider_style == "google" and canonical == "assistant":
        return "model"
    return canonical


def format_history(
    history: list[dict], provider_style: str = "default"
) -> list[dict]:
    """Provider-ready history: roles normalized, only role+content kept.
    Malformed messages (missing/empty role or content) are SKIPPED, not
    forwarded — base.py:35-47 logs and drops them."""
    return [
        {"role": normalize_role(m["role"], provider_style), "content": m["content"]}
        for m in history
        if m.get("role") and m.get("content")
    ]


class ChatProvider(ABC):
    """The reference's provider contract, verbatim surface."""

    @abstractmethod
    def send_message(self, message: str, history: list[dict] | None = None) -> str: ...

    @abstractmethod
    def stream_message(
        self, message: str, history: list[dict] | None = None
    ) -> Iterator[str]: ...

    @abstractmethod
    def list_models(self) -> list[str]: ...

    def format_history(self, history: list[dict]) -> list[dict]:
        return format_history(history)


class EchoProvider(ChatProvider):
    """Offline stand-in (this container has no LLM endpoints): echoes the
    prompt; lets the context-assembly → provider pipeline be tested
    end-to-end without a network."""

    def send_message(self, message: str, history: list[dict] | None = None) -> str:
        return f"echo: {message}"

    def stream_message(
        self, message: str, history: list[dict] | None = None
    ) -> Iterator[str]:
        yield from f"echo: {message}".split(" ")

    def list_models(self) -> list[str]:
        return ["echo-1"]
