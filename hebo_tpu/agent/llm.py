"""LLM backends for the agent engine.

Parity: the reference wires external LLM endpoints; here the backend is a
plain ``str -> str`` callable.  Provided:
  * ``MockLLM`` — deterministic scripted/rule backend for tests and CI,
  * ``HFBackend`` — local HuggingFace transformers causal LM (the image
    ships ``transformers`` + torch-CPU); optional, constructed lazily.
"""

from __future__ import annotations

from typing import Callable, Dict, List, Optional, Sequence

__all__ = ["MockLLM", "HFBackend"]


class MockLLM:
    """Deterministic backend: either a FIFO script or a rule table of
    (substring → response)."""

    def __init__(
        self,
        script: Optional[Sequence[str]] = None,
        rules: Optional[Dict[str, str]] = None,
        default: str = "OK",
    ):
        self.script = list(script) if script else []
        self.rules = rules or {}
        self.default = default
        self.calls: List[str] = []

    def __call__(self, prompt: str) -> str:
        self.calls.append(prompt)
        if self.script:
            return self.script.pop(0)
        for key, resp in self.rules.items():
            if key in prompt:
                return resp
        return self.default


class HFBackend:
    """HuggingFace causal-LM backend (CPU torch)."""

    def __init__(self, model_name: str = "sshleifer/tiny-gpt2",
                 max_new_tokens: int = 48):
        self.model_name = model_name
        self.max_new_tokens = max_new_tokens
        self._pipe = None

    def _ensure(self):
        if self._pipe is None:
            from transformers import pipeline

            self._pipe = pipeline(
                "text-generation", model=self.model_name, device=-1
            )

    def __call__(self, prompt: str) -> str:
        self._ensure()
        out = self._pipe(
            prompt, max_new_tokens=self.max_new_tokens, do_sample=False,
            return_full_text=False,
        )
        return out[0]["generated_text"]
