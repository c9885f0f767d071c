"""Generation backends: the seam where trajectories meet the model.

Equivalent of the reference's ``query_server`` boundary
(state_machine.py:226-248), redesigned as an awaitable interface so hundreds
of trajectory tasks multiplex onto one serving engine instead of blocking
worker processes on HTTP calls:

* MockGenerator   — deterministic, no model, no hardware: emits a working
                    ModelNew derived from the architecture embedded in the
                    prompt, with scriptable per-turn failures.  First-class
                    version of the reference scripts' mock=True flag
                    (SURVEY.md §4.2).
* HttpGenerator   — OpenAI-compatible HTTP endpoint (the reference's
                    sglang/server_type path); stdlib urllib, no SDK.
* EngineGenerator — the in-house TPU serving engine (caesar_tpu.engine),
                    wired in engine/service.py.

All backends return (text, token_usage) with reference-shaped usage dicts
({"prompt_tokens": ..., "completion_tokens": ...}) so the journal and viewer
account tokens identically (reference turn_info.py:10, viewer.py:62-82).
"""

from __future__ import annotations

import asyncio
import dataclasses
import json
import re
import urllib.request
from typing import Optional, Protocol


@dataclasses.dataclass
class GenerateRequest:
    prompt: str
    temperature: float = 0.0
    top_p: float = 1.0
    top_k: int = 50
    max_tokens: int = 4096
    #: suppress EOS until this many tokens are generated (0 disables)
    min_tokens: int = 1
    #: reasoning-model effort hint, forwarded to HTTP providers and mapped
    #: to an EOS-deferral budget by the in-house engine (reference
    #: query_server contract, state_machine.py:238-241)
    reasoning_effort: str = ""
    seed: int = 0
    #: stable id of the requesting trajectory — lets the engine route
    #: cross-turn prefix reuse per problem/sample
    trajectory_id: str = ""


@dataclasses.dataclass
class GenerateResult:
    text: str
    token_usage: dict


class Generator(Protocol):
    async def generate(self, request: GenerateRequest) -> GenerateResult: ...

    async def close(self) -> None: ...


# ----------------------------------------------------------------------
# Mock backend
# ----------------------------------------------------------------------

_ARCH_BLOCK_RE = re.compile(
    r"architecture you must optimize:\s*```python\n(.*?)```",
    re.DOTALL,
)

#: behaviors a mock script can request for a turn
_MOCK_BEHAVIORS = ("ok", "fail_generate", "fail_compile", "fail_correctness")


class MockGenerator:
    """Deterministic canned-kernel generator.

    Emits a ModelNew that subclasses the Model parsed out of the prompt's
    kernel-to-optimize block — which compiles and passes value parity under
    the real JAX eval backend, so mock generation composes with real eval
    for integration tests.  A per-turn `script` forces failure modes:

        MockGenerator(script=["fail_compile", "fail_correctness", "ok"])

    Turn indices beyond the script behave as "ok".
    """

    def __init__(self, script: Optional[list] = None, latency_s: float = 0.0):
        self.script = list(script or [])
        self.latency_s = latency_s
        self._turn_by_trajectory: dict = {}

    async def generate(self, request: GenerateRequest) -> GenerateResult:
        if self.latency_s:
            await asyncio.sleep(self.latency_s)

        turn = self._turn_by_trajectory.get(request.trajectory_id, 0)
        self._turn_by_trajectory[request.trajectory_id] = turn + 1
        behavior = self.script[turn] if turn < len(self.script) else "ok"
        if behavior not in _MOCK_BEHAVIORS:
            raise ValueError(f"Unknown mock behavior {behavior!r}")

        usage = {
            "prompt_tokens": max(1, len(request.prompt) // 4),
            "completion_tokens": 128,
        }

        if behavior == "fail_generate":
            return GenerateResult("I cannot produce code right now.", usage)

        arch = _ARCH_BLOCK_RE.search(request.prompt)
        arch_src = arch.group(1) if arch else "class Model:\n    pass\n"

        if behavior == "fail_compile":
            body = "class ModelNew(\n"  # syntax error
        elif behavior == "fail_correctness":
            body = (
                arch_src
                + "\n\nclass ModelNew(Model):\n"
                + "    # MOCK_FAIL_CORRECTNESS\n"
                + "    def __call__(self, *args):\n"
                + "        return super().__call__(*args) * 1.5\n"
            )
        else:
            body = (
                arch_src
                + "\n\nclass ModelNew(Model):\n"
                + f"    # mock solution, turn {turn + 1}\n"
                + "    pass\n"
            )

        text = (
            f"Looking at the architecture, here is an optimized version "
            f"(turn {turn + 1}).\n\n```python\n{body}\n```\n"
        )
        return GenerateResult(text, usage)

    async def close(self) -> None:
        return None


# ----------------------------------------------------------------------
# HTTP backend (OpenAI-compatible completions API)
# ----------------------------------------------------------------------


class HttpGenerator:
    """Minimal OpenAI-compatible chat-completions client over stdlib urllib.

    Plays the reference's remote-provider role (server_type sglang/...,
    caesar_config.py:73-96) without vendor SDKs.  Requests run in a thread
    so the event loop never blocks.
    """

    def __init__(
        self,
        address: str,
        port: Optional[int],
        model_name: str,
        timeout: float = 600.0,
        api: str = "chat",
    ):
        """api="chat" wraps the prompt in a chat message (external
        providers); api="completions" sends the raw prompt byte-for-byte —
        required when the endpoint is a peer host's own engine server and
        outputs must match a local engine's (multi-host dp routing)."""
        host = address if "://" in address else f"http://{address}"
        if port:
            host = f"{host}:{port}"
        if api not in ("chat", "completions"):
            raise ValueError(f"Bad api {api!r}")
        self.api = api
        path = "chat/completions" if api == "chat" else "completions"
        self.url = f"{host}/v1/{path}"
        self.model_name = model_name
        self.timeout = timeout

    def _post(self, payload: dict) -> dict:
        body = json.dumps(payload).encode()
        req = urllib.request.Request(
            self.url, data=body, headers={"Content-Type": "application/json"}
        )
        with urllib.request.urlopen(req, timeout=self.timeout) as resp:
            return json.load(resp)

    async def generate(self, request: GenerateRequest) -> GenerateResult:
        payload = {
            "model": self.model_name,
            "temperature": request.temperature,
            "top_p": request.top_p,
            "top_k": request.top_k,
            "seed": request.seed,
            "max_tokens": request.max_tokens,
        }
        if self.api == "chat":
            payload["messages"] = [
                {"role": "user", "content": request.prompt}
            ]
        else:
            payload["prompt"] = request.prompt
        if request.min_tokens > 1:
            payload["min_tokens"] = request.min_tokens  # sglang extension
        if request.reasoning_effort:
            payload["reasoning_effort"] = request.reasoning_effort
        if request.trajectory_id:
            # peers route prefix-cache locality by trajectory, like we do
            payload["user"] = request.trajectory_id
        data = await asyncio.to_thread(self._post, payload)
        choice = data["choices"][0]
        text = (
            choice["message"]["content"]
            if self.api == "chat"
            else choice["text"]
        )
        usage = data.get("usage", {})
        return GenerateResult(text, usage)

    async def close(self) -> None:
        return None


# ----------------------------------------------------------------------


def make_generator(config) -> Generator:
    """Build the configured generation backend (engine wiring lives in
    caesar_tpu.engine.service to keep heavy imports off the mock path)."""
    if config.backend == "mock":
        return MockGenerator()
    if config.backend == "http":
        return HttpGenerator(
            config.server_address or "localhost",
            config.server_port,
            config.model_name,
            timeout=config.timeout,
        )
    if config.backend == "engine":
        from caesar_tpu.engine.service import EngineGenerator

        return EngineGenerator.from_config(config)
    raise KeyError(f"Unknown generation backend {config.backend!r}")
