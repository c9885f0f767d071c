"""OpenAI-compatible HTTP server over the serving engine.

The in-house replacement for the reference's local-server option
(server_type=sglang, caesar_config.py:92-96): any OpenAI-style client —
including this repo's own HttpGenerator — can drive the TPU engine over
HTTP.  Stdlib http.server; requests submit to the engine's continuous batch
and block until their future resolves, so concurrency comes from the
engine's scheduler, not server threads.

Endpoints:
    POST /v1/completions        {"prompt": ..., "max_tokens": ..., ...}
    POST /v1/chat/completions   {"messages": [{"role","content"}, ...], ...}
    GET  /v1/models
    GET  /stats                 engine counters (tokens/s, prefix hit rate)

Run:  python -m caesar_tpu.engine.server engine.model=qwen2.5-coder-1.5b \
          engine.quant=bf16 --port 8000
"""

from __future__ import annotations

import json
import time
import uuid
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Optional

from caesar_tpu.engine.engine import Engine
from caesar_tpu.harness.generate import GenerateRequest


def _messages_to_prompt(messages) -> str:
    """Minimal chat templating (byte-tokenizer models have no chat template;
    checkpoint tokenizers may bring their own upstream)."""
    parts = []
    for m in messages:
        parts.append(f"<|{m.get('role', 'user')}|>\n{m.get('content', '')}")
    parts.append("<|assistant|>\n")
    return "\n".join(parts)


def make_handler(engine: Engine, model_name: str):
    class Handler(BaseHTTPRequestHandler):
        protocol_version = "HTTP/1.1"

        def _send(self, status: int, payload: dict) -> None:
            data = json.dumps(payload).encode()
            self.send_response(status)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(data)))
            self.end_headers()
            self.wfile.write(data)

        def do_GET(self):
            if self.path == "/v1/models":
                self._send(
                    200,
                    {
                        "object": "list",
                        "data": [
                            {"id": model_name, "object": "model",
                             "owned_by": "caesar-tpu"}
                        ],
                    },
                )
            elif self.path == "/stats":
                self._send(200, engine.stats.snapshot(engine.prefix_cache))
            else:
                self._send(404, {"error": "not found"})

        def do_POST(self):
            length = int(self.headers.get("Content-Length", 0))
            try:
                body = json.loads(self.rfile.read(length) or b"{}")
            except json.JSONDecodeError:
                self._send(400, {"error": "bad json"})
                return

            if self.path == "/v1/chat/completions":
                prompt = _messages_to_prompt(body.get("messages", []))
                chat = True
            elif self.path == "/v1/completions":
                prompt = body.get("prompt", "")
                chat = False
            else:
                self._send(404, {"error": "not found"})
                return

            request = GenerateRequest(
                prompt=prompt,
                temperature=float(body.get("temperature", 0.0)),
                top_p=float(body.get("top_p", 1.0)),
                top_k=int(body.get("top_k", 50)),
                max_tokens=int(body.get("max_tokens", 512)),
                min_tokens=int(body.get("min_tokens", 1)),
                seed=int(body.get("seed", 0)),
                trajectory_id=body.get("user", str(uuid.uuid4())),
            )
            try:
                result = engine.submit(request).result(timeout=3600)
            except Exception as e:
                self._send(500, {"error": repr(e)})
                return

            usage = {
                "prompt_tokens": result.token_usage.get("prompt_tokens", 0),
                "completion_tokens": result.token_usage.get(
                    "completion_tokens", 0
                ),
                "total_tokens": (
                    result.token_usage.get("prompt_tokens", 0)
                    + result.token_usage.get("completion_tokens", 0)
                ),
            }
            rid = f"cmpl-{uuid.uuid4().hex[:24]}"
            if chat:
                payload = {
                    "id": rid,
                    "object": "chat.completion",
                    "created": int(time.time()),
                    "model": model_name,
                    "choices": [
                        {
                            "index": 0,
                            "message": {
                                "role": "assistant",
                                "content": result.text,
                            },
                            "finish_reason": "stop",
                        }
                    ],
                    "usage": usage,
                }
            else:
                payload = {
                    "id": rid,
                    "object": "text_completion",
                    "created": int(time.time()),
                    "model": model_name,
                    "choices": [
                        {"index": 0, "text": result.text,
                         "finish_reason": "stop"}
                    ],
                    "usage": usage,
                }
            self._send(200, payload)

        def log_message(self, *args):
            pass

    return Handler


def serve(engine: Engine, port: int = 8000,
          model_name: Optional[str] = None) -> ThreadingHTTPServer:
    name = model_name or engine.econf.model
    server = ThreadingHTTPServer(("0.0.0.0", port), make_handler(engine, name))
    return server


def main(argv=None) -> None:
    import sys

    from caesar_tpu.config import RunConfig

    args = list(sys.argv[1:] if argv is None else argv)
    port = 8000
    if "--port" in args:
        i = args.index("--port")
        port = int(args[i + 1])
        del args[i : i + 2]
    cfg = RunConfig()
    cfg.run_group = cfg.run_name = "server"
    cfg.prompt_strategy = []
    for arg in args:
        key, _, raw = arg.partition("=")
        from caesar_tpu.config import _parse_value

        cfg.apply_override(key, _parse_value(raw))
    cfg.finalize()

    econf = cfg.engine
    if econf.num_hosts > 1 or econf.coordinator_address:
        # worker hosts of a multi-host pod join the process group first so
        # their meshes see the global topology (BASELINE config 5)
        from caesar_tpu.parallel.multihost import init_distributed

        init_distributed(
            econf.coordinator_address or None,
            econf.num_hosts if econf.num_hosts > 1 else None,
            econf.host_id if econf.host_id >= 0 else None,
        )
    if econf.tp > 1:
        import jax

        from caesar_tpu.parallel.plan import make_mesh

        engine = Engine(econf, mesh=make_mesh(econf.tp, jax.local_devices()))
    else:
        engine = Engine(econf)
    server = serve(engine, port=port)
    print(f"caesar-tpu engine serving {cfg.engine.model} on :{port}")
    try:
        server.serve_forever()
    finally:
        engine.close()


if __name__ == "__main__":
    main()
