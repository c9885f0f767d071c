"""HTTP server over the engine: serve the tiny model, hit it with the
harness's own HttpGenerator (the full OpenAI-compatible round trip)."""

import asyncio
import json
import threading
import urllib.request

import jax.numpy as jnp
import pytest

from caesar_tpu.engine.engine import Engine
from caesar_tpu.engine.model import get_spec
from caesar_tpu.engine.server import serve
from caesar_tpu.engine.tokenizer import ByteTokenizer
from caesar_tpu.engine.weights import init_params
from caesar_tpu.harness.generate import GenerateRequest, HttpGenerator

TINY = get_spec("tiny")


@pytest.fixture(scope="module")
def server():
    from tests.test_engine import tiny_econf

    engine = Engine(
        tiny_econf(),
        spec=TINY,
        params=init_params(TINY, seed=0, dtype=jnp.float32),
        tokenizer=ByteTokenizer(),
        decode_steps=4,
    )
    httpd = serve(engine, port=0)  # ephemeral port
    thread = threading.Thread(target=httpd.serve_forever, daemon=True)
    thread.start()
    yield httpd.server_address[1], engine
    httpd.shutdown()
    engine.close()


def test_models_endpoint(server):
    port, _ = server
    with urllib.request.urlopen(f"http://localhost:{port}/v1/models") as r:
        data = json.load(r)
    assert data["data"][0]["id"] == "tiny"


def test_completions_endpoint(server):
    port, _ = server
    body = json.dumps(
        {"prompt": "hello", "max_tokens": 6, "temperature": 0.0}
    ).encode()
    req = urllib.request.Request(
        f"http://localhost:{port}/v1/completions",
        data=body,
        headers={"Content-Type": "application/json"},
    )
    with urllib.request.urlopen(req) as r:
        data = json.load(r)
    assert data["object"] == "text_completion"
    assert data["usage"]["completion_tokens"] >= 1


def test_chat_roundtrip_via_http_generator(server):
    port, _ = server
    gen = HttpGenerator("localhost", port, "tiny", timeout=60)
    result = asyncio.run(
        gen.generate(
            GenerateRequest(prompt="say hi", temperature=0.0, max_tokens=6)
        )
    )
    assert result.token_usage["completion_tokens"] >= 1


def test_stats_endpoint(server):
    port, _ = server
    with urllib.request.urlopen(f"http://localhost:{port}/stats") as r:
        data = json.load(r)
    assert data["completed"] >= 1
