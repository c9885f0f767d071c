import pytest

from caesar_tpu.engine.tokenizer import (
    SHIPPED_TOKENIZER,
    ByteTokenizer,
    HFTokenizer,
    load_tokenizer,
)


def test_byte_tokenizer_roundtrip():
    tok = ByteTokenizer()
    text = "def f(x):\n    return x  # ünïcödé"
    ids = tok.encode(text)
    assert ids[0] == tok.bos_id
    assert tok.decode(ids) == text


def test_shipped_bpe_exists_and_compresses():
    assert SHIPPED_TOKENIZER.exists()
    tok = HFTokenizer(SHIPPED_TOKENIZER)
    text = "import jax.numpy as jnp\n\nclass ModelNew:\n    pass\n" * 4
    ids = tok.encode(text)
    # better than 2 chars/token on in-domain text (bytes would be 1.0)
    assert len(text) / len(ids) > 2.0
    assert tok.decode(ids) == text


def test_shipped_bpe_specials():
    tok = HFTokenizer(SHIPPED_TOKENIZER)
    assert tok.bos_id != tok.eos_id or tok.bos_id == 0  # distinct specials
    assert 0 <= tok.eos_id < tok.vocab_size


def test_decode_skips_out_of_vocab_ids():
    tok = HFTokenizer(SHIPPED_TOKENIZER)
    ids = tok.encode("hello")
    assert tok.decode(ids + [tok.vocab_size + 999]) == tok.decode(ids)


def test_load_tokenizer_prefers_shipped_for_presets():
    tok = load_tokenizer("qwen2.5-coder-7b")
    assert isinstance(tok, HFTokenizer)
