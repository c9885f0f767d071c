"""Tokenizers: HF tokenizer.json when available, byte-fallback otherwise.

The byte tokenizer maps UTF-8 bytes to ids 0..255 with BOS/EOS/PAD specials
above — lossless on arbitrary text, so the whole serving stack (prefill,
paged KV, prefix reuse, sampling, detokenization) runs faithfully in
zero-egress environments; real checkpoints bring their own tokenizer.json.
"""

from __future__ import annotations

import os
from pathlib import Path
from typing import List, Protocol


class Tokenizer(Protocol):
    bos_id: int
    eos_id: int
    pad_id: int
    vocab_size: int

    def encode(self, text: str) -> List[int]: ...

    def decode(self, ids: List[int]) -> str: ...


class ByteTokenizer:
    """UTF-8 bytes + specials.  ids: 0..255 bytes, 256 BOS, 257 EOS, 258 PAD."""

    bos_id = 256
    eos_id = 257
    pad_id = 258
    vocab_size = 259

    def encode(self, text: str) -> List[int]:
        return [self.bos_id] + list(text.encode("utf-8"))

    def decode(self, ids: List[int]) -> str:
        data = bytes(i for i in ids if 0 <= i < 256)
        return data.decode("utf-8", errors="replace")


class HFTokenizer:
    """tokenizers-backed wrapper over a tokenizer.json (a checkpoint's own,
    or the shipped domain-trained BPE in assets/)."""

    def __init__(self, path: str | os.PathLike):
        from tokenizers import Tokenizer as _Tok

        self._tok = _Tok.from_file(str(path))
        self.vocab_size = self._tok.get_vocab_size()
        self.bos_id = self._special("<|begin▁of▁sentence|>", "<s>", "<|bos|>")
        self.eos_id = self._special(
            "<|endoftext|>", "<|im_end|>", "</s>", "<|eot_id|>"
        )
        self.pad_id = self.eos_id

    def _special(self, *candidates: str) -> int:
        for cand in candidates:
            tid = self._tok.token_to_id(cand)
            if tid is not None:
                return tid
        return 0

    def encode(self, text: str) -> List[int]:
        return self._tok.encode(text).ids

    def decode(self, ids: List[int]) -> str:
        # random-init models can sample ids past the tokenizer's vocab
        # (model vocab >= tokenizer vocab); drop them rather than raising
        valid = [i for i in ids if 0 <= i < self.vocab_size]
        return self._tok.decode(valid)


#: the domain-trained BPE shipped for preset (checkpoint-less) models
SHIPPED_TOKENIZER = (
    Path(__file__).resolve().parents[2] / "assets" / "tokenizer.json"
)


def load_tokenizer(model: str) -> Tokenizer:
    """Checkpoint dirs with tokenizer.json get the HF tokenizer; preset
    names use the shipped domain-trained BPE (tools/train_tokenizer.py),
    byte fallback if assets/ is absent."""
    if os.path.isdir(model):
        tok_path = Path(model) / "tokenizer.json"
        if tok_path.exists():
            return HFTokenizer(tok_path)
    if SHIPPED_TOKENIZER.exists():
        return HFTokenizer(SHIPPED_TOKENIZER)
    return ByteTokenizer()
