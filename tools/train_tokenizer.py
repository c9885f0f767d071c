"""Train the shipped BPE tokenizer (assets/tokenizer.json).

Zero-egress environments cannot download a model's real tokenizer; raw
byte-level tokenization inflates prompts ~4x in tokens, distorting serving
benchmarks and wasting prefill.  This trains a 32K byte-level BPE on the
framework's own text domain (problem files, prompt templates, source code)
— realistic compression for the prompts the harness actually builds — and
ships it in assets/ for all preset models.

    python tools/train_tokenizer.py [--vocab 32768]
"""

from __future__ import annotations

import argparse
import os
import sys
from pathlib import Path

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

REPO = Path(__file__).resolve().parents[1]


def corpus() -> list:
    texts = []
    for pattern in ("problems/level*/*.py", "caesar_tpu/**/*.py", "tools/*.py"):
        for path in REPO.glob(pattern):
            try:
                texts.append(path.read_text())
            except OSError:
                pass
    # the actual prompt surfaces
    from caesar_tpu.harness.context import generate_initial_prompt
    from caesar_tpu.harness.prompts import PACKS
    from caesar_tpu.harness.strategy import Strategy

    for pack in PACKS.values():
        texts.append(
            generate_initial_prompt(
                "class Model:\n    pass\n", set(Strategy), pack
            )
        )
        texts.append(pack.reflection_instruction)
        texts.append(pack.compiler_feedback.format(compiler_feedback="err"))
    return texts


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--vocab", type=int, default=32768)
    parser.add_argument("--out", default=str(REPO / "assets" / "tokenizer.json"))
    args = parser.parse_args()

    from tokenizers import Tokenizer, models, pre_tokenizers, decoders, trainers

    tok = Tokenizer(models.BPE(unk_token=None, byte_fallback=True))
    tok.pre_tokenizer = pre_tokenizers.ByteLevel(add_prefix_space=False)
    tok.decoder = decoders.ByteLevel()
    trainer = trainers.BpeTrainer(
        vocab_size=args.vocab,
        special_tokens=["<|bos|>", "<|endoftext|>", "<|pad|>"],
        initial_alphabet=pre_tokenizers.ByteLevel.alphabet(),
        show_progress=False,
    )
    texts = corpus()
    print(f"training on {len(texts)} documents, vocab {args.vocab}")
    tok.train_from_iterator(texts, trainer)

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    tok.save(args.out)
    probe = "def softmax(x):\n    return jax.nn.softmax(x, axis=-1)\n"
    n = len(tok.encode(probe).ids)
    print(
        f"wrote {args.out}: vocab {tok.get_vocab_size()}, probe "
        f"{len(probe)} chars -> {n} tokens ({len(probe) / n:.2f} chars/token)"
    )


if __name__ == "__main__":
    main()
