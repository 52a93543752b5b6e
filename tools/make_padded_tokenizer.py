"""Build a FULL-SIZE (50257-token) GPT-2-format tokenizer dir from a tiny
label corpus by padding a trained BPE with unused filler tokens.

Why: no network egress means no published Whisper vocab files, but the
whisper-small full-parameter fine-tune (VERDICT r3 item #2) must run at
the REAL dims — `_load_whisper` shrinks `cfg.vocab_size` to the tokenizer
size when they disagree, and a ~300-token head is a different model (the
LM head is ~40% of decoder FLOPs). Padding the trained note-name BPE to
the published base size (50257) makes `WhisperTokenizer.for_vocab_size`
resolve the standard 51865 multilingual layout; filler ids are simply
never produced by encode (no merges reach them) and never decoded (the
model is trained only on real label ids).

Usage:
  python tools/make_padded_tokenizer.py --labels-csv .../mididataset.csv \
      --out /tmp/tok_full --vocab-size 50257
"""

from __future__ import annotations

import argparse
import csv


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--labels-csv", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--vocab-size", type=int, default=50257,
                    help="padded base size (published multilingual base)")
    ap.add_argument("--bpe-vocab", type=int, default=600,
                    help="real trained vocab budget before padding")
    args = ap.parse_args()

    from audax.symbolic.bpe import BPE, train_bpe

    with open(args.labels_csv, newline="") as fh:
        corpus = [row["labels"] for row in csv.DictReader(fh)]
    if not corpus:
        raise SystemExit(f"no labels in {args.labels_csv}")
    bpe = train_bpe(corpus, vocab_size=args.bpe_vocab)
    vocab = dict(bpe.vocab)
    for i in range(len(vocab), args.vocab_size):
        vocab[f"<unused{i}>"] = i
    padded = BPE(vocab, bpe.merges)
    padded.save(args.out)
    print(f"{args.out}: {len(padded)} tokens "
          f"({len(bpe)} trained + {len(padded) - len(bpe)} filler), "
          f"{len(bpe.merges)} merges")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
