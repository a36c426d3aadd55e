"""Convert a SentencePiece .vocab export to the framework's vocab.txt.

Rebuilds /root/reference/utils/convert_vocab.py:4-17: the spm vocab lists
pieces (first three are <unk>, <s>, </s>); the output indexes pieces with
<blank>=0, <unk>=1, then pieces, then <sos/eos> last.

Usage:
    python -m conformer_tpu.tools.convert_vocab \
        --spm_vocab bpe_model.vocab --output vocab.txt
"""

from __future__ import annotations

import argparse


def convert(spm_vocab: str, output: str) -> int:
    pieces = []
    with open(spm_vocab, encoding="utf-8") as f:
        for line in f:
            piece = line.split("\t")[0].strip()
            if piece in ("<unk>", "<s>", "</s>", ""):
                continue
            pieces.append(piece)
    with open(output, "w", encoding="utf-8") as f:
        f.write("<blank> 0\n<unk> 1\n")
        idx = 2
        for piece in pieces:
            f.write(f"{piece} {idx}\n")
            idx += 1
        f.write(f"<sos/eos> {idx}\n")
    return idx + 1


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--spm_vocab", required=True)
    ap.add_argument("--output", required=True)
    args = ap.parse_args()
    n = convert(args.spm_vocab, args.output)
    print(f"wrote {n} entries to {args.output}")


if __name__ == "__main__":
    main()
