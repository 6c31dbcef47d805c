"""Offline BPE trainer — generates the committed merge table in
geokit_spark/functions/bpe.py.

Classic byte-pair-encoding training (Sennrich et al. 2016, public
algorithm) over the corpus word-frequency table at sf0.01: start from
single characters, repeatedly merge the most frequent adjacent symbol
pair (ties broken lexicographically on (left, right) so the table is
deterministic), applying each merge to all words left-to-right
non-overlapping. The resulting ordered merge list + vocab are
committed as literals — training runs ONCE here; the engine and the
DuckDB oracle both consume the committed table and must agree
bit-exactly on token ids.

Usage: python scripts/train_bpe.py [n_merges] [sf_dir]
Prints the BPE_MERGES / BPE_VOCAB literals to paste into bpe.py.
"""

from __future__ import annotations

import sys
from collections import Counter

import duckdb


def train(word_freq: dict[str, int], n_merges: int):
    words = {w: list(w) for w in word_freq}
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pairs: Counter = Counter()
        for w, syms in words.items():
            f = word_freq[w]
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += f
        if not pairs:
            break
        # tie-break: highest count, then lexicographically SMALLEST pair
        top = max(pairs.values())
        l, r = min(p for p, c in pairs.items() if c == top)
        merges.append((l, r))
        merged = l + r
        for w, syms in words.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == r:
                    out.append(merged)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            words[w] = out
    base = sorted({c for w in word_freq for c in w})
    vocab = base + [l + r for l, r in merges]
    return merges, vocab


def main():
    n_merges = int(sys.argv[1]) if len(sys.argv) > 1 else 40
    sf = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"
    freq = dict(
        duckdb.sql(
            f"select word, count(*) n from (select unnest(string_split"
            f"(text,' ')) word from '{sf}/documents.parquet') group by word"
        ).fetchall()
    )
    merges, vocab = train(freq, n_merges)
    print("BPE_MERGES = (")
    for l, r in merges:
        print(f"    ({l!r}, {r!r}),")
    print(")")
    print("\nBPE_VOCAB = (")
    for s in vocab:
        print(f"    {s!r},")
    print(")")


if __name__ == "__main__":
    main()
