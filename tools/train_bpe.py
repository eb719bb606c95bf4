#!/usr/bin/env python3
"""One-off deterministic BPE trainer for the embedded graft vocabulary.

Learns NUM_MERGES byte-pair merges from the sf0.001 documents corpus
(the driver-generated public test data) and prints the Scala literal
rows for src/main/scala/graft/functions/BpeVocab.scala.

Stated training procedure (mirrored in BpeVocab's Scaladoc):
- pre-tokenizer: regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\\s]')
- initial symbols: the word's characters (no end-of-word marker)
- each round merges the adjacent pair with the highest corpus
  frequency (weighted by word frequency); ties break on the
  lexicographically smallest (first, second) pair
- stops at NUM_MERGES merges or when the best pair count is < 2

Deterministic: same corpus -> same table, byte for byte.
"""
import re, sys
from collections import Counter
import duckdb

NUM_MERGES = 64
CORPUS = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001/documents.parquet"

con = duckdb.connect()
texts = [r[0] for r in con.execute(
    f"SELECT text FROM read_parquet('{CORPUS}')").fetchall()]

PRETOK = re.compile(r"[a-z]+|[0-9]+|[^a-z0-9\s]")
word_freq = Counter()
for t in texts:
    for w in PRETOK.findall(t.lower()):
        word_freq[w] += 1

# word -> current symbol tuple
words = {w: tuple(w) for w in word_freq}

merges = []
for _ in range(NUM_MERGES):
    pair_counts = Counter()
    for w, syms in words.items():
        f = word_freq[w]
        for i in range(len(syms) - 1):
            pair_counts[(syms[i], syms[i + 1])] += f
    if not pair_counts:
        break
    best = min(pair_counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
    if pair_counts[best] < 2:
        break
    merges.append(best)
    a, b = best
    merged = a + b
    for w, syms in words.items():
        out, i = [], 0
        while i < len(syms):
            if i < len(syms) - 1 and syms[i] == a and syms[i + 1] == b:
                out.append(merged); i += 2
            else:
                out.append(syms[i]); i += 1
        words[w] = tuple(out)

print(f"// {len(merges)} merges trained on {CORPUS}")
for a, b in merges:
    print(f'    ("{a}", "{b}"),')

# sanity: report the terminal tokenization of the most frequent words
for w, _ in word_freq.most_common(8):
    print(f"// {w!r} -> {words[w]}", file=sys.stderr)
