#!/usr/bin/env python3
"""One-off deterministic BPE trainer for the embedded graft vocabulary.

Learns up to NUM_MERGES byte-pair merges from the combined public
sf0.001 test-data text (every VARCHAR surface the driver generates —
documents.text plus the TPC-H-ish name/segment/priority/type columns
and the events props), and prints the Scala literal rows for
src/main/scala/graft/functions/BpeVocab.scala.

The documents table alone carries only ~31 distinct pre-tokens (a
synthetic Zipf vocabulary), which exhausts after ~1e2 merges with
every word fully merged — a degenerate vocabulary for fertility /
packing / budget surfaces. The combined corpus (~300 distinct
pre-tokens, digit runs from entity names, brand codes, JSON props)
trains a realistically shaped table: frequent words merge to single
tokens, rarer words stay multi-token, digit strings merge pairwise.

Stated training procedure (mirrored in BpeVocab's Scaladoc):
- pre-tokenizer: regexp_extract_all(lower(text), BpeVocab.PretokenRegex)
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

NUM_MERGES = int(sys.argv[2]) if len(sys.argv) > 2 else 512
SFDIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
# optional 3rd arg: output mode "scala" (default, literal rows) or
# "merges" (the standard merges.txt interchange format fromMergesText
# parses — the production-vocab path)
OUT_MODE = sys.argv[3] if len(sys.argv) > 3 else "scala"

# every generated VARCHAR surface, stated once (kept in sync with the
# BpeVocab Scaladoc)
CORPUS_SQL = f"""
    SELECT text AS t FROM read_parquet('{SFDIR}/documents.parquet')
    UNION ALL SELECT p_name || ' ' || p_brand || ' ' || p_type
      FROM read_parquet('{SFDIR}/part.parquet')
    UNION ALL SELECT c_name || ' ' || c_mktsegment
      FROM read_parquet('{SFDIR}/customer.parquet')
    UNION ALL SELECT s_name FROM read_parquet('{SFDIR}/supplier.parquet')
    UNION ALL SELECT o_orderstatus || ' ' || o_orderpriority
      FROM read_parquet('{SFDIR}/orders.parquet')
    UNION ALL SELECT l_returnflag || ' ' || l_linestatus
      FROM read_parquet('{SFDIR}/lineitem.parquet')
    UNION ALL SELECT event_type || ' ' || props
      FROM read_parquet('{SFDIR}/events.parquet')
    UNION ALL SELECT n_name FROM read_parquet('{SFDIR}/nation.parquet')
    UNION ALL SELECT r_name FROM read_parquet('{SFDIR}/region.parquet')
"""

con = duckdb.connect()
texts = [r[0] for r in con.execute(CORPUS_SQL).fetchall() if r[0] is not None]

PRETOK = re.compile(r"[a-z]+|[0-9]+|[^a-z0-9 \t\n\x0B\f\r]")
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

if OUT_MODE == "merges":
    print(f"#version: 0.2 — {len(merges)} merges, combined {SFDIR} text corpus, graft tools/train_bpe.py")
    for a, b in merges:
        print(f"{a} {b}")
else:
    print(f"// {len(merges)} merges trained on the combined {SFDIR} text corpus")
    for a, b in merges:
        ea, eb = a.replace("\\", "\\\\").replace('"', '\\"'), b.replace("\\", "\\\\").replace('"', '\\"')
        print(f'    ("{ea}", "{eb}"),')

# sanity: report terminal tokenizations + fertility on documents words
doc_words = Counter()
for r in con.execute(f"SELECT text FROM read_parquet('{SFDIR}/documents.parquet')").fetchall():
    for w in PRETOK.findall(r[0].lower()):
        doc_words[w] += 1
tot_tok = sum(len(words.get(w, tuple(w))) * f for w, f in doc_words.items())
tot_w = sum(doc_words.values())
print(f"// documents fertility: {tot_tok}/{tot_w} = {tot_tok/tot_w:.4f}", file=sys.stderr)
for w, _ in word_freq.most_common(12):
    print(f"// {w!r} -> {words[w]}", file=sys.stderr)
deep = [w for w in words if len(words[w]) == 1 and len(w) >= 6]
print(f"// fully merged words >=6 chars: {len(deep)} e.g. {deep[:8]}", file=sys.stderr)
