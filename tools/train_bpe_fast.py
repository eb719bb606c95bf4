#!/usr/bin/env python3
"""Incremental-update BPE trainer — the same stated procedure as
train_bpe.py (same corpus SQL, same pre-tokenizer, same best-pair /
tie-break / stop rules, byte-identical output for the same inputs),
re-implemented with the standard inverted-index training algorithm so
a 16k+-merge vocabulary trains in minutes instead of hours:

- pair_counts maintained incrementally: each merge touches ONLY the
  words that contain the merged pair (an inverted index pair -> word
  set), instead of rescanning every word every round;
- best-pair selection via a lazy max-heap keyed (-count, pair):
  stale entries are discarded on pop by checking against the live
  count, so the (count DESC, pair ASC) total order — train_bpe.py's
  exact tie-break — is preserved deterministically.

Usage: train_bpe_fast.py [sfdir] [num_merges] [scala|merges]
"""
import heapq
import re
import sys
from collections import Counter, defaultdict

import duckdb

NUM_MERGES = int(sys.argv[2]) if len(sys.argv) > 2 else 512
SFDIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
OUT_MODE = sys.argv[3] if len(sys.argv) > 3 else "scala"
# min corpus count for a pair to merge. 2 = train_bpe.py's exhaustion
# rule; 1 = the standard production stop-at-vocab-size convention
# (rare single-occurrence pairs keep merging deterministically until
# NUM_MERGES or literally nothing is left to merge).
MIN_COUNT = int(sys.argv[4]) if len(sys.argv) > 4 else 2

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

PRETOK = re.compile(r"[a-z]+|[0-9]+|[^a-z0-9 \t\n\x0B\f\r]")

con = duckdb.connect()
texts = [r[0] for r in con.execute(CORPUS_SQL).fetchall() if r[0] is not None]
word_freq = Counter()
for t in texts:
    for w in PRETOK.findall(t.lower()):
        word_freq[w] += 1

words = {w: list(w) for w in word_freq}

def word_pairs(syms):
    return Counter(zip(syms, syms[1:]))

pair_counts = Counter()
pair_words = defaultdict(set)
for w, syms in words.items():
    f = word_freq[w]
    for p, k in word_pairs(syms).items():
        pair_counts[p] += k * f
        pair_words[p].add(w)

heap = [(-c, p) for p, c in pair_counts.items()]
heapq.heapify(heap)

def apply_merge(syms, a, b, merged):
    out, i = [], 0
    while i < len(syms):
        if i < len(syms) - 1 and syms[i] == a and syms[i + 1] == b:
            out.append(merged)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return out

merges = []
while len(merges) < NUM_MERGES:
    best = None
    while heap:
        negc, p = heap[0]
        live = pair_counts.get(p, 0)
        if live == 0:
            heapq.heappop(heap)
            continue
        if -negc != live:
            # stale entry: reinsert at the live count
            heapq.heappop(heap)
            heapq.heappush(heap, (-live, p))
            continue
        best = p
        break
    if best is None or pair_counts[best] < MIN_COUNT:
        break
    merges.append(best)
    a, b = best
    merged = a + b
    touched = list(pair_words.pop(best, ()))
    changed = set()
    for w in touched:
        syms = words[w]
        f = word_freq[w]
        old = word_pairs(syms)
        new_syms = apply_merge(syms, a, b, merged)
        new = word_pairs(new_syms)
        words[w] = new_syms
        for p in old.keys() - new.keys():
            pair_counts[p] -= old[p] * f
            if pair_counts[p] <= 0:
                pair_counts.pop(p, None)
            pair_words[p].discard(w)
            changed.add(p)
        for p in new.keys() - old.keys():
            pair_counts[p] += new[p] * f
            pair_words[p].add(w)
            changed.add(p)
        for p in old.keys() & new.keys():
            if old[p] != new[p]:
                pair_counts[p] += (new[p] - old[p]) * f
                changed.add(p)
    pair_counts.pop(best, None)
    for p in changed:
        if p in pair_counts:
            heapq.heappush(heap, (-pair_counts[p], p))

if OUT_MODE == "merges":
    print(f"#version: 0.2 — {len(merges)} merges, combined {SFDIR} text corpus, graft tools/train_bpe_fast.py")
    for a, b in merges:
        print(f"{a} {b}")
else:
    print(f"// {len(merges)} merges trained on the combined {SFDIR} text corpus")
    for a, b in merges:
        ea = a.replace("\\", "\\\\").replace('"', '\\"')
        eb = b.replace("\\", "\\\\").replace('"', '\\"')
        print(f'    ("{ea}", "{eb}"),')

doc_words = Counter()
for r in con.execute(f"SELECT text FROM read_parquet('{SFDIR}/documents.parquet')").fetchall():
    for w in PRETOK.findall(r[0].lower()):
        doc_words[w] += 1
tot_tok = sum(len(words.get(w, tuple(w))) * f for w, f in doc_words.items())
tot_w = sum(doc_words.values())
print(f"// {len(merges)} merges; documents fertility: {tot_tok}/{tot_w} = {tot_tok/tot_w:.4f}", file=sys.stderr)
