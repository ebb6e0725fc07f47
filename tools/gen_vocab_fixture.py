#!/usr/bin/env python3
"""Generate the driver-oracle fixture parquet for `vocab_encode`, whose
expected output cannot be expressed in DuckDB SQL (an iterative BPE
training loop).

This is an INDEPENDENT pure-Python reimplementation of batched BPE
training (Sennrich et al. 2016, word-frequency formulation, batched
symbol-disjoint merge selection) and rank-priority encoding — not a dump
of the Spark output. It mirrors the engine's EXACT determinism contract
(graft.ext.Vocab):

 - pair counts over the distinct-word frequency table;
 - candidates ordered by (count desc, a+SEP+b asc), truncated to the
   engine's `want*4+16` overfetch window, then greedily filtered so each
   batch's {a, b, a+b} symbol sets are mutually disjoint;
 - single-pass left-to-right non-overlapping non-cascading merge rewrite;
 - encode = repeatedly merge the lowest-rank adjacent pair present.

Gate parameters (keep in lockstep with Vocab.GateMerges/GateBatch):
nMerges=50, batchSize=16, minPairCount=2.

Fixtures carry a `corpus` tag (md5 of ids AND texts, the
gen_dedup_fixtures.py pattern) so a data change fails loudly with an
empty oracle. Usage:
    python3 tools/gen_vocab_fixture.py [--check /tmp/verify_out]
Driver-side tooling only (pandas/pyarrow/duckdb) — not part of the library.
"""
import argparse
import glob
import os
import sys

import duckdb
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

SEP = '\x01'
N_MERGES = 50
BATCH = 16
MIN_PAIR_COUNT = 2


def train_bpe(texts, n_merges=N_MERGES, batch_size=BATCH,
              min_pair_count=MIN_PAIR_COUNT):
    freq = {}
    for t in texts:
        for w in t.split(' '):
            if w:
                freq[w] = freq.get(w, 0) + 1
    # distinct-word symbol table: tuple(symbols) -> summed frequency
    sym_freq = {}
    for w, c in freq.items():
        key = tuple(w)  # chars; corpus is ASCII (checked at generation)
        sym_freq[key] = sym_freq.get(key, 0) + c
    merges = []
    while len(merges) < n_merges:
        want = min(batch_size, n_merges - len(merges))
        counts = {}
        for sym, c in sym_freq.items():
            for i in range(len(sym) - 1):
                p = (sym[i], sym[i + 1])
                counts[p] = counts.get(p, 0) + c
        eligible = [(p, c) for p, c in counts.items() if c >= min_pair_count]
        if not eligible:
            break
        eligible.sort(key=lambda pc: (-pc[1], pc[0][0] + SEP + pc[0][1]))
        # the engine overfetches limit(want*4+16) rows (limit(1) when want=1)
        # BEFORE the greedy disjoint filter — mirror the truncation exactly
        window = eligible[:1] if want == 1 else eligible[:want * 4 + 16]
        used, batch = set(), []
        for (a, b), _ in window:
            if len(batch) >= want:
                break
            if a not in used and b not in used and (a + b) not in used:
                batch.append((a, b))
                used.update((a, b, a + b))
        merges.extend(batch)
        lut = {p: p[0] + p[1] for p in batch}
        nxt = {}
        for sym, c in sym_freq.items():
            out, i = [], 0
            while i < len(sym):
                if i + 1 < len(sym) and (sym[i], sym[i + 1]) in lut:
                    out.append(lut[(sym[i], sym[i + 1])])
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            key = tuple(out)
            nxt[key] = nxt.get(key, 0) + c
        sym_freq = nxt
    return merges


def encode_word(word, rank):
    sym = list(word)
    while len(sym) >= 2:
        present = [(rank[(sym[i], sym[i + 1])], i)
                   for i in range(len(sym) - 1) if (sym[i], sym[i + 1]) in rank]
        if not present:
            break
        r = min(p[0] for p in present)
        a, b = next(p for p, k in rank.items() if k == r)
        out, i = [], 0
        while i < len(sym):
            if i + 1 < len(sym) and sym[i] == a and sym[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(sym[i])
                i += 1
        sym = out
    return sym


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--sfs', nargs='*', default=['0.001', '0.01', '0.1'])
    ap.add_argument('--check', help='Verify-dump dir to cross-check (same sf as its run)')
    ap.add_argument('--check-sf', default='0.01')
    ap.add_argument('--out', default=os.path.join(os.path.dirname(__file__), '..', 'fixtures'))
    args = ap.parse_args()

    con = duckdb.connect()
    parts = []
    for sf in args.sfs:
        path = f'/root/testdata/sf{sf}/documents.parquet'
        docs = con.execute(
            f"SELECT doc_id, text FROM read_parquet('{path}') ORDER BY doc_id").fetchall()
        assert all(all(ord(ch) < 128 for ch in t) for _, t in docs), \
            'non-ASCII corpus would need UTF-16 vs code-point sort-order care'
        tag = con.execute(
            f"SELECT md5(string_agg(doc_id || ':' || text, '|' ORDER BY doc_id)) "
            f"FROM read_parquet('{path}')").fetchone()[0]
        merges = train_bpe([t for _, t in docs])
        rank = {p: i for i, p in enumerate(merges)}
        rows = []
        for d, t in docs:
            toks = []
            for w in t.split(' '):
                if w:
                    toks.extend(encode_word(w, rank))
            rows.append((d, len(toks), ' '.join(toks)))
        print(f'sf{sf}: corpus={tag} merges={len(merges)} docs={len(rows)}')
        parts.append(pd.DataFrame(
            {'corpus': tag,
             'doc_id': pd.Series([r[0] for r in rows], dtype='int64'),
             'n_bpe': pd.Series([r[1] for r in rows], dtype='int64'),
             'bpe_text': [r[2] for r in rows]}))
        if args.check and sf == args.check_sf:
            got = pq.read_table(
                glob.glob(f'{args.check}/vocab_encode/*.parquet')[0]).to_pandas()
            cols = ['doc_id', 'n_bpe', 'bpe_text']
            got = got[cols].sort_values('doc_id').reset_index(drop=True)
            exp = parts[-1][cols].sort_values('doc_id').reset_index(drop=True)
            pd.testing.assert_frame_equal(got, exp, check_dtype=False, check_exact=True)
            print(f'  vocab_encode: independent Python result == Spark output ({len(got)} rows)')

    os.makedirs(args.out, exist_ok=True)
    pq.write_table(pa.Table.from_pandas(pd.concat(parts), preserve_index=False),
                   os.path.join(args.out, 'vocab_encode.parquet'))
    print(f'wrote fixture to {os.path.abspath(args.out)}')
    return 0


if __name__ == '__main__':
    sys.exit(main())
