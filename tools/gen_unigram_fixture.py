#!/usr/bin/env python3
"""Generate the driver-oracle fixture parquet for `vocab_unigram`, whose
expected output cannot be expressed in DuckDB SQL (an iterative hard-EM
training loop).

This is an INDEPENDENT pure-Python reimplementation of hard-EM (Viterbi-EM)
unigram tokenizer induction and Viterbi encoding — not a dump of the Spark
output. It mirrors graft.ext.Vocab.trainUnigram/encodeUnigram's EXACT
determinism contract:

 - distinct-word frequency table; substring seeding (<= seedMaxPiece chars,
   occurrence-weighted, all single chars mandatory, multi-char pool cut by
   (count desc, piece asc));
 - Viterbi segmentation compares likelihoods prod(c_i/T) by EXACT integer
   cross-multiplication (prod_a * T^L_b vs prod_b * T^L_a) — never a
   sum-of-log-probs float; ties prefer fewer pieces then the
   lexicographically smaller piece sequence; inner loop scans piece length
   ascending and replaces only on STRICT improvement;
 - hard E-step counts (word-frequency weighted), chars floored at 1;
 - prune loop: drop ceil(excess * 0.2) lowest-(count, piece) multi-char
   pieces per round until the vocab fits, then one settling EM round.

Gate parameters (lockstep with Vocab.GateUniVocab/GateUniSeedMax/
GateUniPool): vocabSize=60, seedMaxPiece=4, seedPool=200.

Fixtures carry a `corpus` tag (md5 of ids AND texts) so a data change fails
loudly with an empty oracle. Usage:
    python3 tools/gen_unigram_fixture.py [--check /tmp/verify_out]
Driver-side tooling only (pandas/pyarrow/duckdb) — not part of the library.
"""
import argparse
import glob
import math
import os
import sys

import duckdb
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

VOCAB_SIZE = 60
SEED_MAX = 4
SEED_POOL = 200
PRUNE_FRAC = 0.2


def word_freq(texts):
    freq = {}
    for t in texts:
        for w in t.split(' '):
            if w:
                freq[w] = freq.get(w, 0) + 1
    return freq


def seed_vocab(freq):
    sub = {}
    for w, f in freq.items():
        for l in range(1, min(SEED_MAX, len(w)) + 1):
            for i in range(len(w) - l + 1):
                p = w[i:i + l]
                sub[p] = sub.get(p, 0) + f
    chars = {p: c for p, c in sub.items() if len(p) == 1}
    multis = sorted(((p, c) for p, c in sub.items() if len(p) > 1),
                    key=lambda pc: (-pc[1], pc[0]))
    keep = multis[:max(0, SEED_POOL - len(chars))]
    vocab = dict(chars)
    vocab.update(dict(keep))
    return vocab


def segment(word, c, t, maxlen):
    best = [None] * (len(word) + 1)
    best[0] = (1, 0, [])
    for i in range(1, len(word) + 1):
        cand = None
        for l in range(1, min(maxlen, i) + 1):
            piece = word[i - l:i]
            pc = c.get(piece)
            if pc is not None and best[i - l] is not None:
                p0, n0, s0 = best[i - l]
                nxt = (p0 * pc, n0 + 1, s0 + [piece])
                if cand is None:
                    cand = nxt
                else:
                    lhs = nxt[0] * t ** cand[1]
                    rhs = cand[0] * t ** nxt[1]
                    if lhs != rhs:
                        better = lhs > rhs
                    elif nxt[1] != cand[1]:
                        better = nxt[1] < cand[1]
                    else:
                        better = None
                        for x, y in zip(nxt[2], cand[2]):
                            if x != y:
                                better = x < y
                                break
                        if better is None:
                            better = len(nxt[2]) < len(cand[2])
                    if better:
                        cand = nxt
        best[i] = cand
    assert best[len(word)] is not None, f'unsegmentable {word!r}'
    return best[len(word)][2]


def em_round(freq, vocab):
    t = sum(vocab.values())
    maxlen = max(len(p) for p in vocab)
    counts = {}
    for w, f in freq.items():
        for p in segment(w, vocab, t, maxlen):
            counts[p] = counts.get(p, 0) + f
    out = {ch: counts.get(ch, 1) for ch in vocab if len(ch) == 1}
    out.update({p: c for p, c in counts.items() if len(p) > 1})
    return out


def train(freq):
    vocab = seed_vocab(freq)
    rounds = 0
    while len(vocab) > VOCAB_SIZE and rounds < 100:
        vocab = em_round(freq, vocab)
        n_chars = sum(1 for p in vocab if len(p) == 1)
        excess = len(vocab) - max(VOCAB_SIZE, n_chars)
        if excess > 0:
            drop = max(1, math.ceil(excess * PRUNE_FRAC))
            victims = sorted(((p, c) for p, c in vocab.items() if len(p) > 1),
                             key=lambda pc: (pc[1], pc[0]))[:drop]
            for p, _ in victims:
                del vocab[p]
        rounds += 1
    return em_round(freq, vocab)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--sfs', nargs='*', default=['0.001', '0.01', '0.1'])
    ap.add_argument('--check', help='Verify-dump dir to cross-check')
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
        freq = word_freq(t for _, t in docs)
        model = train(freq)
        t_total = sum(model.values())
        maxlen = max(len(p) for p in model)
        memo = {}
        rows = []
        for d, t in docs:
            toks = []
            for w in t.split(' '):
                if w:
                    if w not in memo:
                        memo[w] = segment(w, model, t_total, maxlen)
                    toks.extend(memo[w])
            rows.append((d, len(toks), ' '.join(toks)))
        print(f'sf{sf}: corpus={tag} vocab={len(model)} docs={len(rows)}')
        parts.append(pd.DataFrame(
            {'corpus': tag,
             'doc_id': pd.Series([r[0] for r in rows], dtype='int64'),
             'n_uni': pd.Series([r[1] for r in rows], dtype='int64'),
             'uni_text': [r[2] for r in rows]}))
        if args.check and sf == args.check_sf:
            got = pq.read_table(
                glob.glob(f'{args.check}/vocab_unigram/*.parquet')[0]).to_pandas()
            cols = ['doc_id', 'n_uni', 'uni_text']
            got = got[cols].sort_values('doc_id').reset_index(drop=True)
            exp = parts[-1][cols].sort_values('doc_id').reset_index(drop=True)
            pd.testing.assert_frame_equal(got, exp, check_dtype=False, check_exact=True)
            print(f'  vocab_unigram: independent Python result == Spark output ({len(got)} rows)')

    os.makedirs(args.out, exist_ok=True)
    pq.write_table(pa.Table.from_pandas(pd.concat(parts), preserve_index=False),
                   os.path.join(args.out, 'vocab_unigram.parquet'))
    print(f'wrote fixture to {os.path.abspath(args.out)}')
    return 0


if __name__ == '__main__':
    sys.exit(main())
