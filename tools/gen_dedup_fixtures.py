#!/usr/bin/env python3
"""Generate driver-oracle fixture parquet for the hash-dependent dedup
queries (dedup_minhash_lsh, dedup_simhash), whose expected output cannot be
expressed in DuckDB SQL (it depends on xxHash64 values).

This is an INDEPENDENT reimplementation — pure-Python xxHash64 (public
algorithm, https://github.com/Cyan4973/xxHash spec) + set-based MinHash/
SimHash/LSH — not a dump of the Spark output. The script asserts its own
results equal the engine's current Verify dump before writing fixtures, so
a bug in either side fails loudly here AND in the driver gate.

Fixtures carry a `corpus` tag = md5(string_agg(doc_id || ':' || text, '|'
ORDER BY doc_id)) — ids AND texts — so one file serves every scale factor
whose expected rows were generated; the oracle SQL selects the partition
matching the live `documents` table, and any id or text change (not just a
text change) fails loudly with an empty oracle instead of silently passing.

Usage: python3 tools/gen_dedup_fixtures.py [--check /tmp/verify_out]
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

MASK = (1 << 64) - 1
P1, P2, P3, P4, P5 = (0x9E3779B185EBCA87, 0xC2B2AE3D27D4EB4F,
                      0x165667B19E3779F9, 0x85EBCA77C2B2AE63,
                      0x27D4EB2F165667C5)


def _rotl(x, r):
    return ((x << r) | (x >> (64 - r))) & MASK


def xxh64(data: bytes, seed: int) -> int:
    """Standard xxHash64 of `data` with `seed` (unsigned result)."""
    n = len(data)
    i = 0
    if n >= 32:
        v1 = (seed + P1 + P2) & MASK
        v2 = (seed + P2) & MASK
        v3 = seed & MASK
        v4 = (seed - P1) & MASK
        while i + 32 <= n:
            v1 = (_rotl((v1 + int.from_bytes(data[i:i + 8], 'little') * P2) & MASK, 31) * P1) & MASK
            v2 = (_rotl((v2 + int.from_bytes(data[i + 8:i + 16], 'little') * P2) & MASK, 31) * P1) & MASK
            v3 = (_rotl((v3 + int.from_bytes(data[i + 16:i + 24], 'little') * P2) & MASK, 31) * P1) & MASK
            v4 = (_rotl((v4 + int.from_bytes(data[i + 24:i + 32], 'little') * P2) & MASK, 31) * P1) & MASK
            i += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & MASK
        for v in (v1, v2, v3, v4):  # merge rounds
            h ^= (_rotl((v * P2) & MASK, 31) * P1) & MASK
            h = (h * P1 + P4) & MASK
    else:
        h = (seed + P5) & MASK
    h = (h + n) & MASK
    while i + 8 <= n:
        k = (_rotl((int.from_bytes(data[i:i + 8], 'little') * P2) & MASK, 31) * P1) & MASK
        h = ((_rotl(h ^ k, 27) * P1) + P4) & MASK
        i += 8
    if i + 4 <= n:
        h = ((_rotl(h ^ ((int.from_bytes(data[i:i + 4], 'little') * P1) & MASK), 23) * P2) + P3) & MASK
        i += 4
    while i < n:
        h = (_rotl(h ^ ((data[i] * P5) & MASK), 11) * P1) & MASK
        i += 1
    h ^= h >> 33
    h = (h * P2) & MASK
    h ^= h >> 29
    h = (h * P3) & MASK
    h ^= h >> 32
    return h


def signed(u):
    return u - (1 << 64) if u >= (1 << 63) else u


def shingles(text, k=3):
    toks = text.split(' ')
    if len(toks) < k:
        return [text]
    out, seen = [], set()
    for t in range(len(toks) - k + 1):
        s = ' '.join(toks[t:t + k])
        if s not in seen:
            seen.add(s)
            out.append(s)
    return out


def minhash_sig(sh, num_hashes, cache):
    """Per-seed signed minima of xxh64 over the shingle set."""
    mins = [2**63 - 1] * num_hashes
    for s in sh:
        hs = cache.get(s)
        if hs is None:
            b = s.encode('utf-8')
            hs = [signed(xxh64(b, j)) for j in range(num_hashes)]
            cache[s] = hs
        for j in range(num_hashes):
            if hs[j] < mins[j]:
                mins[j] = hs[j]
    return mins


def simhash64(tokens, cache, seed=42):
    counters = [0] * 64
    for t in tokens:
        h = cache.get(t)
        if h is None:
            h = xxh64(t.encode('utf-8'), seed)
            cache[t] = h
        for j in range(64):
            if (h >> j) & 1:
                counters[j] += 1
            else:
                counters[j] -= 1
    out = 0
    for j in range(64):
        if counters[j] > 0:
            out |= 1 << j
    return signed(out)


def minhash_lsh_pairs(docs, k=3, num_hashes=64, bands=16, tau=0.5):
    rows = num_hashes // bands
    cache = {}
    sh = {d: shingles(t, k) for d, t in docs if shingles(t, k)}
    sig = {d: minhash_sig(s, num_hashes, cache) for d, s in sh.items()}
    shset = {d: set(s) for d, s in sh.items()}
    buckets = {}
    for d, s in sig.items():
        for b in range(bands):
            buckets.setdefault((b, tuple(s[b * rows:(b + 1) * rows])), []).append(d)
    cand = set()
    for ids in buckets.values():
        ids.sort()
        for x in range(len(ids)):
            for y in range(x + 1, len(ids)):
                cand.add((ids[x], ids[y]))
    out = []
    for a, b in sorted(cand):
        inter = len(shset[a] & shset[b])
        union = len(shset[a] | shset[b])
        jac = inter / union
        if jac >= tau:
            est = sum(1 for j in range(num_hashes) if sig[a][j] == sig[b][j]) / num_hashes
            out.append((a, b, est, jac))
    return out


def simhash_pairs(docs, max_hamming=3):
    cache = {}
    sigs = [(d, simhash64(t.split(' '), cache)) for d, t in docs]
    out = []
    for x in range(len(sigs)):
        for y in range(x + 1, len(sigs)):
            a, sa = sigs[x]
            b, sb = sigs[y]
            h = bin((sa ^ sb) & MASK).count('1')
            if h <= max_hamming:
                out.append((a, b, h) if a < b else (b, a, h))
    return sorted(out)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--sfs', nargs='*', default=['0.001', '0.01', '0.1'])
    ap.add_argument('--check', help='Verify-dump dir to cross-check (same sf as its run)')
    ap.add_argument('--check-sf', default='0.01')
    ap.add_argument('--out', default=os.path.join(os.path.dirname(__file__), '..', 'fixtures'))
    args = ap.parse_args()

    # xxh64 self-test: the published empty-string vector + values from
    # Spark's own `xxhash64(...)` (seed 42), covering the <32B and >=32B paths
    assert xxh64(b'', 0) == 0xEF46DB3751D8E999
    assert signed(xxh64(b'Hello World', 42)) == 8557436188178888239
    assert signed(xxh64(b'the quick brown fox jumps over the lazy dog twice over', 42)) == 2120134319777442651

    con = duckdb.connect()
    mh_parts, sh_parts = [], []
    for sf in args.sfs:
        path = f'/root/testdata/sf{sf}/documents.parquet'
        docs = con.execute(
            f"SELECT doc_id, text FROM read_parquet('{path}') ORDER BY doc_id").fetchall()
        tag = con.execute(
            f"SELECT md5(string_agg(doc_id || ':' || text, '|' ORDER BY doc_id)) "
            f"FROM read_parquet('{path}')"
        ).fetchone()[0]
        mh = minhash_lsh_pairs(docs)
        sh = simhash_pairs(docs)
        print(f'sf{sf}: corpus={tag} minhash_lsh={len(mh)} pairs, simhash={len(sh)} pairs')
        mh_parts.append(pd.DataFrame(
            {'corpus': tag,
             'id_a': pd.Series([r[0] for r in mh], dtype='int64'),
             'id_b': pd.Series([r[1] for r in mh], dtype='int64'),
             'est_jac': pd.Series([r[2] for r in mh], dtype='float64'),
             'jac': pd.Series([r[3] for r in mh], dtype='float64')}))
        sh_parts.append(pd.DataFrame(
            {'corpus': tag,
             'id_a': pd.Series([r[0] for r in sh], dtype='int64'),
             'id_b': pd.Series([r[1] for r in sh], dtype='int64'),
             'hamming': pd.Series([r[2] for r in sh], dtype='int32')}))
        if args.check and sf == args.check_sf:
            for name, mine in (('dedup_minhash_lsh', mh_parts[-1]), ('dedup_simhash', sh_parts[-1])):
                got = pq.read_table(glob.glob(f'{args.check}/{name}/*.parquet')[0]).to_pandas()
                cols = [c for c in mine.columns if c != 'corpus']
                got = got[cols].sort_values(cols).reset_index(drop=True)
                exp = mine[cols].sort_values(cols).reset_index(drop=True)
                pd.testing.assert_frame_equal(got, exp, check_dtype=False, check_exact=True)
                print(f'  {name}: independent Python result == Spark output ({len(got)} rows)')

    os.makedirs(args.out, exist_ok=True)
    pq.write_table(pa.Table.from_pandas(pd.concat(mh_parts), preserve_index=False),
                   os.path.join(args.out, 'dedup_minhash_lsh.parquet'))
    pq.write_table(pa.Table.from_pandas(pd.concat(sh_parts), preserve_index=False),
                   os.path.join(args.out, 'dedup_simhash.parquet'))
    print(f'wrote fixtures to {os.path.abspath(args.out)}')
    return 0


if __name__ == '__main__':
    sys.exit(main())
