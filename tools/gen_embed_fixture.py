#!/usr/bin/env python3
"""Generate the driver-oracle fixture parquet for `embed_tfidf`, whose
expected output is float vector math DuckDB cannot be trusted to
reproduce bit-for-bit from SQL (summation-order control inside list
folds).

This is an INDEPENDENT pure-Python reimplementation of the hashing-trick
TF-IDF embedding (graft.ext.TextAnalysis.embedTfidf) — not a dump of the
Spark output. It mirrors the engine's exact determinism contract:

 - word hash: char-polynomial fold acc=7; acc = (acc*31 + codepoint)
   % 1000003, then % dim (Quality.featurize's fold);
 - component h(w) accumulates tf(w,d) * ((N+1)/(df(w)+1)) over the doc's
   DISTINCT WORDS IN SORTED ORDER (the engine sorts the struct array
   before its fold);
 - L2 norm: sqrt of the index-order sum of squares (IEEE sqrt is
   correctly rounded — identical in the JVM and CPython);
 - final components rounded to float32 (the engine's .cast("float")).

Documents with zero non-empty tokens emit no rows (engine join
semantics). Fixtures carry a `corpus` tag (md5 of ids AND texts, the
gen_dedup_fixtures.py pattern) so a data change fails loudly with an
empty oracle. Usage:
    python3 tools/gen_embed_fixture.py
Driver-side tooling only (pandas/pyarrow/duckdb) — not part of the library.
"""
import math
import struct

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq

DIM = 64
HASH_MOD = 1000003
SFS = ['0.001', '0.01', '0.1']
OUT = 'fixtures/embed_tfidf.parquet'


def word_hash(w, dim):
    acc = 7
    for c in w:
        acc = (acc * 31 + ord(c)) % HASH_MOD
    return acc % dim


def embed_corpus(rows, dim):
    n = len(rows)  # every document counts toward N, tokenless included
    tf_by_doc = {}
    df = {}
    for doc_id, text in rows:
        words = [w for w in text.split(' ') if w]
        if not words:
            continue
        tf = {}
        for w in words:
            tf[w] = tf.get(w, 0) + 1
        tf_by_doc[doc_id] = tf
        for w in tf:
            df[w] = df.get(w, 0) + 1
    out = []
    for doc_id, tf in tf_by_doc.items():
        acc = [0.0] * dim
        for w in sorted(tf):
            acc[word_hash(w, dim)] += tf[w] * ((n + 1.0) / (df[w] + 1.0))
        norm = math.sqrt(sum(v * v for v in acc))
        for d in range(dim):
            v = acc[d] / norm if norm > 0 else 0.0
            f32 = struct.unpack('f', struct.pack('f', v))[0]
            out.append((doc_id, d, f32))
    return out


def main():
    con = duckdb.connect()
    corpora, doc_ids, dims, vs = [], [], [], []
    for sf in SFS:
        path = f'/root/testdata/sf{sf}/documents.parquet'
        tag = con.sql(
            "SELECT md5(string_agg(doc_id || ':' || text, '|' ORDER BY doc_id)) "
            f"FROM read_parquet('{path}')").fetchone()[0]
        rows = con.sql(
            f"SELECT doc_id, text FROM read_parquet('{path}') ORDER BY doc_id"
        ).fetchall()
        for doc_id, d, v in embed_corpus(rows, DIM):
            corpora.append(tag)
            doc_ids.append(doc_id)
            dims.append(d)
            vs.append(v)
        print(f'sf{sf}: corpus={tag} rows_so_far={len(doc_ids)}')
    table = pa.table({
        'corpus': pa.array(corpora, pa.string()),
        'doc_id': pa.array(doc_ids, pa.int64()),
        'dim': pa.array(dims, pa.int32()),
        'v': pa.array(vs, pa.float32()),
    })
    pq.write_table(table, OUT)
    print(f'wrote {OUT}: {table.num_rows} rows')


if __name__ == '__main__':
    main()
