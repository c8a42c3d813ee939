#!/usr/bin/env python3
"""Generate a sf1-equivalent rehearsal dataset (10x sf0.1) for the
ceiling-query scale rehearsal (round-9 verdict item #3).

Deterministic (seed 43), statistically shaped like the driver's
sf0.1 tables (measured: 31-word vocab, 10-100 tokens/doc, langs
~{en 41%, zh/es/fr/de ~15%}, uniform src0..src19, ~0.16% exact-dup
groups; embeddings dim-64 float with 10 labels; events over 30 days,
uniform users/types).  Writes documents/embeddings/events parquet to
the target dir (default /tmp/graft_sf1).  events.ts is written as
parquet TIMESTAMP(NANOS) to exercise the same graft.Tables.events
nano-floor path as the driver's files.

Usage: python3 tools/gen_sf1.py [outdir] [scale] [vocab] [tables]
  tables: comma list of {documents,embeddings,events} (default all) —
  e.g. "documents" for the x73 blocking-crossover A/B corpora, where
  only the media lens runs and events at scale 400 would be 40M
  useless rows.
  scale 10 (default) = 50k docs / 20k embeddings / 1M events.
  vocab 31 (default) mirrors the driver corpus EXACTLY — including its
  degenerate near-dup density: with 31 words and 10-100 tokens/doc,
  long docs' token SETS converge on the whole vocabulary, and ~20%% of
  ALL doc pairs sit at unigram-jaccard >= 0.8 (measured on the
  driver's own sf0.1: 22.5%% sampled hit-rate).  Any pairwise-dup
  query's TRUE output is then quadratic in the corpus.  Pass a larger
  vocab (Heaps-law growth, e.g. 98 = 31*sqrt(10) at scale 10) for a
  corpus whose pair density stays bounded — the rehearsal that
  measures PLAN scaling instead of output-size scaling.
"""
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

OUT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/graft_sf1"
SCALE = float(sys.argv[2]) if len(sys.argv) > 2 else 10.0  # x sf0.1
VOCAB_N = int(sys.argv[3]) if len(sys.argv) > 3 else 31

rng = np.random.default_rng(43)

BASE_VOCAB = (
    "spark batch sort column line order part small fast value scan hash "
    "slow group agg filter query big key window row table stream merge "
    "data a join scale plan shuffle node").split()
assert len(BASE_VOCAB) == 31
VOCAB = np.array(BASE_VOCAB +
                 [f"w{i}" for i in range(max(0, VOCAB_N - 31))])[:VOCAB_N]
LANGS = np.array(["en", "zh", "es", "fr", "de"])
LANG_P = np.array([0.41, 0.15, 0.15, 0.15, 0.14])

N_DOCS = int(5000 * SCALE)
N_VECS = int(2000 * SCALE)
N_EVENTS = int(100000 * SCALE)
N_USERS = int(1500 * SCALE)


def gen_documents():
    lens = rng.integers(10, 101, N_DOCS)
    texts = []
    for n in lens:
        texts.append(" ".join(VOCAB[rng.integers(0, len(VOCAB), n)]))
    # seeded duplicate structure, scaled from sf0.1's ~8 groups/5000:
    # exact copies plus near-copies (1-3 token swaps = small edit dist)
    n_groups = max(8, int(8 * SCALE))
    for g in range(n_groups):
        base = rng.integers(0, N_DOCS)
        # one exact copy
        texts[rng.integers(0, N_DOCS)] = texts[base]
        # one near copy: swap up to 3 tokens in place
        toks = texts[base].split(" ")
        for _ in range(int(rng.integers(1, 4))):
            toks[rng.integers(0, len(toks))] = VOCAB[rng.integers(0, len(VOCAB))]
        texts[rng.integers(0, N_DOCS)] = " ".join(toks)
    langs = rng.choice(LANGS, N_DOCS, p=LANG_P)
    sources = np.array([f"src{i % 20}" for i in range(N_DOCS)])
    rng.shuffle(sources)
    tbl = pa.table({
        "doc_id": pa.array(np.arange(N_DOCS), pa.int64()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(langs, pa.string()),
        "source": pa.array(sources, pa.string()),
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    })
    pq.write_table(tbl, f"{OUT}/documents.parquet")


def gen_embeddings():
    labels = rng.integers(0, 10, N_VECS)
    centers = rng.normal(0, 1, (10, 64)).astype(np.float32)
    vecs = centers[labels] + rng.normal(0, 0.6, (N_VECS, 64)).astype(
        np.float32)
    tbl = pa.table({
        "vec_id": pa.array(np.arange(N_VECS), pa.int64()),
        "embedding": pa.array(list(vecs.astype(np.float32)),
                              pa.list_(pa.float32())),
        "label": pa.array(labels, pa.int32()),
    })
    pq.write_table(tbl, f"{OUT}/embeddings.parquet")


def gen_events():
    base_ns = np.datetime64("2024-01-01T00:00:00", "ns").astype(np.int64)
    span_ns = 30 * 24 * 3600 * 10**9
    ts = np.sort(base_ns + (rng.random(N_EVENTS) * span_ns).astype(np.int64))
    types = rng.choice(
        np.array(["click", "view", "purchase", "signup", "error"]), N_EVENTS)
    tbl = pa.table({
        "event_id": pa.array(np.arange(N_EVENTS), pa.int64()),
        "ts": pa.array(ts, pa.timestamp("ns")),
        "user_id": pa.array(rng.integers(0, N_USERS, N_EVENTS), pa.int64()),
        "event_type": pa.array(types, pa.string()),
        "value": pa.array(np.round(rng.random(N_EVENTS) * 100, 3),
                          pa.float64()),
        "props": pa.array([f'{{"k":{i % 7}}}' for i in range(N_EVENTS)],
                          pa.string()),
    })
    # version 2.6 + no coercion keeps TIMESTAMP(NANOS), matching the
    # driver files (graft.Tables.events depends on it)
    pq.write_table(tbl, f"{OUT}/events.parquet", version="2.6",
                   coerce_timestamps=None)


if __name__ == "__main__":
    import os
    os.makedirs(OUT, exist_ok=True)
    tables = (sys.argv[4].split(",") if len(sys.argv) > 4
              else ["documents", "embeddings", "events"])
    if "documents" in tables:
        gen_documents()
    if "embeddings" in tables:
        gen_embeddings()
    if "events" in tables:
        gen_events()
    print(f"wrote {OUT} tables={tables}: docs={N_DOCS} vecs={N_VECS} "
          f"events={N_EVENTS}")
