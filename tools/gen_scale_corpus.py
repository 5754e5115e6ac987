#!/usr/bin/env python3
"""Seed-deterministic scale-probe corpora for SCALING.md's measured
section: same shape as the driver's sf0.1 `documents`/`embeddings`
tables (word-salad text over a small vocabulary, 20 sources, ~4%
planted duplicates; 64-dim float vectors with labels) but at an
arbitrary multiple, written under /tmp (testdata is read-only).

Usage: python3 tools/gen_scale_corpus.py <scale> [outdir]
  scale 1  ->  5,000 docs /  2,000 vectors (the sf0.1 shape)
  scale 10 -> 50,000 docs / 20,000 vectors

Same seed at every scale, and scale N's first 5,000*k docs equal scale
k's docs for k<N is NOT guaranteed (sizes feed the generator), but each
(scale, seed) pair is fully reproducible.
"""
import sys
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

scale = int(sys.argv[1]) if len(sys.argv) > 1 else 10
out = sys.argv[2] if len(sys.argv) > 2 else f"/tmp/scale{scale}"
ndocs, nvec = 5000 * scale, 2000 * scale
rng = np.random.default_rng(42)

vocab = np.array([
    "key", "agg", "row", "scan", "slow", "fast", "table", "value",
    "part", "hash", "merge", "batch", "spark", "a", "the", "window",
    "order", "data", "column", "join", "small", "line", "customer",
    "query", "filter", "sort", "stream", "group", "big", "vector"])

lens = rng.integers(8, 100, size=ndocs)
texts = [" ".join(rng.choice(vocab, size=int(n))) for n in lens]
# plant ~4% exact duplicates (the dedup families need positives)
for i in range(0, ndocs, 25):
    texts[int(rng.integers(0, ndocs))] = texts[i]

import os
os.makedirs(out, exist_ok=True)
pq.write_table(pa.table({
    "doc_id": pa.array(range(ndocs), pa.int64()),
    "text": pa.array(texts),
    "lang": pa.array(["en"] * ndocs),
    "source": pa.array([f"src{i % 20}" for i in range(ndocs)]),
    "n_chars": pa.array([len(t) for t in texts], pa.int64()),
}), f"{out}/documents.parquet")

emb = rng.normal(size=(nvec, 64)).astype("float32")
# plant ~1% near-duplicate vectors (tiny perturbations of earlier rows)
# so the near-dup detectors have positives to find at every scale
for i in range(0, nvec, 100):
    j = int(rng.integers(0, nvec))
    emb[j] = emb[i] + rng.normal(scale=0.01, size=64).astype("float32")
pq.write_table(pa.table({
    "vec_id": pa.array(range(nvec), pa.int64()),
    "embedding": pa.array(list(emb), pa.list_(pa.float32())),
    "label": pa.array((rng.integers(0, 10, size=nvec)).astype("int32")),
}), f"{out}/embeddings.parquet")

print(f"wrote {out}: {ndocs} docs, {nvec} vectors")
