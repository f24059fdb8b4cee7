#!/usr/bin/env python3
"""Build a self-scaled sf1-equivalent corpus for the SCALING.md decade
audit (driver-side tooling only — never an input to the correctness
gate, whose data is the driver-generated /root/testdata).

Usage: python3 tools/make_sf1.py /root/testdata/sf0.1 /tmp/sf1 [replicas]

Scaling model (the honest 10x shape):
- documents: R replicas; replica k>0 prefixes every NON-STOPWORD token
  with 'r{k}q'. Stopwords (the q83 scorer's fixed set) stay verbatim,
  so replica docs keep their stop_ratio and the quality gate passes
  the same fraction at every decade — a fully-prefixed replica zeroed
  the stopword feature and every replica doc failed q83, collapsing
  the composed Curate.run funnel to the sf0.1 survivor set (round-9
  SCALING.md caveat). Near-dup gram spaces stay effectively disjoint:
  any 3-gram shingle containing >=1 non-stop token is replica-unique,
  and the rare all-stopword shingles shared across replicas cannot
  push a cross-replica pair near the 0.8 Jaccard gate. The similarity
  graph is R disjoint copies of the original and every planted
  near-dup structure scales linearly, exactly what a 10x-bigger crawl
  with the same duplicate density looks like. Vocabulary scales too
  (it would; a replicated-verbatim corpus instead plants R-cliques of
  exact duplicates everywhere and fakes superlinear pair growth).
- orders: R replicas with offset o_orderkey; o_custkey kept, so the
  fixed customer dimension sees 10x facts per key (dims don't scale
  with fact volume).
- events: R replicas with offset event_id/user_id — 10x users, same
  per-user activity shape, sessions scale linearly.
- embeddings: R replicas with offset vec_id and dimensions CYCLICALLY
  SHIFTED by k — a shift is an isometry, so within-replica geometry
  (every pairwise cosine) is preserved exactly, while a shifted copy
  of a random vector is uncorrelated with the original (cross-replica
  cosines stay in the random band, no fake exact-duplicate cliques).
- everything else: symlinked (dimension tables don't scale).

pyarrow round-trips the driver's physical types exactly (events.ts is
ns-precision INT64, which a SQL COPY would silently rewrite to us).
"""
import os
import sys

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

OFF = 10_000_000

# q83's scorer set (CurationOps.qualityScored) — tokens the scorer
# lowercases before matching, so the membership test lowercases too
STOPWORDS = {"the", "a", "of", "and", "to", "in", "is", "was"}


def replicate(src, dst, name, r, mutate):
    t = pq.read_table(f"{src}/{name}.parquet")
    df = t.to_pandas()
    parts = []
    for k in range(r):
        d = df.copy()
        mutate(d, k)
        parts.append(d)
    out = pa.Table.from_pandas(pd.concat(parts, ignore_index=True),
                               schema=t.schema, preserve_index=False)
    pq.write_table(out, f"{dst}/{name}.parquet", row_group_size=50_000)
    print(f"{name}: {t.num_rows} -> {out.num_rows} rows")


def main(src, dst, r):
    os.makedirs(dst, exist_ok=True)

    def docs(d, k):
        d["doc_id"] = d["doc_id"] + k * OFF
        if k:
            pref = f"r{k}q"
            d["text"] = d["text"].map(
                lambda s: " ".join(
                    tok if tok.lower() in STOPWORDS else pref + tok
                    for tok in s.split(" ")))
            d["n_chars"] = d["text"].str.len().astype("int64")

    def orders(d, k):
        d["o_orderkey"] = d["o_orderkey"] + k * OFF

    def lineitem(d, k):
        # orderkeys track the scaled orders so the fact-fact join scales;
        # supp/part keys stay dimension-fixed
        d["l_orderkey"] = d["l_orderkey"] + k * OFF

    def events(d, k):
        d["event_id"] = d["event_id"] + k * OFF
        d["user_id"] = d["user_id"] + k * OFF

    def embeddings(d, k):
        d["vec_id"] = d["vec_id"] + k * OFF
        if k:
            d["embedding"] = d["embedding"].map(
                lambda v: list(v[k % len(v):]) + list(v[:k % len(v)]))

    replicate(src, dst, "documents", r, docs)
    replicate(src, dst, "orders", r, orders)
    replicate(src, dst, "events", r, events)
    replicate(src, dst, "embeddings", r, embeddings)
    replicate(src, dst, "lineitem", r, lineitem)
    for name in ("region", "nation", "customer", "supplier", "part"):
        link = f"{dst}/{name}.parquet"
        if not os.path.exists(link):
            os.symlink(f"{src}/{name}.parquet", link)


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2], int(sys.argv[3]) if len(sys.argv) > 3 else 10)
