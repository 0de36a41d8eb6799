#!/usr/bin/env python3
"""Adversarial dup-heavy / hot-key fixture (driver-side; NOT shipped).
Usage: python3 tools/make_skewed.py [src_dir] [dst_dir]
Defaults: src /root/repo/target/sf1 (build with make_sf1.py first),
dst /root/repo/target/sf1skew.

make_sf1.py deliberately makes every copy DISTINCT, so the dedup family has
only ever been measured on data with no duplicate mass — the opposite of
the input it exists for. This generator plants, deterministically:

documents (by doc_id % 10):
  - 6,7,8 (30%): EXACT duplicates — text+lang replaced by one of 100 source
    docs (cycled), so q18/q44 see ~30% dup mass in ~100 groups of ~150;
  - 3,4,5 (30%): a fixed 8-token boilerplate span prepended — all of its
    windows are corpus-duplicated (q74's hot-gram path) and each of its 8
    tokens becomes a mega-key in ~30% of docs, ~10x hotter than the
    reference corpus's "the" (3.7%), for q01b's salted collect;
  - 9 (10%): ONE giant near-dup star — a copy of a single >=40-token base
    doc with one id-dependent token edit (29 distinct variants, 3-gram
    Jaccard vs base ~0.89; variant-variant ~0.79 stays below the 0.8
    threshold so the cluster is a star through the base).

embeddings:
  - vec_id % 10 == 9 (10%): ONE giant cosine clique — base vector plus a
    tiny deterministic one-coordinate jitter (pairwise cosine ~1 >> 0.35),
    so q48 emits ~C(n/10, 2) edges and q56 resolves one giant component;
  - the LAST 63 rows: a PATH graph v_i = (e_i + e_{i+1})/sqrt(2) over the
    64 coords — consecutive cosine 0.5 >= 0.35, non-consecutive 0.0 — so
    the component graph has diameter 62 and the pointer-jumped CC must
    close it in O(log 62) rounds, not 62.

All other tables are copied through unchanged.
"""
import os
import sys

import pyarrow as pa
import pyarrow.parquet as pq

BOILER = "terms of service apply all rights reserved worldwide"  # 8 tokens

COPY = ["region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events"]


def skew_documents(t):
    ids = t["doc_id"].to_pylist()
    texts = t["text"].to_pylist()
    langs = t["lang"].to_pylist()
    sources = [i for i, d in enumerate(ids) if d % 10 in (0, 1, 2)][:100]
    base_row = next(i for i, d in enumerate(ids)
                    if d % 10 == 0 and len(texts[i].split()) >= 40)
    base_toks = texts[base_row].split()
    for i, d in enumerate(ids):
        m = d % 10
        if m in (6, 7, 8):
            s = sources[i % len(sources)]
            texts[i] = texts[s]
            langs[i] = langs[s]
        elif m in (3, 4, 5):
            texts[i] = BOILER + " " + texts[i]
        elif m == 9:
            v = i % 29
            toks = list(base_toks)
            toks[5 + v] = f"edit{v}"
            texts[i] = " ".join(toks)
            langs[i] = langs[base_row]
    cols = {
        "doc_id": t["doc_id"],
        "text": pa.array(texts, type=t.schema.field("text").type),
        "lang": pa.array(langs, type=t.schema.field("lang").type),
        "source": t["source"],
        "n_chars": pa.array([len(x) for x in texts], type=pa.int64()),
    }
    return pa.table(cols, schema=t.schema)


def skew_embeddings(t):
    ids = t["vec_id"].to_pylist()
    vecs = t["embedding"].to_pylist()
    dim = len(vecs[0])
    base = list(vecs[next(i for i, d in enumerate(ids) if d % 10 == 0)])
    for i, d in enumerate(ids):
        if d % 10 == 9:
            v = list(base)
            v[d % dim] += ((d * 7) % 13 - 6) * 1e-3
            vecs[i] = v
    inv = 2 ** -0.5
    for k in range(min(63, len(ids))):  # path graph on the last 63 rows
        row = len(ids) - 63 + k
        v = [0.0] * dim
        v[k] = inv
        v[k + 1] = inv
        vecs[row] = v
    emb = pa.array(vecs, type=t.schema.field("embedding").type)
    return t.set_column(t.schema.get_field_index("embedding"), "embedding", emb)


def skew_events(t):
    """Dup-heavy event stream (round 9): event_id % 10 in (6,7,8,9) (40%)
    becomes an exact DUPLICATE of the id%10==0 event of its decade —
    event_id/user_id/event_type/value/props copied, ts = source ts + a few
    seconds (well inside the 2 h dedup watermark, so
    dropDuplicatesWithinWatermark MUST suppress every one). Distinct
    event_ids therefore = 60% of rows, and the drained q61 replay must
    equal that count while state stays O(distinct), not O(rows).
    """
    # ts handled as raw int64 nanos: datetime round-trips truncate ns
    cols = {name: (t[name].cast(pa.int64()) if name == "ts"
                   else t[name]).to_pylist()
            for name in t.schema.names}
    ids = cols["event_id"]
    idx_of = {d: i for i, d in enumerate(ids)}
    ns = 1_000_000_000
    for i, d in enumerate(ids):
        m = d % 10
        if m in (6, 7, 8, 9):
            s = idx_of.get(d - m)
            if s is None:
                continue
            for name in t.schema.names:
                if name != "ts":
                    cols[name][i] = cols[name][s]
            cols["ts"][i] = cols["ts"][s] + (m - 5) * ns  # +1..+4 s later
    out = {}
    for n in t.schema.names:
        if n == "ts":
            out[n] = pa.array(cols[n], type=pa.int64()).cast(
                t.schema.field(n).type)
        else:
            out[n] = pa.array(cols[n], type=t.schema.field(n).type)
    return pa.table(out, schema=t.schema)


def main():
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/target/sf1"
    dst = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/target/sf1skew"
    os.makedirs(dst, exist_ok=True)
    for name in COPY:
        if name == "events":
            continue
        t = pq.read_table(os.path.join(src, f"{name}.parquet"))
        pq.write_table(t, os.path.join(dst, f"{name}.parquet"))
    d = pq.read_table(os.path.join(src, "documents.parquet"))
    pq.write_table(skew_documents(d), os.path.join(dst, "documents.parquet"))
    e = pq.read_table(os.path.join(src, "embeddings.parquet"))
    pq.write_table(skew_embeddings(e), os.path.join(dst, "embeddings.parquet"))
    ev = pq.read_table(os.path.join(src, "events.parquet"))
    pq.write_table(skew_events(ev), os.path.join(dst, "events.parquet"))
    print(f"skewed fixture at {dst}: documents {d.num_rows}, "
          f"embeddings {e.num_rows}, events {ev.num_rows} (40% dup ids)")


if __name__ == "__main__":
    main()
