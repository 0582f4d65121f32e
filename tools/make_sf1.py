#!/usr/bin/env python3
"""Generate an sf1 (~10x sf0.1) dataset by key-shifted replication.

Usage: python3 tools/make_sf1.py [srcDir] [dstDir] [replicas]
Defaults: /root/testdata/sf0.1 -> /root/repo/testdata-sf1, 10 replicas.

Deterministic, schema- and physical-type-preserving (pyarrow round-trip
keeps events.ts as TIMESTAMP(NANOS), which the Spark side reads via
nanosAsLong and DuckDB truncates to us -- both engines must keep seeing
the exact same physical type they see in the driver's tables).

Replica i shifts every primary/foreign key by i * (max(key)+1) so
referential integrity holds corpus-wide. Dimension tables (region,
nation) stay fixed, like TPC-H scaling. Document text is word-rotated
per replica so the corpus grows with mostly-novel shingle sets instead
of 9 exact twins per doc (which would make every dedup query an
unrealistic all-duplicates stress test); n_chars is recomputed to stay
consistent with the rebuilt text. Embedding vectors are copied verbatim
under shifted ids: near-dup and ANN behavior at sf1 then includes the
exact-twin regime as well.

Dev-only tooling (like local_check.py): the shipped Scala library has
no Python dependency.
"""
import sys
import pyarrow as pa
import pyarrow.parquet as pq


def shift(col: pa.ChunkedArray, by: int) -> pa.Array:
    import pyarrow.compute as pc
    return pc.add(col, pa.scalar(by, type=col.type))


def rotate_text(t: pa.Table, i: int) -> pa.Table:
    if i == 0:
        return t
    texts = t.column("text").to_pylist()
    rotated, n_chars = [], []
    for s in texts:
        w = s.split()
        k = i % len(w) if w else 0
        r = " ".join(w[k:] + w[:k])
        rotated.append(r)
        n_chars.append(len(r))
    t = t.set_column(t.schema.get_field_index("text"),
                     t.schema.field("text"), pa.array(rotated, type=pa.string()))
    t = t.set_column(t.schema.get_field_index("n_chars"),
                     t.schema.field("n_chars"), pa.array(n_chars, type=pa.int64()))
    return t


def main(src: str, dst: str, replicas: int) -> None:
    import os
    os.makedirs(dst, exist_ok=True)
    # key -> shift-group: columns in the same group shift by the same base
    # (foreign keys must move in lockstep with their primary key)
    plans = {
        "region":   {},
        "nation":   {},
        "customer": {"c_custkey": "cust"},
        "supplier": {"s_suppkey": "supp"},
        "part":     {"p_partkey": "part"},
        "orders":   {"o_orderkey": "ord", "o_custkey": "cust"},
        "lineitem": {"l_orderkey": "ord", "l_partkey": "part", "l_suppkey": "supp"},
        "events":   {"event_id": "ev", "user_id": "user"},
        "documents": {"doc_id": "doc"},
        "embeddings": {"vec_id": "vec"},
    }
    # shared shift bases across tables so FKs stay aligned
    shared: dict = {}
    for name, keys in plans.items():
        table = pq.read_table(f"{src}/{name}.parquet")
        if not keys:  # fixed dimensions
            pq.write_table(table, f"{dst}/{name}.parquet")
            print(f"{name}: {table.num_rows} rows (dimension, copied)")
            continue
        for c, group in keys.items():
            if group not in shared:
                shared[group] = max(table.column(c).to_pylist()) + 1
        out = []
        for i in range(replicas):
            t = table
            for c, group in keys.items():
                idx = t.schema.get_field_index(c)
                t = t.set_column(idx, t.schema.field(c),
                                 shift(t.column(c), i * shared[group]))
            if name == "documents":
                t = rotate_text(t, i)
            out.append(t)
        merged = pa.concat_tables(out)
        pq.write_table(merged, f"{dst}/{name}.parquet")
        print(f"{name}: {table.num_rows} -> {merged.num_rows} rows")


if __name__ == "__main__":
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    dst = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/testdata-sf1"
    n = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    main(src, dst, n)
