"""Synthesize an sf1-equivalent dataset by unioning 10 key-shifted
copies of sf0.1 (tools for the README scaling-curve decade; the driver
only ships sf0.001/0.01/0.1). Each copy shifts every key / foreign-key
column by ``i * (max_key + 1)`` with ONE consistent stride per key
domain, so intra-copy join integrity is preserved exactly and the union
behaves like a 10× larger TPC-H-ish instance. Dimension tables
region/nation stay fixed (as in TPC-H, their size is scale-invariant),
so nationkey/regionkey references are NOT shifted. String ids
(documents/embeddings) are prefixed per copy.

Usage: python tools/gen_sf1.py [src_dir] [dst_dir] [factor] [--unique-docs]

``--unique-docs`` (round 9): salt each copy's document text (one
appended per-copy/per-row token) and rotate each copy's embedding
vectors by ``i`` positions. Without it, every copy is a byte-identical
duplicate of sf0.1's corpus, so the dedup/ANN family's sf1 scaling rows
measure a 100%-duplicate pathology (quadratic dup-pair blowup inside
LSH buckets) rather than row growth; with it, copies are unique and the
same rows measure pure scale. Rotation preserves norms and the value
distribution exactly while decorrelating copies, so ANN bucket
occupancy stays realistic. Both regimes are worth a README column.

Defaults: /root/testdata/sf0.1 -> <repo>/.sfbench/sf1, factor 10.
"""

from __future__ import annotations

import os
import sys

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# key domain -> (table, column) members sharing one stride
KEY_DOMAINS = {
    "custkey": [("customer", "c_custkey"), ("orders", "o_custkey")],
    "orderkey": [("orders", "o_orderkey"), ("lineitem", "l_orderkey")],
    "partkey": [("part", "p_partkey"), ("lineitem", "l_partkey")],
    "suppkey": [("supplier", "s_suppkey"), ("lineitem", "l_suppkey")],
    "eventid": [("events", "event_id")],
    "userid": [("events", "user_id")],
    "vecid": [("embeddings", "vec_id")],
    "docid": [("documents", "doc_id")],
}
STRING_IDS: dict[str, str] = {}  # all ids in this layout are numeric
FIXED_TABLES = ("region", "nation")
SCALED_TABLES = (
    "customer",
    "orders",
    "lineitem",
    "part",
    "supplier",
    "events",
    "documents",
    "embeddings",
)


def _salt_documents(tt: pa.Table, i: int) -> pa.Table:
    """Append a deterministic per-copy/per-row token to ``text`` so
    copy i is not an exact (or near-) duplicate of copy 0."""
    idx = tt.column_names.index("text")
    salt = pc.binary_join_element_wise(
        pc.cast(tt["text"], pa.string()),
        pa.array([f" u{i}x"] * tt.num_rows),
        pc.cast(tt["doc_id"], pa.string()),
        "",
    )
    return tt.set_column(idx, pa.field("text", pa.string()), salt)


def _rotate_embeddings(tt: pa.Table, i: int) -> pa.Table:
    """Rotate each embedding vector left by ``i`` positions: unique per
    copy, identical norms/value distribution (list layout preserved)."""
    idx = tt.column_names.index("embedding")
    col = tt["embedding"].combine_chunks()
    vecs = col.to_pylist()
    rot = [v[i % len(v):] + v[: i % len(v)] if v else v for v in vecs]
    arr = pa.array(rot, type=col.type)
    return tt.set_column(idx, tt.schema.field("embedding"), arr)


def main(src: str, dst: str, factor: int, unique_docs: bool = False) -> None:
    os.makedirs(dst, exist_ok=True)
    tables = {
        t: pq.read_table(os.path.join(src, f"{t}.parquet"))
        for t in FIXED_TABLES + SCALED_TABLES
    }
    strides: dict[tuple[str, str], int] = {}
    for members in KEY_DOMAINS.values():
        stride = 0
        for t, col in members:
            if col in tables[t].column_names:
                stride = max(
                    stride, pc.max(tables[t][col]).as_py() or 0
                )
        stride += 1
        for t, col in members:
            strides[(t, col)] = stride

    for t in FIXED_TABLES:
        pq.write_table(tables[t], os.path.join(dst, f"{t}.parquet"))
        print(f"{t}: {tables[t].num_rows} rows (fixed)")

    for t in SCALED_TABLES:
        base = tables[t]
        copies = []
        for i in range(factor):
            tt = base
            for (tbl, col), stride in strides.items():
                if tbl == t and i > 0:
                    idx = tt.column_names.index(col)
                    shifted = pc.add(tt[col], pa.scalar(i * stride, tt.schema.field(col).type))
                    tt = tt.set_column(idx, tt.schema.field(col), shifted)
            if t in STRING_IDS and i > 0:
                col = STRING_IDS[t]
                idx = tt.column_names.index(col)
                pref = pc.binary_join_element_wise(
                    pa.array([f"c{i}_"] * tt.num_rows), pc.cast(tt[col], pa.string()), ""
                )
                tt = tt.set_column(idx, pa.field(col, pa.string()), pref)
            if unique_docs and i > 0:
                if t == "documents":
                    tt = _salt_documents(tt, i)
                elif t == "embeddings":
                    tt = _rotate_embeddings(tt, i)
            copies.append(tt)
        out = pa.concat_tables(copies, promote_options="default")
        pq.write_table(out, os.path.join(dst, f"{t}.parquet"))
        print(f"{t}: {base.num_rows} -> {out.num_rows} rows")


if __name__ == "__main__":
    argv = [a for a in sys.argv[1:] if a != "--unique-docs"]
    unique = "--unique-docs" in sys.argv[1:]
    src = argv[0] if len(argv) > 0 else "/root/testdata/sf0.1"
    dst = (
        argv[1]
        if len(argv) > 1
        else os.path.join(
            REPO, ".sfbench", "sf1u" if unique else "sf1"
        )
    )
    factor = int(argv[2]) if len(argv) > 2 else 10
    main(src, dst, factor, unique_docs=unique)
