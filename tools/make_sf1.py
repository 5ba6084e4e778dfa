#!/usr/bin/env python3
"""Materialize a ~sf1 rehearsal dataset as a 10x key-shifted replica of sf0.1.

Join/group keys are shifted by a large per-replica offset so the
replica behaves like MORE data, not duplicated data (un-shifted keys
would square join outputs and collapse per-key groups). Non-key
payload columns (timestamps, text, embeddings) are kept verbatim;
schemas are preserved exactly (whatever timestamp precision the
driver shipped for events.ts rides along verbatim).

Usage: python3 tools/make_sf1.py [src_dir] [dest_dir] [copies] [tables]
Defaults: /root/testdata/sf0.1 -> /root/repo/tmp/sf1, 10 copies, all
tables. `tables` is a comma list to replicate a subset (the 100x
spot probe only needs the probed families' tables; dims always copy).
"""
import sys

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

SRC = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
DEST = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/tmp/sf1"
COPIES = int(sys.argv[3]) if len(sys.argv) > 3 else 10
ONLY = set(sys.argv[4].split(",")) if len(sys.argv) > 4 else None
OFFSET = 10_000_000_000  # far above any fixture key

# key columns to shift per table; dims (region, nation) are NOT scaled
# so dict/broadcast-join shapes stay realistic
SHIFTS = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
COPY_AS_IS = ["region", "nation"]


def shifted(table: pa.Table, keys, off: int) -> pa.Table:
    for k in keys:
        idx = table.schema.get_field_index(k)
        col = table.column(idx)
        typ = table.schema.field(idx).type
        bumped = pc.cast(pc.add(pc.cast(col, pa.int64()), off), typ)
        table = table.set_column(idx, table.schema.field(idx), bumped)
    return table


def rg_size(n_rows: int) -> int:
    # ~64 row groups per table: pyarrow's default (1Mi rows) left the
    # 30x documents replica as ONE row group — a parquet file is only
    # splittable at row-group boundaries, so every row-local documents
    # query ran as a single task however many cores were idle. Real
    # corpora are many-file/many-group; the replica must be too, or the
    # rehearsal measures the harness's layout, not the engine.
    return max(4096, n_rows // 64)


def main():
    import os

    os.makedirs(DEST, exist_ok=True)
    for name in COPY_AS_IS:
        t = pq.read_table(f"{SRC}/{name}.parquet")
        pq.write_table(t, f"{DEST}/{name}.parquet", version="2.6",
                       coerce_timestamps=None)
        print(f"{name}: {t.num_rows} rows (dim, unscaled)")
    for name, keys in SHIFTS.items():
        if ONLY is not None and name not in ONLY:
            continue
        t = pq.read_table(f"{SRC}/{name}.parquet")
        total = t.num_rows * COPIES
        rg = rg_size(total)
        # stream copy-by-copy: a 100x replica concatenated whole would
        # hold the full output in memory; the writer flushes row groups
        # as it goes and the row-group size keeps the file splittable
        with pq.ParquetWriter(f"{DEST}/{name}.parquet", t.schema,
                              version="2.6") as w:
            for i in range(COPIES):
                w.write_table(shifted(t, keys, i * OFFSET), row_group_size=rg)
        print(f"{name}: {t.num_rows} -> {total} rows "
              f"(row groups ~{max(1, total // rg)})")


if __name__ == "__main__":
    main()
