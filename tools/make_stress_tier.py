"""Build the sf1 numeric-stress parity tier (VERDICT r03 item 5).

/root/testdata is read-only and tops out at sf0.1, so this derives a 10x
tier by deterministic id-shifted replication of sf0.1: fact tables
(lineitem, orders, events, documents, embeddings) are written K times with
their primary ids shifted by k * 10^12 per copy (keys stay unique and
FK pairs — l_orderkey/o_orderkey — shift together); dimension tables are
copied as-is. Values are NOT perturbed: the point is 10x the rows and 10x
the aggregate magnitudes feeding the same float/decimal paths, which is
exactly the class that produced the two sf0.1 exactness bugs fixed in
commit dbb7b90. Both engines read the same derived files, so the parity
contract is unchanged.

Usage: python tools/make_stress_tier.py [dest_dir] [K]
Default dest: <repo>/.stress/sf1, K=10. Output is one parquet FILE per
table (pyarrow, not Spark dirs) so DuckDB's read_parquet sees it directly.
"""

from __future__ import annotations

import sys
from pathlib import Path

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"
SHIFT = 10**12  # far above any sf0.1 key, far below int64 overflow at K=10

DIMS = ["region", "nation", "customer", "supplier", "part"]
# table -> id columns shifted per copy (FK pairs shift together)
FACTS = {
    "orders": ["o_orderkey"],
    "lineitem": ["l_orderkey"],
    "events": ["event_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}


def main() -> None:
    dest = Path(sys.argv[1]) if len(sys.argv) > 1 else (
        Path(__file__).resolve().parent.parent / ".stress" / "sf1"
    )
    k_copies = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    dest.mkdir(parents=True, exist_ok=True)

    for t in DIMS:
        tbl = pq.read_table(f"{SRC}/{t}.parquet")
        pq.write_table(tbl, dest / f"{t}.parquet")
        print(f"{t}: {tbl.num_rows} rows (copied)")

    for t, id_cols in FACTS.items():
        base = pq.read_table(f"{SRC}/{t}.parquet")
        copies = []
        for k in range(k_copies):
            c = base
            if k:  # copy 0 is the original ids
                for col in id_cols:
                    shifted = pc.add(c[col], pa.scalar(k * SHIFT, c.schema.field(col).type))
                    c = c.set_column(c.schema.get_field_index(col), col, shifted)
            copies.append(c)
        out = pa.concat_tables(copies)
        pq.write_table(out, dest / f"{t}.parquet")
        print(f"{t}: {base.num_rows} -> {out.num_rows} rows (x{k_copies})")


if __name__ == "__main__":
    main()
