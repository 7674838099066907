"""Regenerate sf0.001 testdata under ALTERNATE physical dtypes.

The environment changed `events.ts` from TIMESTAMP(NANOS)-as-long to
timestamp[us] between rounds and silently broke four queries. This
tool materializes the *other* plausible physical encodings of the same
logical data so tests can pin every query dtype-robust:

- events.ts        → int64 nanoseconds   (round-1 encoding)
- orders.o_orderdate → date32            (plausible date encoding)
- embeddings.embedding → list<double>    (float64 instead of float32)

Unchanged tables are symlinked. Usage:

    python tools/regen_alt_dtypes.py [src_dir] [dst_dir]

Defaults: /root/testdata/sf0.001 → /tmp/spark_graft_altdtypes
"""

from __future__ import annotations

import os
import sys

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def regen(src_dir: str, dst_dir: str) -> str:
    os.makedirs(dst_dir, exist_ok=True)

    for name in TABLES:
        src = f"{src_dir}/{name}.parquet"
        dst = f"{dst_dir}/{name}.parquet"
        if os.path.lexists(dst):
            if os.path.islink(dst):
                os.unlink(dst)
            else:
                os.remove(dst)
        if name == "events":
            t = pq.read_table(src)
            ts = t.column("ts")
            # timestamp[us] -> int64 us -> int64 ns (round-1 encoding)
            nanos = pc.multiply(ts.cast(pa.int64()), pa.scalar(1000, pa.int64()))
            t = t.set_column(t.schema.get_field_index("ts"), "ts", nanos)
            pq.write_table(t, dst)
        elif name == "orders":
            t = pq.read_table(src)
            od = t.column("o_orderdate").cast(pa.date32())
            t = t.set_column(
                t.schema.get_field_index("o_orderdate"), "o_orderdate", od
            )
            pq.write_table(t, dst)
        elif name == "embeddings":
            t = pq.read_table(src)
            emb = t.column("embedding").cast(pa.list_(pa.float64()))
            t = t.set_column(t.schema.get_field_index("embedding"), "embedding", emb)
            pq.write_table(t, dst)
        else:
            os.symlink(os.path.abspath(src), dst)
    return dst_dir


if __name__ == "__main__":
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    dst = sys.argv[2] if len(sys.argv) > 2 else "/tmp/spark_graft_altdtypes"
    print(regen(src, dst))
