"""Generate a repo-local sf1 bench tier (~6M lineitem) by replicating
the driver's sf0.1 tables 10x with disjoint key ranges.

/root/testdata is read-only, so sf1 lands in ./benchdata/sf1
(gitignored); bench.py's scaling probe discovers it as a partner tier.

Replication preserves per-replica distributions exactly (each replica
is the sf0.1 data under shifted keys), so joins keep their fan-out and
group counts scale linearly — the properties a scaling probe needs.
Foreign keys are offset consistently on both sides (orders.o_custkey
and customer.c_custkey shift by the same stride). `documents.text`
gets a per-replica suffix on every word so replicas are NOT near-dups
of each other — otherwise minhash/LSH at sf1 would measure a synthetic
10-way duplicate explosion instead of 10x more data. nation/region are
fixed dimensions and copy through unchanged.

Usage: python tools/gen_sf1.py [src_sf_dir] [dst_dir]
"""

from __future__ import annotations

import os
import sys

import duckdb

REPLICAS = 10

# table -> {column: stride_key_table_column} ; stride = max(key)+1 at src
KEY_OFFSETS = {
    "customer": {"c_custkey": ("customer", "c_custkey")},
    "orders": {
        "o_orderkey": ("orders", "o_orderkey"),
        "o_custkey": ("customer", "c_custkey"),
    },
    "lineitem": {
        "l_orderkey": ("orders", "o_orderkey"),
        "l_partkey": ("part", "p_partkey"),
        "l_suppkey": ("supplier", "s_suppkey"),
    },
    "supplier": {"s_suppkey": ("supplier", "s_suppkey")},
    "part": {"p_partkey": ("part", "p_partkey")},
    "events": {
        "event_id": ("events", "event_id"),
        "user_id": ("events", "user_id"),
    },
    "documents": {"doc_id": ("documents", "doc_id")},
    "embeddings": {"vec_id": ("embeddings", "vec_id")},
}

COPY_THROUGH = ["region", "nation"]


def main() -> None:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    dst = sys.argv[2] if len(sys.argv) > 2 else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "benchdata", "sf1"
    )
    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()

    strides: dict[tuple[str, str], int] = {}
    for spec in KEY_OFFSETS.values():
        for key_table, key_col in spec.values():
            if (key_table, key_col) not in strides:
                (mx,) = con.execute(
                    f"SELECT max({key_col}) FROM read_parquet('{src}/{key_table}.parquet')"
                ).fetchone()
                strides[(key_table, key_col)] = int(mx) + 1

    for t in COPY_THROUGH:
        con.execute(
            f"COPY (SELECT * FROM read_parquet('{src}/{t}.parquet')) "
            f"TO '{dst}/{t}.parquet' (FORMAT PARQUET)"
        )
        print(f"{t}: copied")

    for t, spec in KEY_OFFSETS.items():
        cols = [
            r[0]
            for r in con.execute(
                f"DESCRIBE SELECT * FROM read_parquet('{src}/{t}.parquet')"
            ).fetchall()
        ]
        selects = []
        for r in range(REPLICAS):
            proj = []
            for c in cols:
                if c in spec:
                    stride = strides[spec[c]]
                    proj.append(f"{c} + {r * stride} AS {c}")
                elif t == "documents" and c == "text" and r > 0:
                    # decorrelate replica text: suffix every word
                    proj.append(
                        f"regexp_replace(text, '([a-z0-9]+)', '\\1x{r}', 'g') AS text"
                    )
                else:
                    proj.append(c)
            selects.append(
                f"SELECT {', '.join(proj)} FROM read_parquet('{src}/{t}.parquet')"
            )
        union = " UNION ALL ".join(selects)
        con.execute(f"COPY ({union}) TO '{dst}/{t}.parquet' (FORMAT PARQUET)")
        (n,) = con.execute(f"SELECT count(*) FROM read_parquet('{dst}/{t}.parquet')").fetchone()
        print(f"{t}: {n} rows")


if __name__ == "__main__":
    main()
