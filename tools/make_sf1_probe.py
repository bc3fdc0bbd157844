"""Build a deterministic sf1-scale PROBE dataset (10× sf0.1) for the
SCALE.md data-term measurements (VERDICT r3 #7).

local[32] at sf0.1 is fixed-cost-dominated (round-3 scaling: 1.36×
total on 10× data), so the DATA terms the 100 TB claims rest on are
largely unmeasured below sf1. The driver ships no sf1 tables, so this
tool synthesizes one FOR TIMING ONLY — correctness stays gated on the
driver's own sf0.01 parquet; nothing here feeds an oracle.

Construction: 10 key-shifted copies of every sf0.1 table, with
per-copy transforms chosen so each operator family's WORK scales the
way a real 10× corpus would — i.e. linearly in rows, not
quadratically in cross-copy duplicate pairs:

- keys (orderkey, suppkey, partkey, custkey, doc_id, vec_id) shift by
  copy·max_key — copies are disjoint subgraphs (10× suppliers/parts
  is the affinity-graph null model);
- document text: every word in copy c>0 gets a `~c` suffix — shingle
  sets are disjoint across copies, so near-dup density per copy is
  preserved and total dup pairs grow linearly (identical copies would
  instead make every text a 10-way cross-copy duplicate: a 45×
  quadratic pair explosion that measures a corpus no one has);
- embeddings: copy c applies a deterministic per-dimension ±1 sign
  pattern (hash(dim, c)) — an ORTHOGONAL transform, so all
  within-copy cosines/distances are exactly preserved while
  cross-copy cosines collapse toward 0 (no cross-copy near-dups).

Usage: python tools/make_sf1_probe.py [out_dir]   (default /tmp/sf1_probe)
"""

from __future__ import annotations

import hashlib
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from bigdata06_spark.session import get_spark

SRC = "/root/testdata/sf0.1"
COPIES = 10

KEY_SHIFTS = {
    "lineitem": ["l_orderkey", "l_suppkey", "l_partkey", "l_custkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "customer": ["c_custkey", "c_nationkey0"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
    "events": ["event_id", "user_id"],
}


def _sign_pattern(dim: int, copy: int) -> list[int]:
    # deterministic ±1 per (dimension, copy); copy 0 is identity
    if copy == 0:
        return [1] * dim
    out = []
    for d in range(dim):
        h = hashlib.sha256(f"{d}:{copy}".encode()).digest()[0]
        out.append(1 if h % 2 else -1)
    return out


def main() -> None:
    out_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1_probe"
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("make_sf1_probe")

    for t in ["region", "nation"]:
        spark.read.parquet(f"{SRC}/{t}.parquet").write.mode("overwrite").parquet(
            f"{out_dir}/{t}.parquet"
        )

    for t, keys in KEY_SHIFTS.items():
        df = spark.read.parquet(f"{SRC}/{t}.parquet")
        keys = [k for k in keys if k in df.columns]
        shifts = {k: df.agg(F.max(k)).first()[0] + 1 for k in keys}
        copies = []
        for c in range(COPIES):
            cp = df
            for k in keys:
                cp = cp.withColumn(k, F.col(k) + F.lit(c * shifts[k]))
            if t == "documents" and c > 0:
                # per-copy word suffix → disjoint shingle space
                cp = cp.withColumn(
                    "text",
                    F.array_join(
                        F.transform(
                            F.split(F.col("text"), " "),
                            lambda w: F.concat(w, F.lit(f"~{c}")),
                        ),
                        " ",
                    ),
                )
            if t == "embeddings" and c > 0:
                dim = len(df.select("embedding").first()[0])
                signs = F.array(
                    *[F.lit(float(s)) for s in _sign_pattern(dim, c)]
                )
                cp = cp.withColumn(
                    "embedding",
                    F.zip_with(
                        F.col("embedding"), signs, lambda x, s: (x * s).cast("float")
                    ),
                )
            copies.append(cp)
        out = copies[0]
        for cp in copies[1:]:
            out = out.unionByName(cp)
        out.repartition(32).write.mode("overwrite").parquet(f"{out_dir}/{t}.parquet")
        print(f"{t}: {COPIES}x written", file=sys.stderr)
    print(out_dir)


if __name__ == "__main__":
    main()
