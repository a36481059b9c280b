"""Clustered-geometry embeddings fixture (VERDICT r15 item 5).

The synthetic /root/testdata embeddings are near-uniform on the
sphere: pairwise distances concentrate, so EVERY metric-pruning lever
looks useless on them — ROUTED_ASSIGN_r14 measured all-cells-probed,
the r13 PQ prescreen nulled out, and the ANN recall curves stay
unrealistically flat. Real text/image embeddings are the opposite
regime: a mixture of semantic bumps. This writes that regime as a
drop-in fixture directory (embeddings.parquet with the exact testdata
schema: vec_id int64, embedding list<float32>[64], label int32 = the
true mixture component), so registry callables (ann_recall_frontier,
ann_recall_report) and tools/routed_assign_bench.py run against it
unchanged.

Deterministic: fixed PCG64 seed; regenerating reproduces the bytes.

Usage: python tools/make_clustered.py [out_dir] [n] [n_centers] [sigma]
Defaults: /tmp/testdata_clustered 20000 64 0.05
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

OUT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/testdata_clustered"
N = int(sys.argv[2]) if len(sys.argv) > 2 else 20000
C = int(sys.argv[3]) if len(sys.argv) > 3 else 64
SIGMA = float(sys.argv[4]) if len(sys.argv) > 4 else 0.05
DIMS = 64


def main() -> None:
    rng = np.random.default_rng(7)
    centers = rng.normal(size=(C, DIMS))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    label = rng.integers(0, C, size=N)
    pts = centers[label] + SIGMA * rng.normal(size=(N, DIMS))
    os.makedirs(OUT, exist_ok=True)
    table = pa.table(
        {
            "vec_id": pa.array(range(N), type=pa.int64()),
            "embedding": pa.array(
                pts.astype(np.float32).tolist(),
                type=pa.list_(pa.float32()),
            ),
            "label": pa.array(label.astype(np.int32), type=pa.int32()),
        }
    )
    path = f"{OUT}/embeddings.parquet"
    pq.write_table(table, path)
    print(
        f"{path}: {N} vectors, {C} Gaussian bumps, sigma={SIGMA}, "
        f"dims={DIMS}"
    )


if __name__ == "__main__":
    main()
