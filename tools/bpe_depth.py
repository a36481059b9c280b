"""BPE induction at production vocabulary depth (round-11 verdict
item 6): drive ``induce_bpe_batched`` to a 2-4k-merge vocabulary at
sf0.1 and record what the per-round collect discipline actually costs
at depth — corpus rounds taken, wall time, merges landed per round,
and the vocab-grain state size (distinct word types and total
segmentation characters) the checkpoint loop carries.

Exactness at depth is covered separately: the hypothesis suite
(tests/test_round6_properties.py) replays batched-vs-sequential
equality at batch widths up to 256, and the proof sketch in
extensions/bpe.py (strict-boundary disjoint prefix == sequential
greedy) is width-independent. This script is the SCALE evidence:
rounds ~= n_merges / effective-batch, each round touching only the
(token, cnt, s) vocabulary table, never the corpus.

Usage: python tools/bpe_depth.py [sf_dir] [n_merges] [batch_max] [out]
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402


def main() -> None:
    from timeseries_spark.extensions.bpe import (
        _disjoint_prefix,
        _pair_counts,
        _vocab,
    )
    from timeseries_spark.queries import load
    from timeseries_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    n_merges = int(sys.argv[2]) if len(sys.argv) > 2 else 3000
    batch_max = int(sys.argv[3]) if len(sys.argv) > 3 else 256
    out_json = (
        sys.argv[4] if len(sys.argv) > 4 else "experiments/BPE_DEPTH_r11.json"
    )
    spark = get_spark("bpe_depth")
    docs = load(spark, sf_dir, "documents").select("doc_id", "text")

    # the induce_bpe_batched loop, instrumented per round (same code
    # path: _vocab -> [_pair_counts -> top -> disjoint prefix -> chained
    # replace -> checkpoint]*; extensions/bpe.py:induce_bpe_batched)
    t_start = time.perf_counter()
    words = _vocab(docs, "text").localCheckpoint(eager=True)
    vocab_rows = words.count()
    t_vocab = time.perf_counter() - t_start

    rounds: list[dict] = []
    n_done = 0
    while n_done < n_merges:
        t0 = time.perf_counter()
        top = (
            _pair_counts(words)
            .orderBy(F.desc("total"), "a", "b")
            .limit(batch_max + 1)
            .collect()
        )
        if not top:
            break
        # _disjoint_prefix floors at 1 (plain greedy), so the loop
        # always advances while pairs remain
        batch = _disjoint_prefix(top, batch_max, n_merges - n_done)
        s = F.col("s")
        for r in batch:
            s = F.replace(
                s,
                F.lit(f"[{r['a']}][{r['b']}]"),
                F.lit(f"[{r['a']}{r['b']}]"),
            )
        words = (
            words.withColumn("s", s)
            .select("token", "cnt", "s")
            .localCheckpoint(eager=True)
        )
        n_done += len(batch)
        rounds.append(
            {"merges": len(batch), "wall_s": round(time.perf_counter() - t0, 2)}
        )
        if len(rounds) % 10 == 0:
            print(
                f"round {len(rounds)}: {n_done}/{n_merges} merges",
                flush=True,
            )

    state = words.select(
        F.count(F.lit(1)).alias("types"),
        F.sum(F.length("s")).alias("seg_chars"),
    ).collect()[0]
    wall = round(time.perf_counter() - t_start, 1)
    out = {
        "sf": sf_dir,
        "n_merges_requested": n_merges,
        "n_merges_done": n_done,
        "batch_max": batch_max,
        "rounds": len(rounds),
        "wall_s": wall,
        "vocab_scan_s": round(t_vocab, 2),
        "word_types": vocab_rows,
        "final_state": {
            "types": state["types"],
            "segmentation_chars": int(state["seg_chars"]),
        },
        "merges_per_round": {
            "mean": round(n_done / max(len(rounds), 1), 1),
            "min": min((r["merges"] for r in rounds), default=0),
            "max": max((r["merges"] for r in rounds), default=0),
        },
        "round_wall_s": {
            "mean": round(
                sum(r["wall_s"] for r in rounds) / max(len(rounds), 1), 2
            ),
            "max": max((r["wall_s"] for r in rounds), default=0.0),
        },
    }
    with open(out_json, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({k: v for k, v in out.items() if k != "sf"}))
    print(f"wrote {out_json}")


if __name__ == "__main__":
    main()
