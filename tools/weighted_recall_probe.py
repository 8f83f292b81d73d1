"""Planted near-dup RECALL for the WEIGHTED MinHash family at sf10 —
the q304 analogue of tools/text_recall_probe.py (q22) and
tools/recall_probe.py (q301), completing measured recall across all
three approximate near-dup families.

The operator docstring claims the 20×10 deep banding puts the S-curve at
≈0.74: recall ≈0.90 at J_w = 0.8 rising to ≈0.9998 at 0.9, while the
high weighted background of a bounded-vocabulary corpus stays excluded.
This measures the claim: K perturbed copies of real sf10 documents
(seeded multiset edits — per-occurrence drops, duplications, and
fresh-token substitutions at swept rates, spreading exact CAPPED
weighted Jaccard over ~[0.6, 0.99]), `weighted_minhash_lsh_pairs` at
the q304 defaults, recall by exact-J_w bin. Ground truth is computed
driver-side with the operator's own declared measure
(Σ min(min(tf,cap)) / Σ max(min(tf,cap)) over the union vocabulary).

Seeded end-to-end. Wall ~3-5 min at sf10.

Usage: python tools/weighted_recall_probe.py [/root/repo/.scratch/sf10]
"""

from __future__ import annotations

import os
import random
import sys
from collections import Counter

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from esop_spark.operators import dedup
from esop_spark.session import get_spark

PLANT_STRIDE = 10**12
K = 400
SEED = 20260818
TAU = 0.8  # q304's threshold
TF_CAP = 10


def capped_wjaccard(a: Counter, b: Counter, cap: int = TF_CAP) -> float:
    inter = union = 0
    for t in set(a) | set(b):
        ca, cb = min(a.get(t, 0), cap), min(b.get(t, 0), cap)
        inter += min(ca, cb)
        union += max(ca, cb)
    return inter / union if union else 0.0


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.scratch/sf10"
    spark = get_spark("weighted-recall-probe")
    spark.conf.set("spark.sql.shuffle.partitions", "64")
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))

    bases = (
        docs.filter(F.size(F.split("text", " ")) >= 30)
        .orderBy("doc_id")
        .limit(K)
        .select("doc_id", "text")
        .collect()
    )
    rnd = random.Random(SEED)
    planted = []
    truth = {}
    for i, row in enumerate(bases):
        words = row["text"].split(" ")
        rate = rnd.uniform(0.02, 0.40)
        out = []
        for j, w in enumerate(words):
            r = rnd.random()
            if r < rate / 3:
                continue  # drop this occurrence
            if r < 2 * rate / 3:
                out.extend([w, w])  # duplicate
                continue
            if r < rate:
                out.append(f"zw{i}x{j}")  # fresh-token substitution
                continue
            out.append(w)
        cid = row["doc_id"] + PLANT_STRIDE
        planted.append((cid, " ".join(out)))
        truth[(row["doc_id"], cid)] = capped_wjaccard(
            Counter(words), Counter(out)
        )
    plant_df = spark.createDataFrame(planted, "doc_id long, text string")
    corpus = docs.select("doc_id", "text").unionByName(plant_df)

    got = {
        (r["id_a"], r["id_b"])
        for r in dedup.weighted_minhash_lsh_pairs(corpus, threshold=TAU)
        .select("id_a", "id_b")
        .collect()
    }
    eligible = {p: j for p, j in truth.items() if j >= TAU}
    print(f"planted pairs: {len(truth)}; exact capped J_w >= {TAU}: {len(eligible)}")
    bins = [(0.80, 0.85), (0.85, 0.90), (0.90, 0.95), (0.95, 1.01)]
    tot_n = tot_hit = 0
    for lo, hi in bins:
        sel = [p for p, j in eligible.items() if lo <= j < hi]
        hit = sum(1 for p in sel if p in got)
        tot_n += len(sel)
        tot_hit += hit
        pct = 100.0 * hit / len(sel) if sel else float("nan")
        print(f"  J_w [{lo:.2f},{hi:.2f}): {hit}/{len(sel)} = {pct:.1f}%")
    print(f"overall recall at J_w >= {TAU}: {tot_hit}/{tot_n} = "
          f"{100.0 * tot_hit / tot_n:.1f}%")
    print(f"total output pairs at tau={TAU}: {len(got)}")


if __name__ == "__main__":
    main()
