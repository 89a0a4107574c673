"""Approximate-ANN recall artifact + regression gate.

The approximate configs (LSH multiprobe, IVF nprobe<nlist, PQ/IVF-PQ
refined) are correctness-checked in pytest against brute force with
fixed thresholds; this tool promotes the measured recall@k numbers to
a RECORDED artifact so recall regressions are tracked round-over-round
like latency (VERDICT r7 §next-4).

Usage:
    python tools/recall.py [SF_DIR] [--out RECALL.json]
    python tools/recall.py --gate NEW.json OLD.json [--drop 0.05]

Measure mode writes one JSON document:
    {"sf_dir": ..., "k": 5, "n_queries": 32,
     "recalls": {"lsh_single": 0.84, "lsh_multiprobe2": 0.95, ...},
     "configs": {name: {params...}}}
Recall@k = mean over queries of |approx top-k ∩ exact top-k| / k, with
exact = the brute-force :func:`cosine_topk` oracle on the same frame.

Gate mode compares two artifacts: exit 1 if any config's recall dropped
by more than ``--drop`` (absolute), 0 otherwise. New configs are notes;
dropped configs alarm (a silently-lost measurement is how regressions
hide).

RATCHET (VERDICT r9 §next-6): a slow leak of just-under-``drop`` moves
each round would never trip the single-step gate. The artifact carries
a bounded ``history`` of previous rounds' recalls (written by
``--refresh``, which `make recall-gate` uses instead of a bare `cp`),
and gate mode ALSO alarms when the cumulative drop from the oldest
recorded round to the new measurement exceeds ``drop`` — two
same-direction moves of 0.03 each now fail even though either alone
passes.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


# name -> (builder kwargs recorded verbatim in the artifact).
# The shared IVF index is built with ivf_build_deterministic (seeded,
# layout-independent): MLlib k-means|| init draws per partition, so an
# ivf_build-backed measurement could shift round-over-round from
# partition layout alone and trip the gate spuriously — recall deltas
# must reflect config changes, not layout (ADVICE r8).
CONFIGS = {
    "lsh_single": {"num_planes": 24, "num_bands": 8},
    "lsh_multiprobe2": {"num_planes": 24, "num_bands": 8,
                        "multiprobe": 2},
    "ivf_nprobe4": {"nlist": 16, "nprobe": 4, "build": "deterministic",
                    "seed": 42},
    # the production-recall end of the frontier (VERDICT r10 §next-7):
    # same deterministic index, twice the probed lists — what an
    # operator who needs >0.8 recall@5 actually configures; cost_sec
    # in the artifact records what the extra probes buy/cost
    "ivf_nprobe8": {"nlist": 16, "nprobe": 8, "build": "deterministic",
                    "seed": 42},
    "pq_refined": {"m": 16, "ksub": 64, "seed": 7, "expand": 8},
    "ivf_pq": {"nlist": 16, "nprobe": 4, "m": 16, "ksub": 64,
               "seed": 7, "expand": 4, "build": "deterministic"},
    "ivf_pq_nprobe8": {"nlist": 16, "nprobe": 8, "m": 16, "ksub": 64,
                       "seed": 7, "expand": 16,
                       "build": "deterministic"},
    "ivf_pq_residual": {"nlist": 8, "nprobe": 8, "m": 16, "ksub": 64,
                        "seed": 7, "expand": 8},
}


def _topk_sets(df, k: int) -> dict:
    out: dict = {}
    for r in df.collect():
        if r["rank"] <= k:
            out.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    return out


def measure(sf_dir: str, *, k: int = 5, n_queries: int = 32) -> dict:
    from pyspark.sql import functions as F

    from dexscraper_spark.operators.quantize import (
        ivf_pq_encode, ivf_pq_residual_build, ivf_pq_residual_topk,
        ivf_pq_topk, pq_encode, pq_topk_refined, pq_train)
    from dexscraper_spark.operators.similarity import (
        cosine_topk, ivf_build_deterministic, ivf_query,
        lsh_bucketed_topk)
    from dexscraper_spark.session import get_spark

    spark = get_spark("recall", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    emb = (spark.read.parquet(f"{sf_dir}/embeddings.parquet")
           .select("vec_id", "embedding"))
    queries = emb.orderBy("vec_id").limit(n_queries)
    exact = _topk_sets(cosine_topk(emb, queries, k=k), k)

    import time as _time

    costs: dict = {}

    def recall_of(df, name: str | None = None) -> float:
        t0 = _time.monotonic()
        got = _topk_sets(df, k)
        if name is not None:
            costs[name] = round(_time.monotonic() - t0, 3)
        per_q = [len(got.get(q, set()) & s) / len(s)
                 for q, s in exact.items()]
        return round(sum(per_q) / len(per_q), 4)

    recalls: dict = {}
    c = CONFIGS
    recalls["lsh_single"] = recall_of(lsh_bucketed_topk(
        emb, queries, k=k, **c["lsh_single"]), "lsh_single")
    recalls["lsh_multiprobe2"] = recall_of(lsh_bucketed_topk(
        emb, queries, k=k, **c["lsh_multiprobe2"]), "lsh_multiprobe2")

    index = ivf_build_deterministic(
        emb, nlist=c["ivf_nprobe4"]["nlist"],
        seed=c["ivf_nprobe4"]["seed"], cache=False)
    recalls["ivf_nprobe4"] = recall_of(ivf_query(
        index, queries, k=k, nprobe=c["ivf_nprobe4"]["nprobe"]),
        "ivf_nprobe4")
    recalls["ivf_nprobe8"] = recall_of(ivf_query(
        index, queries, k=k, nprobe=c["ivf_nprobe8"]["nprobe"]),
        "ivf_nprobe8")

    books = pq_train(emb, dim=64, m=c["pq_refined"]["m"],
                     ksub=c["pq_refined"]["ksub"],
                     seed=c["pq_refined"]["seed"])
    codes = pq_encode(emb, books)
    recalls["pq_refined"] = recall_of(pq_topk_refined(
        emb, codes, queries, books, k=k,
        expand=c["pq_refined"]["expand"]), "pq_refined")

    ivf_codes = ivf_pq_encode(index, books)
    recalls["ivf_pq"] = recall_of(ivf_pq_topk(
        emb, index, ivf_codes, queries, books, k=k,
        nprobe=c["ivf_pq"]["nprobe"], expand=c["ivf_pq"]["expand"]),
        "ivf_pq")
    recalls["ivf_pq_nprobe8"] = recall_of(ivf_pq_topk(
        emb, index, ivf_codes, queries, books, k=k,
        nprobe=c["ivf_pq_nprobe8"]["nprobe"],
        expand=c["ivf_pq_nprobe8"]["expand"]), "ivf_pq_nprobe8")
    index.unpersist()

    rindex, rbooks, rcodes = ivf_pq_residual_build(
        emb, nlist=c["ivf_pq_residual"]["nlist"],
        m=c["ivf_pq_residual"]["m"], ksub=c["ivf_pq_residual"]["ksub"],
        seed=c["ivf_pq_residual"]["seed"])
    try:
        recalls["ivf_pq_residual"] = recall_of(ivf_pq_residual_topk(
            emb, rindex, rcodes, queries, rbooks, k=k,
            nprobe=c["ivf_pq_residual"]["nprobe"],
            expand=c["ivf_pq_residual"]["expand"]), "ivf_pq_residual")
    finally:
        rindex.unpersist()

    return {"sf_dir": sf_dir, "k": k, "n_queries": len(exact),
            "recalls": recalls, "configs": CONFIGS,
            "cost_sec": costs}


def gate(new_path: str, old_path: str, *, drop: float = 0.05) -> int:
    with open(new_path) as f:
        new = json.load(f)
    with open(old_path) as f:
        old = json.load(f)
    nr, od = new.get("recalls", {}), old.get("recalls", {})
    print(f"recall_gate: {old_path} -> {new_path} (max drop {drop})")
    # apples-to-apples guard: recall@k at one scale is not comparable
    # to recall@k' at another — refuse rather than alarm spuriously or
    # mask a real regression
    mismatched = [f"{field} {old.get(field)!r} -> {new.get(field)!r}"
                  for field in ("k", "n_queries", "sf_dir")
                  if new.get(field) != old.get(field)]
    if mismatched:
        print("  INCOMPARABLE artifacts — measurement setup differs: "
              + "; ".join(mismatched))
        print("  re-measure the baseline at the new setup before gating")
        return 2
    history = old.get("history", [])
    failures = []
    for name, old_r in sorted(od.items()):
        if name not in nr:
            failures.append(f"  DROPPED measurement: {name} "
                            f"(was {old_r:.3f})")
            continue
        new_r = nr[name]
        delta = new_r - old_r
        marker = ""
        if delta < -drop:
            failures.append(f"  REGRESSED {name}: "
                            f"{old_r:.3f} -> {new_r:.3f}")
            marker = "  <-- REGRESSED"
        else:
            # ratchet: cumulative drop across the recorded history —
            # N slow same-direction moves must not slip under the
            # single-step gate
            for h in history:
                hv = h.get("recalls", {}).get(name)
                if hv is not None and hv - new_r > drop:
                    failures.append(
                        f"  RATCHET {name}: {hv:.3f} (round "
                        f"{h.get('round', '?')}) -> {new_r:.3f} — "
                        f"cumulative drop exceeds {drop} across "
                        "rounds")
                    marker = "  <-- RATCHET"
                    break
        print(f"  {name}: {old_r:.3f} -> {new_r:.3f} "
              f"({delta:+.3f}){marker}")
    for name in sorted(set(nr) - set(od)):
        print(f"  new: {name} ({nr[name]:.3f})")
    if failures:
        print(f"{len(failures)} recall failure(s):")
        for x in failures:
            print(x)
        return 1
    print(f"PASS — no config's recall@{new.get('k')} dropped more "
          f"than {drop}")
    return 0


def refresh(new_path: str, old_path: str, *,
            keep_history: int = 8) -> int:
    """Promote a PASSED measurement to the committed baseline, folding
    the old baseline's recalls into a bounded ``history`` (newest
    last) — the record the gate's ratchet check reads. Preserves the
    old artifact's ``notes``."""
    with open(new_path) as f:
        new = json.load(f)
    with open(old_path) as f:
        old = json.load(f)
    history = list(old.get("history", []))
    history.append({"round": len(history) + 1,
                    "recalls": old.get("recalls", {})})
    # the OLDEST entry is exempt from truncation (ADVICE r11): it is
    # the immutable day-0 reference point the ratchet measures total
    # drift against — plain [-keep:] would evict it on the
    # keep_history+1'th re-baseline and silently re-anchor the ratchet
    if len(history) > keep_history:
        # keep_history=1 degenerates to the oldest entry alone —
        # [-0:] would be the WHOLE list and duplicate history[0]
        tail = history[-(keep_history - 1):] if keep_history > 1 else []
        history = history[:1] + tail
    new["history"] = history
    if "notes" in old and "notes" not in new:
        new["notes"] = old["notes"]
    with open(old_path, "w") as f:
        json.dump(new, f, indent=1)
    print(f"recall_refresh: {old_path} <- {new_path} "
          f"(history depth {len(new['history'])})")
    return 0


def main(argv: list[str]) -> int:
    ap = argparse.ArgumentParser(prog="recall.py")
    ap.add_argument("paths", nargs="*",
                    help="measure: [SF_DIR]; gate/refresh: "
                         "NEW.json OLD.json")
    ap.add_argument("--gate", action="store_true")
    ap.add_argument("--refresh", action="store_true",
                    help="replace OLD.json with NEW.json, folding "
                         "OLD's recalls into the bounded history")
    ap.add_argument("--out", default=None)
    ap.add_argument("--drop", type=float, default=0.05)
    try:
        ns = ap.parse_args(argv)
    except SystemExit as e:
        return e.code if isinstance(e.code, int) else 2
    if ns.gate or ns.refresh:
        if len(ns.paths) != 2:
            print("recall.py --gate/--refresh need NEW.json OLD.json")
            return 2
        if ns.gate:
            return gate(ns.paths[0], ns.paths[1], drop=ns.drop)
        return refresh(ns.paths[0], ns.paths[1])
    sf_dir = ns.paths[0] if ns.paths else "/root/testdata/sf0.1"
    doc = measure(sf_dir)
    line = json.dumps(doc)
    if ns.out:
        with open(ns.out, "w") as f:
            json.dump(doc, f, indent=1)
    print(line)
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
