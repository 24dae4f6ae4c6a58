"""Global plan-invariant sweep: the "no scale-killer" claim as a checked
invariant over EVERY registry entry, not a per-query pin.

For each registry query (AQE-finalized by executing it once) the tool
asserts three structural invariants on the physical plan:

  1. NO ``Exchange SinglePartition`` — unless it feeds a global 1-row
     aggregate (nearest non-wrapper ancestor is an Aggregate with
     ``keys=[]``) or a GlobalLimit/CollectLimit (bounded by the limit).
     Anything else means one reducer sorts/processes the whole frame —
     the r4 `user_activity_gini` defect this sweep would have flagged.
  2. NO ``BroadcastNestedLoopJoin`` — unless its broadcast side is a
     provably-tiny frame: the BroadcastExchange subtree contains a
     global ``keys=[]`` aggregate (1-row totals pattern) or a
     TakeOrdered/Limit (k-row pattern) before any other join/scan.
  3. NO ``CartesianProduct`` — same tiny-side exception.
  4. NO ``Expand`` fed by an unbounded scan (TRAP #29 promoted to a
     plan-shape rule, VERDICT r8 #4): Expand replicates EVERY input row
     once per projection list, so an Expand over a raw FileScan
     multiplies the exchange volume by its list count — the
     approx_distinct multi-distinct rewrite (rows ×3 through the
     shuffle, sf10 50.4 → 20.7 s) was caught by wall time in the r8
     sweep; this rule catches the next one by shape. Deliberate
     grouping-sets entries (cube/rollup — Expand IS their contract)
     are allowlisted by explicit reason; an Expand over a provably
     small frame (global agg / limit evidence) passes.

Violations that are deliberate must be declared in ALLOWLIST with an
audited reason; an empty allowlist entry never silences a NEW violation
in a different query. Output is one JSON artifact (default
PLANS_INVARIANTS_r{N}.json) with per-query status; exit 0 iff no
unallowed violation.

Usage: python tools/plan_invariants.py [sf_dir] [--json OUT] [name ...]
"""

from __future__ import annotations

import json
import re
import sys
import time

sys.path.insert(0, ".")

from simple_cdc_service_spark.plans import plan_string  # noqa: E402
from simple_cdc_service_spark.registry import REGISTRY  # noqa: E402
from simple_cdc_service_spark.session import get_spark  # noqa: E402

# Audited deliberate violations: {query_name: {rule: reason}}.
# A reason here means "reviewed, bounded, documented" — see the named
# docstrings. New violations in other queries still fail the sweep.
ALLOWLIST: dict[str, dict[str, str]] = {
    "knn_bruteforce": {
        "bnlj": "broadcast side is the QUERY SET (bounded by the query "
        "predicate, k rows by contract); corpus × queries is the "
        "brute-force kNN contract — see operators/similarity.py:24",
    },
    "knn_ivf": {
        "bnlj": "two audited tiny broadcasts: corpus × k COARSE CENTROIDS "
        "(assignment step, k bounded by nlist) and queries × the reused "
        "centroid frame — operators/similarity.py:216",
    },
    "knn_ivf_kmeans": {
        "bnlj": "same shape as knn_ivf with k-means-trained centroids "
        "(capped seeded sample, k rows) — operators/similarity.py:137-203",
    },
    "retrieval_mrr": {
        "bnlj": "broadcast side is the bounded query set (same contract "
        "as knn_bruteforce); MRR scores corpus × queries by design",
    },
    "global_shuffle": {
        "single_partition": "prefix-sum over the BUCKET-COUNT frame "
        "(constant #buckets rows, not the corpus) feeding a broadcast — "
        "documented in the docstring (registry.py global_shuffle)",
    },
    "shard_plan": {
        "single_partition": "prefix-sum over the SEGMENTS frame "
        "(corpus/1000 rows) feeding a broadcast — the segment-offset "
        "trick's reduced frame, documented in the docstring",
    },
    # --- rule 4 (Expand): entries where row replication IS the contract,
    # with a bounded, declared fan-out factor ---
    "rollup_revenue": {
        "expand": "ROLLUP grouping sets: Expand emits one copy per "
        "grouping set (3 here) — the grouping-sets contract; fan-out is "
        "the fixed set count, map-side partial agg collapses before the "
        "exchange",
    },
    "cube_revenue": {
        "expand": "CUBE grouping sets: fixed 4-way Expand (2^dims), "
        "same contract as rollup_revenue",
    },
    "grouping_sets_revenue": {
        "expand": "explicit GROUPING SETS: fixed 3-way Expand, same "
        "contract as rollup_revenue",
    },
    "corpus_stats": {
        "expand": "GROUPING SETS over (lang, source): fixed 3-way "
        "Expand, same contract as rollup_revenue",
    },
    "unpivot_metrics": {
        "expand": "unpivot/stack is IMPLEMENTED as Expand — one copy "
        "per unpivoted metric column (3), bounded by the declared "
        "column list, over an already-aggregated per-source frame",
    },
    "window_sliding": {
        "expand": "sliding event-time windows: Expand duplicates each "
        "event into the windows it overlaps (window/slide = 2 here) — "
        "the sliding-window contract; fan-out bounded by the declared "
        "window/slide ratio",
    },
}

# nodes that merely wrap their child in the AQE tree
_WRAPPERS = (
    "ShuffleQueryStage",
    "BroadcastQueryStage",
    "ResultQueryStage",
    "TableCacheQueryStage",
    "AQEShuffleRead",
    "InputAdapter",
    "ReusedQueryStage",
    "Sort ",  # global agg may sort-aggregate: Sort over the 1-partition frame
)


def _tree(plan: str) -> list[tuple[int, str]]:
    """(depth, node_text) per line of a simple-mode plan tree.

    Only the AQE Final Plan is checked — the Initial Plan section is the
    pre-runtime estimate and would double-count every node."""
    if "== Initial Plan ==" in plan:
        plan = plan.split("== Initial Plan ==")[0]
    out: list[tuple[int, str]] = []
    for line in plan.splitlines():
        if not line.strip() or "==" in line[:6] or line.startswith("=="):
            continue
        m = re.match(r"^[ :+\-|]*", line)
        depth = m.end()
        text = line[depth:]
        if not text:
            continue
        out.append((depth, text))
    return out


def _parent_chain(tree: list[tuple[int, str]], i: int):
    """Yield ancestors of node i, nearest first."""
    d = tree[i][0]
    for j in range(i - 1, -1, -1):
        if tree[j][0] < d:
            yield tree[j][1]
            d = tree[j][0]


def _children(tree: list[tuple[int, str]], i: int) -> list[tuple[int, int]]:
    """[start, end) index ranges of node i's direct-child subtrees."""
    d = tree[i][0]
    end = i + 1
    while end < len(tree) and tree[end][0] > d:
        end += 1
    if end == i + 1:
        return []
    child_depth = min(tree[j][0] for j in range(i + 1, end))
    starts = [j for j in range(i + 1, end) if tree[j][0] == child_depth]
    return [(s, starts[k + 1] if k + 1 < len(starts) else end)
            for k, s in enumerate(starts)]


def _subtree(tree: list[tuple[int, str]], i: int) -> list[str]:
    d = tree[i][0]
    out = []
    for j in range(i + 1, len(tree)):
        if tree[j][0] <= d:
            break
        out.append(tree[j][1])
    return out


def _is_wrapper(node: str) -> bool:
    return any(node.startswith(w) or node.lstrip("*()0123456789 ").startswith(w)
               for w in _WRAPPERS)


_GLOBAL_AGG = re.compile(r"keys?=\[\]")  # HashAggregate keys=[] / SortAggregate key=[]


def _tiny_evidence(side: list[str]) -> bool:
    """True if a subtree is provably small: a global (key(s)=[]) aggregate,
    a TakeOrdered/GLOBAL limit, or driver-built LocalTableScan data with no
    distributed FileScan feeding it.

    Only GlobalLimit/CollectLimit count as limit evidence — a LocalLimit
    bounds each PARTITION, so an unbounded frame with a per-partition
    limit is not small and must not be excused from the BNLJ/Cartesian
    rules."""
    if any(_GLOBAL_AGG.search(s) or "TakeOrderedAndProject" in s
           or "GlobalLimit" in s or "CollectLimit" in s
           for s in side):
        return True
    # driver-built data (createDataFrame / parallelize of a collected k-row
    # list) with no distributed FileScan feeding it is driver-memory-bounded
    # by construction
    return any("LocalTableScan" in s or "Scan ExistingRDD" in s for s in side) \
        and not any("FileScan" in s for s in side)


def check_plan(plan: str) -> list[str]:
    """Return a list of violation strings (empty = clean)."""
    tree = _tree(plan)
    # ReusedExchange nodes are aliases: resolve plan_id -> definition index
    defs: dict[str, int] = {}
    for i, (_, node) in enumerate(tree):
        if not node.startswith("ReusedExchange"):
            m = re.search(r"\[plan_id=(\d+)\]", node)
            if m:
                defs[m.group(1)] = i
    bad: list[str] = []
    for i, (_, node) in enumerate(tree):
        if node.startswith("ReusedExchange"):
            continue  # alias — the original is checked at its own site
        if "Exchange SinglePartition" in node:
            ok = False
            for anc in _parent_chain(tree, i):
                if _is_wrapper(anc):
                    continue
                if _GLOBAL_AGG.search(anc) or "GlobalLimit" in anc \
                        or "CollectLimit" in anc or "TakeOrderedAndProject" in anc:
                    ok = True
                break
            if not ok:
                bad.append(f"single_partition: {node[:120]}")
        elif re.match(r"^[*()0-9+\- ]*Expand\b", node):
            sub = _subtree(tree, i)
            # splice ReusedExchange aliases so evidence behind a reuse
            # is visible, same as the BNLJ sides
            for s in list(sub):
                if s.startswith("ReusedExchange"):
                    m = re.search(r"\[plan_id=(\d+)\]", s)
                    if m and m.group(1) in defs:
                        j = defs[m.group(1)]
                        sub.extend([tree[j][1]] + _subtree(tree, j))
            fed_by_scan = any("FileScan" in s for s in sub)
            if fed_by_scan and not _tiny_evidence(sub):
                bad.append(f"expand: {node[:120]}")
        elif "BroadcastNestedLoopJoin" in node or "CartesianProduct" in node:
            rule = ("bnlj" if "BroadcastNestedLoopJoin" in node
                    else "cartesian")
            # tiny-side exception: at least one DIRECT child subtree is a
            # provably small frame — it contains a global keys=[] aggregate
            # (1-row totals) or a TakeOrdered/Limit (k rows). For BNLJ the
            # broadcast child is checked; for Cartesian either side counts.
            children = _children(tree, i)
            tiny = False
            for c0, c1 in children:
                side = [tree[j][1] for j in range(c0, c1)]
                # splice in evidence from any ReusedExchange the side aliases
                for s in list(side):
                    if s.startswith("ReusedExchange"):
                        m = re.search(r"\[plan_id=(\d+)\]", s)
                        if m and m.group(1) in defs:
                            j = defs[m.group(1)]
                            side.extend([tree[j][1]] + _subtree(tree, j))
                is_bcast = bool(side) and any(
                    "BroadcastExchange" in s or "BroadcastQueryStage" in s
                    for s in side[:2]
                )
                if _tiny_evidence(side) and (
                    rule == "cartesian" or is_bcast or len(children) == 1
                ):
                    tiny = True
                    break
            if not tiny:
                bad.append(f"{rule}: {node[:120]}")
    return bad


def main() -> int:
    args = sys.argv[1:]
    json_out = None
    if "--json" in args:
        k = args.index("--json")
        json_out = args[k + 1]
        del args[k : k + 2]
    sf_dir = args.pop(0) if args and "/" in args[0] else "/root/testdata/sf0.01"
    names = args or list(REGISTRY)
    spark = get_spark("plan-invariants")
    spark.sparkContext.setLogLevel("ERROR")
    results: dict[str, dict] = {}
    n_bad = 0
    for name in names:
        spec = REGISTRY[name]
        t0 = time.time()
        try:
            df = spec.fn(spark, sf_dir)
            df.collect()  # finalize AQE so runtime re-plans are visible
            plan = plan_string(df, "simple")
        except Exception as e:  # noqa: BLE001
            results[name] = {"status": "err", "violations": [f"run: {e}"[:300]]}
            n_bad += 1
            print(f"ERR  {name}: {e}", flush=True)
            continue
        viol = check_plan(plan)
        allowed = ALLOWLIST.get(name, {})
        unallowed = [v for v in viol if v.split(":")[0] not in allowed]
        status = "clean" if not viol else ("allowed" if not unallowed else "VIOLATION")
        results[name] = {
            "status": status,
            "violations": viol,
            "allowed_reasons": allowed or None,
            "sec": round(time.time() - t0, 2),
        }
        if unallowed:
            n_bad += 1
            print(f"FAIL {name}: {unallowed}", flush=True)
        else:
            print(f"ok   {name} ({status}, {results[name]['sec']}s)", flush=True)
    summary = {
        "sf_dir": sf_dir,
        "total": len(names),
        "clean": sum(1 for r in results.values() if r["status"] == "clean"),
        "allowed": sum(1 for r in results.values() if r["status"] == "allowed"),
        "violations": n_bad,
        "rules": [
            "no Exchange SinglePartition except feeding a keys=[] global "
            "aggregate or a GlobalLimit/CollectLimit/TakeOrdered",
            "no BroadcastNestedLoopJoin except vs a 1-row/k-row "
            "(keys=[] aggregate or Limit) broadcast side",
            "no CartesianProduct except vs a 1-row/k-row side",
        ],
        "queries": results,
    }
    if json_out:
        with open(json_out, "w") as f:
            json.dump(summary, f, indent=1)
        print(f"wrote {json_out}")
    print(f"{summary['clean']} clean / {summary['allowed']} allowed / "
          f"{n_bad} violations over {len(names)} queries")
    spark.stop()
    return 1 if n_bad else 0


if __name__ == "__main__":
    sys.exit(main())
