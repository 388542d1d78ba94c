"""Plan-quality audit — the PLANS.md checks as a library API.

``audit(df)`` executes nothing; it reads the AQE-final formatted
physical plan and extracts the properties that decide whether a query
survives a 100 TB scale-up: parquet filter pushdown, read-schema
pruning, join strategies (and the dangerous ones), whole-stage codegen
coverage, and exchange counts. ``lint(df)`` turns that into actionable
warnings — the checklist a reviewer (or CI) runs before promoting a
pipeline:

* a scan with no pushed filters below a selective query,
* a nested-loop / cartesian join that isn't an intentional tiny
  broadcast,
* full-width scans feeding narrow projections.

The same extraction drives ``scripts/dump_plans.py``, so PLANS.md and
the API can never disagree about what was measured.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import DataFrame


@dataclass
class PlanAudit:
    pushed_filter_scans: int
    total_scans: int
    read_schema_widths: list[int]
    broadcast_hash_joins: int
    sort_merge_joins: int
    shuffled_hash_joins: int
    nested_loop_joins: int
    cartesian_products: int
    codegen_spans: int
    shuffle_exchanges: int
    broadcast_exchanges: int
    aqe_coalesced_reads: int
    hof_folds: int = 0
    hof_nontrivial_lambdas: int = 0
    warnings: list[str] = field(default_factory=list)

    def lines(self) -> list[str]:
        """The PLANS.md bullet rendering."""
        return [
            f"- pushed-filter scans: {self.pushed_filter_scans}/{self.total_scans}",
            f"- read-schema widths: {self.read_schema_widths} (pruned, not full-table)",
            f"- joins: {self.broadcast_hash_joins} broadcast-hash, {self.sort_merge_joins} sort-merge",
            f"- whole-stage codegen spans: {self.codegen_spans}",
            f"- exchanges: {self.shuffle_exchanges} shuffle, {self.broadcast_exchanges} broadcast; "
            f"{self.aqe_coalesced_reads} AQE-coalesced reads",
        ]


def _final_plan_detail(plan: str) -> str:
    # AQE formatted output prints the final tree, then the initial tree,
    # then detail blocks for BOTH; restrict analysis to detail blocks
    # whose node id appears in the final tree
    m = re.search(r"== Final Plan ==(.*?)\+- == Initial Plan ==", plan, re.S)
    final_tree = m.group(1) if m else plan
    ids = set(re.findall(r"\((\d+)\)", final_tree))
    blocks = re.split(r"\n(?=\(\d+\) )", plan)
    return "\n".join(
        b for b in blocks
        if (mm := re.match(r"\((\d+)\) ", b)) and mm.group(1) in ids
    )


def audit(df: DataFrame) -> PlanAudit:
    """Extract scale-relevant properties from ``df``'s physical plan
    (no execution; AQE-final node set when present)."""
    jvm = df.sparkSession._jvm  # type: ignore[attr-defined]
    plan = jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")
    return _audit_text(plan)


def _audit_text(plan: str) -> PlanAudit:
    detail = _final_plan_detail(plan)
    pushed = re.findall(r"PushedFilters: \[([^\]]*)\]", detail)
    schemas = re.findall(r"ReadSchema: struct<([^>]*)>", detail)
    a = PlanAudit(
        pushed_filter_scans=sum(1 for p in pushed if p.strip()),
        total_scans=len(pushed),
        read_schema_widths=[len(s.split(",")) if s else 0 for s in schemas],
        broadcast_hash_joins=len(re.findall(r"\(\d+\) BroadcastHashJoin", detail)),
        sort_merge_joins=len(re.findall(r"\(\d+\) SortMergeJoin", detail)),
        shuffled_hash_joins=len(re.findall(r"\(\d+\) ShuffledHashJoin", detail)),
        nested_loop_joins=len(re.findall(r"\(\d+\) BroadcastNestedLoopJoin", detail)),
        cartesian_products=len(re.findall(r"\(\d+\) CartesianProduct", detail)),
        codegen_spans=len(set(re.findall(r"\[codegen id : (\d+)\]", detail))),
        shuffle_exchanges=len(re.findall(r"\(\d+\) Exchange\n", detail)),
        broadcast_exchanges=len(re.findall(r"\(\d+\) BroadcastExchange\n", detail)),
        aqe_coalesced_reads=len(re.findall(r"\(\d+\) AQEShuffleRead", detail)),
        # Higher-order array functions evaluate their lambdas INTERPRETED —
        # one closure call per element — while everything around them is
        # whole-stage codegen. This repo has measured the gap twice:
        # explode+codegen agg beat the per-row HOF minhash plan 9× at sf1
        # and the two-step shingle plan beats the fused-lambda one 2×
        # (functions/dedup.py:80 and the rejection note in
        # minhash_signatures). Folds (`aggregate`) are O(elements) always;
        # a transform/filter lambda is counted non-trivial when its body
        # starts with a nested function call (array_join(slice(...)) etc.)
        # rather than a bare comparison/arithmetic on the element.
        hof_folds=len(re.findall(r"\baggregate\(", detail)),
        hof_nontrivial_lambdas=len(re.findall(r"lambdafunction\([a-z_]+\(", detail)),
    )
    if a.cartesian_products:
        a.warnings.append(
            f"{a.cartesian_products} CartesianProduct node(s) — quadratic at scale; "
            "add an equi-condition or broadcast a pre-aggregated side"
        )
    if a.nested_loop_joins:
        a.warnings.append(
            f"{a.nested_loop_joins} BroadcastNestedLoopJoin node(s) — fine for a "
            "1-row/tiny broadcast (scalar subquery, theta over aggregates), "
            "quadratic otherwise"
        )
    if a.total_scans and a.pushed_filter_scans == 0:
        a.warnings.append(
            "no scan receives pushed filters — if the query is selective, the "
            "predicate is not reaching parquet (cast/udf in the way?)"
        )
    wide = [w for w in a.read_schema_widths if w > 12]
    if wide:
        a.warnings.append(
            f"scan(s) reading {wide} columns — check column pruning if the query "
            "projects fewer"
        )
    if a.hof_folds:
        a.warnings.append(
            f"[hof] {a.hof_folds} higher-order aggregate() fold(s) — O(elements) "
            "interpreted closure calls per row (this repo measured explode+"
            "codegen agg 2-9x faster); keep only as cross-engine oracle "
            "apparatus or on contractually tiny arrays"
        )
    if a.hof_nontrivial_lambdas:
        a.warnings.append(
            f"[hof] {a.hof_nontrivial_lambdas} transform/filter lambda(s) doing "
            "nested function calls per element — interpreted, not codegen; fine "
            "for small bounded arrays or streaming projections where the batch "
            "explode plan cannot run (minhash_signature_col's documented trade), "
            "move corpus-scale work to explode + codegen"
        )
    return a


def lint(df: DataFrame, allow_hofs: bool = False) -> list[str]:
    """Just the warnings (empty list = nothing suspicious).

    ``allow_hofs=True`` suppresses the interpreted-HOF rules for plans
    where the trade is deliberate — streaming per-row projections that
    cannot run an explode+groupBy in append mode, or lambdas over
    contractually tiny arrays (a 5-language score map).
    """
    warns = audit(df).warnings
    if allow_hofs:
        warns = [w for w in warns if not w.startswith("[hof]")]
    return warns
