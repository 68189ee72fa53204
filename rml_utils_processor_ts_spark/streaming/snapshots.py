"""Snapshot-batch runner: the Spark replacement for the reference's
source-update machinery (/root/reference/src/rml/rml.ts:276-404):

  * readiness barrier — a mapping executes only when every declared
    logical source has a snapshot (rml.ts:113,372);
  * FIFO sequencing — concurrent snapshot pushes are queued and replayed
    in arrival order (promise chain at rml.ts:67-80, buffer :289-296);
  * trigger semantics — trigger sources re-execute the mapping per new
    snapshot, non-trigger sources are static dimensions (rml.ts:416-424);
  * per-publisher state re-keying — a publisher id extracted from the
    raw snapshot partitions CDC state (rml.ts:302-370), here a regex
    column in the composite state key.

On a cluster the snapshot sequence is the Iceberg commit log
(``start-snapshot-id`` incremental reads); here an in-order list.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import SparkSession

from ..operators.cdc import StateStore
from ..operators.executor import ExecutionResult, PlanExecutor
from ..plans.model import MappingPlan
from ..plans.rml_parser import parse_mapping


@dataclass
class SnapshotRunner:
    """Feed mapping documents + source snapshots in any order; mappings
    execute when the barrier is satisfied, snapshots queue FIFO."""

    spark: SparkSession
    state_root: str | None = None
    publisher_ref: str | None = None
    publisher_regex: str | None = None
    # A6 trigger semantics (/root/reference/src/rml/rml.ts:416-424):
    # sources listed here get their data invalidated after every run —
    # each new snapshot re-executes the mapping; other sources behave as
    # static dimensions (read once, reused across runs).
    trigger_sources: set[str] = field(default_factory=set)
    plans: dict[str, MappingPlan] = field(default_factory=dict)
    _buffers: dict[str, list[str]] = field(default_factory=dict)
    _current: dict[str, str] = field(default_factory=dict)
    results: list[ExecutionResult] = field(default_factory=list)

    def add_mapping(self, mapping_turtle: str) -> str:
        """Register a mapping; content-hash key dedupes re-pushed docs
        (the md5 registry analog, rml.ts:97-101). Registering also
        drains: data may arrive BEFORE the mapping (the reference's
        'data input arriving before mappings' scenario,
        /root/reference/test/rml.test.ts:515-574, where the mapping
        stream's end triggers execution over already-buffered
        snapshots) — runs land in ``self.results``."""
        plan = parse_mapping(mapping_turtle, add_prefixes=True)
        key = plan.plan_hash()
        self.plans[key] = plan
        self._drain()
        return key

    def declared_sources(self) -> set[str]:
        out: set[str] = set()
        for plan in self.plans.values():
            for tm in plan.triples_maps:
                out.add(tm.logical_source.source)
        return out

    def push_snapshot(self, source: str, payload: str) -> list[ExecutionResult]:
        """Buffer a snapshot for ``source``; drain executable runs."""
        self._buffers.setdefault(source, []).append(payload)
        return self._drain()

    def _barrier_ok(self) -> bool:
        return all(
            s in self._current or self._buffers.get(s)
            for s in self.declared_sources()
        )

    def _drain(self) -> list[ExecutionResult]:
        ran: list[ExecutionResult] = []
        while self._barrier_ok():
            progressed = False
            for s in self.declared_sources():
                if self._buffers.get(s):
                    self._current[s] = self._buffers[s].pop(0)
                    progressed = True
            if not progressed:
                break
            ran.append(self._run_once())
            # trigger reset: these sources must receive a NEW snapshot
            # before the next execution (rml.ts:416-424)
            for s in self.trigger_sources:
                self._current.pop(s, None)
        return ran

    def _run_once(self) -> ExecutionResult:
        bindings = {src: "inline:" + payload for src, payload in self._current.items()}
        store = StateStore(self.spark, self.state_root) if self.state_root else None
        merged: ExecutionResult | None = None
        for plan in self.plans.values():
            bound = MappingPlan(
                triples_maps=[
                    _rebind_tm(tm, bindings) for tm in plan.triples_maps
                ],
                source_bindings=bindings,
            )
            ex = PlanExecutor(
                self.spark,
                state_store=store,
                publisher_ref=self.publisher_ref,
                publisher_regex=self.publisher_regex,
            )
            result = ex.execute(bound)
            # Materialize before the state commit: the run's output must
            # not observe its own state update. Executor-side checkpoint
            # (never a driver collect — a table-backed source would pull
            # the whole triple set through the driver; on a cluster this
            # is checkpoint() against the checkpoint dir).
            result.triples = _materialize_triples(result.triples)
            if store is not None:
                store.commit_all(result.state_updates)
            merged = result if merged is None else ExecutionResult(
                triples=merged.triples.unionByName(result.triples)
            )
        assert merged is not None, "no mappings registered"
        self.results.append(merged)
        return merged


def _materialize_triples(df):
    """localCheckpoint with the Spark 4.1.2 guard: constraint propagation
    disabled during normalization (UnionBase.rewriteConstraints crashes on
    CDC plans whose union branches share a relation — same root cause and
    shared lock as operators/cc.py), RDD-roundtrip fallback."""
    from ..operators.cc import constraint_propagation_disabled

    spark = df.sparkSession
    with constraint_propagation_disabled(spark):
        try:
            return df.localCheckpoint(eager=True)
        except Exception:  # noqa: BLE001 — Py4JJavaError, resolver bug
            return spark.createDataFrame(df.rdd, df.schema).localCheckpoint(eager=True)


def _rebind_tm(tm, bindings: dict[str, str]):
    from copy import deepcopy

    out = deepcopy(tm)
    if out.logical_source.source in bindings:
        out.logical_source.source = bindings[out.logical_source.source]
    return out
