"""Per-target output routing (SURVEY.md §2.A9/B14): each logical target
declared in the mapping gets its triples written in ITS declared
rmlt:serialization; triples without a target go to the default sink as
N-Quads — the Spark replacement for the reference's per-target temp-file
collection (/root/reference/src/rml/rml.ts:446-482).
"""

from __future__ import annotations

import hashlib
import os

from ..plans.model import LogicalTarget, MappingPlan
from .nquads import write_serialized


def _safe_dirname(target_id: str) -> str:
    tail = target_id.rsplit("/", 1)[-1].rsplit(":", 1)[-1] or "target"
    safe = "".join(c if c.isalnum() or c in "-_." else "_" for c in tail)
    return f"{safe}_{hashlib.md5(target_id.encode()).hexdigest()[:8]}"


def plan_targets(plan: MappingPlan) -> dict[str, LogicalTarget]:
    """target_id -> LogicalTarget declared anywhere in the plan
    (subject maps AND predicate-object/object maps)."""
    out: dict[str, LogicalTarget] = {}
    for tm in plan.triples_maps:
        lt = tm.subject_map.logical_target
        if lt is not None:
            out[lt.target_id] = lt
        for pom in tm.predicate_object_maps:
            if pom.logical_target is not None:
                out[pom.logical_target.target_id] = pom.logical_target
    return out

def write_targets(result, plan: MappingPlan, out_dir: str, partitions: int = 8) -> dict[str, str]:
    """Write every target of an ExecutionResult under ``out_dir`` in its
    declared serialization (file:// dataDump locations are honored;
    other targets land in deterministic per-target directories). Returns
    target_id -> written path."""
    targets = plan_targets(plan)
    written: dict[str, str] = {}
    for target_id in result.target_ids():
        df = result.for_target(target_id)
        lt = targets.get(target_id)
        serialization = lt.serialization if lt is not None else None
        location = lt.location if lt is not None else None
        if location and location.startswith("file://"):
            path = location[len("file://"):]
        else:
            path = os.path.join(out_dir, _safe_dirname(target_id))
        write_serialized(df, path, serialization, partitions)
        written[target_id] = path
    return written
