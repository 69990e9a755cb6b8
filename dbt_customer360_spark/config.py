"""Engine configuration — the reference's var() surface as a dataclass.

Mirrors dbt_project.yml vars: per-source enablement, per-source
customer grain, internal match-id sets, and the fuzzy threshold.
``highest_common_grain`` reproduces macros/get_highest_common_grain.sql
(first source configured at organization grain flips the whole run to
organization; the sibling get_lowest_grain macro is dead code in the
reference and is deliberately NOT ported, SURVEY.md §2.9 M8).
"""

from __future__ import annotations

from dataclasses import dataclass, field

SOURCES = ["zendesk", "marketo", "stripe"]  # macro's iteration order


@dataclass
class Customer360Config:
    using_marketo: bool = True
    using_stripe: bool = True
    using_zendesk: bool = True
    grain: dict[str, str] = field(
        default_factory=lambda: {s: "individual" for s in SOURCES}
    )
    # analog of customer360_internal_match_ids: extra exact-match key
    # columns expected on every cleaned source (pre-sentineled)
    internal_match_ids: list[str] = field(default_factory=list)
    fuzzy_threshold: float = 0.95
    # lineage-cut backend: None = localCheckpoint (executor-local RDD
    # blocks, fine single-JVM); a path = reliable df.checkpoint() so a
    # lost executor cannot sink the run on a real cluster (README §100TB)
    checkpoint_dir: str | None = None

    def highest_common_grain(self) -> str:
        for source in SOURCES:
            if self.grain.get(source, "individual") == "organization":
                return "organization"
        return "individual"

    def enabled_sources(self) -> list[str]:
        out = []
        if self.using_marketo:
            out.append("marketo")
        if self.using_stripe:
            out.append("stripe")
        if self.using_zendesk:
            out.append("zendesk")
        return out
