"""Import-mode state machine — SURVEY.md I1.

Mirrors the reference's ImportMode
(/root/reference/docker/helpers.py:238-405): flags (replication,
replication_update, update, force) resolve to slim/append/post-sql behavior,
and ``okay_to_run`` guards against clobbering newer-version outputs unless
forced (the version-monotonicity check, helpers.py:376-405).
"""

from __future__ import annotations

from dataclasses import dataclass


def _version_tuple(v: str) -> tuple[int, ...]:
    parts = []
    for p in v.split("."):
        digits = "".join(ch for ch in p if ch.isdigit())
        parts.append(int(digits) if digits else 0)
    return tuple(parts)


@dataclass(frozen=True)
class ImportMode:
    replication: bool = False
    replication_update: bool = False
    update: str | None = None  # None | 'create' | 'append'
    force: bool = False

    def __post_init__(self):
        if self.update not in (None, "create", "append"):
            raise ValueError("update must be None, 'create' or 'append'")
        if self.replication_update and not self.replication:
            raise ValueError("replication_update requires replication")

    @property
    def slim_no_drop(self) -> bool:
        """Keep intermediate state across runs (reference: --slim without
        --drop when replication or append mode, helpers.py:364-374)."""
        return self.replication or self.update == "append"

    @property
    def append_first_run(self) -> bool:
        return self.update == "append" and not self.replication_update

    @property
    def run_post_sql(self) -> bool:
        """Post-processing (dedup deletes etc.) runs only on fresh imports —
        the reference's dedup-only-on-fresh-import asymmetry
        (helpers.py:376-389, SURVEY.md §3.3)."""
        return not self.replication_update and self.update != "append"

    def okay_to_run(self, prior: dict | None, engine_version: str) -> bool:
        """Refuse to overwrite outputs produced by a newer engine version
        unless forced (helpers.py okay_to_run semantics)."""
        if self.force or prior is None:
            return True
        prior_version = prior.get("engine_version", "0")
        if _version_tuple(prior_version) > _version_tuple(engine_version):
            return False
        if prior.get("status") == "running":
            return False
        return True
