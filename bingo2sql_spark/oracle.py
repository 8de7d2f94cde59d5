"""Sequential-apply oracle (the differential half of the test strategy).

The reference cross-validates two implementations on one input (remote vs
local parse, core/parser_test.go:434-453). We do the same: the engine's
distributed replay vs this single-threaded, event-at-a-time Python apply
in strict `seq` order — the semantics a MySQL server would produce when
executing the generated SQL sequentially. Compared via per-row
sha256(content) keyed by (repo, path) (BASELINE.json invariant).
"""

from __future__ import annotations

import hashlib

import pandas as pd


def sequential_apply(events: pd.DataFrame, initial: dict | None = None) -> dict:
    """Apply envelope events (pandas; columns seq/op/before/after as
    dicts, optional changed_cols) in ascending seq order. MINIMAL-image
    updates (changed_cols set) merge only keys + changed columns into
    the existing row. Returns {(repo, path): row_dict}."""
    state: dict = dict(initial or {})
    ev = events.sort_values("seq")
    has_changed = "changed_cols" in ev.columns
    for _, e in ev.iterrows():
        op = e["op"]
        if op == "ddl":
            continue
        img = e["after"] if op in ("insert", "update") else e["before"]
        if img is None:
            continue
        if hasattr(img, "asDict"):  # pyspark Row from toPandas()
            img = img.asDict()
        key = (img["repo"], img["path"])
        if op == "delete":
            state.pop(key, None)
        elif op == "update" and has_changed and e["changed_cols"] is not None:
            changed = set(e["changed_cols"]) | {"repo", "path"}
            row = dict(state.get(key, {}))
            row.update({c: v for c, v in dict(img).items() if c in changed})
            state[key] = row
        else:
            state[key] = dict(img)
    return state


def state_checksum(state: dict) -> list[tuple]:
    """Sorted [(repo, path, sha256(content))] — comparable with
    IcebergLiteTable.state_checksum."""
    out = []
    for (repo, path), row in state.items():
        content = row.get("content") or ""
        out.append((repo, path, hashlib.sha256(content.encode()).hexdigest()))
    return sorted(out)


def invert_events(events: pd.DataFrame) -> pd.DataFrame:
    """Pandas mirror of operators.flashback.invert (for the flashback
    round-trip metamorphic test)."""
    ev = events[events["op"] != "ddl"].copy()
    ev["before"], ev["after"] = ev["after"].copy(), ev["before"].copy()
    ev["op"] = ev["op"].map({"insert": "delete", "delete": "insert", "update": "update"})
    ev["seq"] = -ev["seq"]
    return ev
