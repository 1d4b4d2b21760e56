"""Result tables from run records — the analysis-notebook replacement.

The reference ships notebooks (``clip_searcher/runs_analysis/*.ipynb``) that
parse JSON log records by their ``type`` field into result tables. This CLI
does the same over this framework's ``records.jsonl`` files:

    python tools/result_tables.py outputs/            # all runs below a dir
    python tools/result_tables.py run1 run2 --type searcher_result --top 10
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def load_log_records(roots, record_type=None):
    records = []
    for root in roots:
        for p in Path(root).rglob("records.jsonl"):
            for line in p.read_text().splitlines():
                try:
                    rec = json.loads(line)
                except json.JSONDecodeError:
                    continue
                if record_type is None or rec.get("type") == record_type:
                    rec["_run"] = str(p.parent)
                    records.append(rec)
    return records


def _flat(rec, prefix=""):
    out = {}
    for k, v in rec.items():
        if k.startswith("_"):
            continue
        if isinstance(v, dict):
            out.update(_flat(v, f"{prefix}{k}."))
        else:
            out[f"{prefix}{k}"] = v
    return out


def render_table(records, sort_by="acc1", top=20):
    rows = [_flat(r) for r in records]
    rows.sort(key=lambda r: -float(r.get(sort_by, float("-inf")) or float("-inf")))
    rows = rows[:top]
    if not rows:
        print("(no records)")
        return
    cols = sorted({k for r in rows for k in r}, key=lambda c: (c != sort_by, c))
    widths = {c: max(len(c), *(len(str(r.get(c, ""))[:40]) for r in rows)) for c in cols}
    print(" | ".join(c.ljust(widths[c]) for c in cols))
    print("-+-".join("-" * widths[c] for c in cols))
    for r in rows:
        print(" | ".join(str(r.get(c, ""))[:40].ljust(widths[c]) for c in cols))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("roots", nargs="+", help="run dirs (searched recursively)")
    ap.add_argument("--type", default="searcher_result")
    ap.add_argument("--sort", default="acc1")
    ap.add_argument("--top", type=int, default=20)
    args = ap.parse_args()
    records = load_log_records(args.roots, args.type)
    print(f"{len(records)} '{args.type}' records")
    render_table(records, sort_by=args.sort, top=args.top)


if __name__ == "__main__":
    main()
