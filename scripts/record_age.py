"""Record-age ledger (r9 verdict item 7): which round last gave each
registry key an official driver CORRECTNESS record, so the per-round
`_WINDOW` rotation in data_webhooks_spark/registry.py is selected from
data instead of archaeology.

Aggregates every CORRECTNESS_r*.json in the repo root: a key's "latest
record" is the highest round whose file contains it, and the record is
GREEN if rows+schema+hash all match (or rows-only for the designed
no-oracle keys) with no err. Prints, oldest first:

    <round> <green|RED> <key>

plus a tail summary (count per round, reds, registry keys with NO
record ever). Feed the head of this list into next round's rotation.

Usage: python scripts/record_age.py [--json]
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def load_records() -> dict[str, tuple[int, bool]]:
    """key -> (latest round with a record, that record is green)."""
    latest: dict[str, tuple[int, bool]] = {}
    for path in sorted(glob.glob(os.path.join(ROOT, "CORRECTNESS_r*.json"))):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if not m:
            continue
        rnd = int(m.group(1))
        with open(path) as f:
            data = json.load(f)
        for key, rec in data.items():
            if rec.get("err") == "no_oracle":
                # designed rows-only key (approximate/ML): the driver
                # records spark_rows with no oracle side; green = ran
                green = rec.get("spark_rows") is not None
            else:
                green = bool(
                    rec.get("rows_match")
                    and rec.get("schema_match") is not False
                    and rec.get("hash_match") is not False
                    and not rec.get("err")
                )
            prev = latest.get(key)
            if prev is None or rnd >= prev[0]:
                latest[key] = (rnd, green)
    return latest


def main() -> int:
    from data_webhooks_spark import registry

    keys = list(registry.queries())
    latest = load_records()
    rows = sorted(
        ((latest.get(k, (0, False))[0], latest.get(k, (0, False))[1], k) for k in keys),
    )
    if "--json" in sys.argv:
        print(
            json.dumps(
                {k: {"round": r, "green": g} for r, g, k in rows}, indent=None
            )
        )
        return 0
    for rnd, green, key in rows:
        print(f"r{rnd:02d} {'green' if green else 'RED  '} {key}")
    per_round: dict[int, int] = {}
    for rnd, _, _ in rows:
        per_round[rnd] = per_round.get(rnd, 0) + 1
    print("---")
    print(
        "per-round:",
        " ".join(f"r{r}:{n}" for r, n in sorted(per_round.items())),
    )
    reds = [k for r, g, k in rows if r and not g]
    never = [k for r, _, k in rows if r == 0]
    print(f"reds: {len(reds)}", *reds)
    print(f"never-recorded: {len(never)}", *never)
    return 1 if reds or never else 0


if __name__ == "__main__":
    raise SystemExit(main())
