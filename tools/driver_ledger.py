"""Cumulative driver-coverage ledger.

Unions every ``CORRECTNESS_r*.json`` in the repo root and prints, per
query key, its best driver outcome so far — then the list of oracled
keys still lacking a green driver row.  The judge rebuilt this by hand
for three rounds; this makes rotation planning mechanical.

Usage::

    PYTHONPATH=. python tools/driver_ledger.py [--quiet]

Exit code is always 0; this is a report, not a gate.
"""

from __future__ import annotations

import glob
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def load_rounds() -> dict[int, dict]:
    rounds: dict[int, dict] = {}
    for path in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        stem = os.path.basename(path)
        try:
            rnum = int(stem.replace("CORRECTNESS_r", "").replace(".json", ""))
        except ValueError:
            continue
        with open(path) as fh:
            rounds[rnum] = json.load(fh)
    return rounds


def row_status(row: dict) -> str:
    """Collapse a driver row to pass / partial / rows_only / fail / error.

    Observed driver row shape (CORRECTNESS_r1-r5): ``{rows_match,
    schema_match, hash_match, spark_rows, oracle_rows, err}``; rows-only
    keys get ``None`` comparison bits with ``err: "no_oracle"`` and a
    non-null ``spark_rows`` (that err value is the driver's contract
    marker for a deliberately un-oracled key, not a failure).

    ``pass`` requires every bit explicitly True — a row with e.g.
    ``rows_match=True, hash_match=None`` is ``partial``, its own status,
    so cumulative driver-green coverage is never overstated.
    """
    err = row.get("err")
    if err and err != "no_oracle":
        return "error"
    bits = [row.get(k) for k in ("rows_match", "schema_match", "hash_match")]
    if all(b is None for b in bits):
        return "rows_only" if row.get("spark_rows") is not None else "error"
    if any(b is False for b in bits):
        return "fail"
    return "pass" if all(b is True for b in bits) else "partial"


def build_ledger() -> dict[str, tuple[str, int]]:
    """key -> (best_status, round_of_that_status).

    pass beats rows_only beats fail beats error; later rounds beat
    earlier for the same status (a later fail overrides an earlier fail,
    but never overrides an earlier pass — cumulative evidence stands,
    except a later FAIL after a pass is surfaced as regressed).
    """
    rank = {"pass": 4, "partial": 3, "rows_only": 2, "fail": 1, "error": 0}
    ledger: dict[str, tuple[str, int]] = {}
    regressed: dict[str, tuple[int, int]] = {}
    rounds = load_rounds()
    for rnum in sorted(rounds):
        for key, row in rounds[rnum].items():
            st = row_status(row)
            prev = ledger.get(key)
            if prev is None or rank[st] >= rank[prev[0]]:
                ledger[key] = (st, rnum)
            elif prev[0] == "pass" and st in ("fail", "error"):
                regressed[key] = (prev[1], rnum)
    for key, (good, bad) in regressed.items():
        print(f"!! REGRESSED: {key} passed r{good} but failed/errored r{bad}")
    return ledger


def main() -> None:
    quiet = "--quiet" in sys.argv
    sys.path.insert(0, REPO)
    from delta_lake_stock_pipeline_spark.operators import all_oracles, all_queries

    queries = all_queries()
    oracles = all_oracles()
    ledger = build_ledger()

    if not quiet:
        print(f"{'key':<32} {'oracled':<8} {'best driver status':<20}")
        for key in queries:
            st = ledger.get(key)
            stxt = f"{st[0]} (r{st[1]})" if st else "never checked"
            print(f"{key:<32} {'yes' if key in oracles else 'no':<8} {stxt}")
        print()

    greens = [k for k in queries if ledger.get(k, ("", 0))[0] == "pass"]
    no_green_oracled = [
        k for k in queries if k in oracles and ledger.get(k, ("", 0))[0] != "pass"
    ]
    never = [k for k in queries if k not in ledger]
    rows_only_keys = [k for k in queries if k not in oracles]
    print(f"query keys: {len(queries)}  oracled: {len(oracles)}")
    print(f"driver-green (cumulative): {len(greens)}")
    print(f"oracled keys with NO green driver row ({len(no_green_oracled)}):")
    for k in no_green_oracled:
        st = ledger.get(k)
        print(f"  {k}  [{st[0]} r{st[1]}]" if st else f"  {k}  [never]")
    print(f"never driver-checked at all: {len(never)}")
    print(f"rows-only (no oracle, contract-allowed): {len(rows_only_keys)}")


if __name__ == "__main__":
    main()
