#!/usr/bin/env python3
"""Build the quiet-close pin (resources/graft/quiet_pin.tsv) from one
or more graft.Bench LONG JSON lines.

    python3 tools/make_quiet_pin.py BENCH1.json [BENCH2.json ...] \
        > src/main/resources/graft/quiet_pin.tsv

Takes the per-query MIN across every input close — the quiet-window
truth of each query on this host. Bench compares every future close's
per-query median-rel against this vector (the `loaded` component the
CPU-only calib probe cannot see — round-14 close 7 read 1.20x median
inflation under an under-gate probe).

Only feed it closes from the CURRENT suite on the CURRENT code: a pin
carrying a stale fast time for a since-slowed query would brand every
honest close loaded. Regenerate whenever query plans change.
"""
import json
import sys


def main(paths):
    pin = {}
    for p in paths:
        for line in open(p):
            line = line.strip()
            if not line.startswith("{"):
                continue
            try:
                d = json.loads(line)
            except json.JSONDecodeError:
                continue
            for q, t in (d.get("queries") or {}).items():
                if t is None:
                    continue
                pin[q] = min(pin.get(q, float("inf")), t)
    print("# per-query min across quiet closes; tools/make_quiet_pin.py")
    for q in sorted(pin):
        print(f"{q}\t{pin[q]:.4f}")


if __name__ == "__main__":
    main(sys.argv[1:])
