#!/usr/bin/env python3
"""Build the quiet-close pin (resources/graft/quiet_pin.tsv) from one
or more graft.Bench LONG JSON lines.

    python3 tools/make_quiet_pin.py [--current PIN.tsv] \
        [--rebase q1,q2] BENCH1.json [BENCH2.json ...] \
        > src/main/resources/graft/quiet_pin.tsv

Takes the per-query MIN across every input close — the quiet-window
truth of each query on this host. Bench compares every future close's
per-query median-rel against this vector (the `loaded` component the
CPU-only calib probe cannot see — round-14 close 7 read 1.20x median
inflation under an under-gate probe).

MONOTONE RULE (round-16 verdict item 6, enforced in round 18): a pin
entry may never INCREASE across a refresh — an increase means the
refresh was fed closes from a drifted host, and accepting it would
re-soften the load detector for exactly the drift-prone tier. The
tool therefore merges against the CURRENT pin (``--current``, default
src/main/resources/graft/quiet_pin.tsv next to this script) with
elementwise min; a query whose plan genuinely changed (and may now be
honestly slower) must be named in ``--rebase q1,q2`` to take the
observed value. Running without --current (or with a missing file) is
the bootstrap posture: everything is new, nothing can increase.

An entry increase that is not covered by --rebase is an ERROR: the
tool prints the offending queries to stderr and exits 2 without
emitting a pin.

Only feed it closes from the CURRENT suite on the CURRENT code.
"""
import argparse
import json
import os
import sys


def load_pin(path):
    pin = {}
    if not path or not os.path.isfile(path):
        return pin
    for line in open(path):
        line = line.strip()
        if not line or line.startswith("#"):
            continue
        parts = line.split("\t")
        if len(parts) != 2:
            continue
        try:
            pin[parts[0]] = float(parts[1])
        except ValueError:
            continue
    return pin


def observed_mins(paths):
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
    return pin


def merged(current, observed, rebase):
    """Elementwise min against the current pin (monotone by
    construction); --rebase entries take the observed value (their
    plan changed and the old floor is stale)."""
    out = dict(current)
    for q, t in observed.items():
        if q not in current or q in rebase or t < current[q]:
            out[q] = t
    return out


def main(argv):
    ap = argparse.ArgumentParser()
    default_pin = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "..", "src", "main", "resources", "graft",
                               "quiet_pin.tsv")
    ap.add_argument("--current", default=default_pin,
                    help="current pin to merge against (elementwise min)")
    ap.add_argument("--rebase", default="",
                    help="comma-separated queries whose PLAN CHANGED this "
                         "round: they take the observed value even if "
                         "higher than the current pin")
    ap.add_argument("--no-merge", action="store_true",
                    help="rebuild from the inputs alone (every entry of "
                         "the current pin that would increase must be "
                         "listed in --rebase, else exit 2)")
    ap.add_argument("bench", nargs="+", help="Bench LONG JSON line files")
    args = ap.parse_args(argv)

    rebase = {q for q in args.rebase.split(",") if q}
    current = load_pin(args.current)
    observed = observed_mins(args.bench)

    if args.no_merge:
        # from-scratch rebuild: every increase vs the current pin must
        # be explicitly rebased
        bad = sorted(q for q, t in observed.items()
                     if q in current and t > current[q] and q not in rebase)
        if bad:
            print("ERROR: pin entries would INCREASE without --rebase "
                  "(drifted-host refresh?): " + ", ".join(bad),
                  file=sys.stderr)
            return 2
        out = observed
    else:
        out = merged(current, observed, rebase)

    unknown = sorted(q for q in rebase
                     if q not in observed and q not in current)
    if unknown:
        print("ERROR: --rebase names unknown queries: "
              + ", ".join(unknown), file=sys.stderr)
        return 2

    print("# per-query min across quiet closes; tools/make_quiet_pin.py")
    for q in sorted(out):
        print(f"{q}\t{out[q]:.4f}")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
