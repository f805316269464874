#!/usr/bin/env python3
"""Canonical-promotion tool for bench records (VERDICT r13 #1/#5).

The promotion rule lives in SCALE.md ("Measurement convention"); this
tool is its machine-checkable form, so a promotion decision consumes a
program's output instead of a human diffing JSON files.

Modes
-----
1. Single-candidate promotion:
       promote.py CANDIDATE.json CANONICAL.json [--adjudicated q=secs]...
                  [--apply --out NEW.json]
   Gates: candidate must be record_ok, cpus must match, common-line
   MEDIAN ratio <= 1.05. PER-LINE GUARD (r14): a common line whose
   ratio > 1.3 AND absolute delta > 5 s is NOT adopted from the
   candidate — without a rule-3 adjudication (--adjudicated q=secs,
   the isolated min-of-5 value) the OLD canonical value is kept and
   the line is reported loudly. This stops a one-session slowdown
   from becoming the yardstick that hides future regressions behind
   flattering ratios (the r13 100x canonical admitted three such
   lines through the median-only rule).

2. Min-of-sessions merge (the 10x deadlock amendment, r14):
       promote.py --merge-min S1.json S2.json S3.json...
                  [--canon OLD.json] [--apply --out NEW.json]
   When >= 3 record_ok same-cpus sessions agree (pairwise common-line
   medians within 5%) yet all miss <= 1.05 vs a single best-ever
   outlier canonical, the composite per-line MIN across the sessions
   is an honest canonical: every line is a real observation from a
   healthy session, and min-of-N approaches the outlier's luck with
   evidence instead of luck. The per-line guard still applies vs
   --canon: a composite line > 1.3x and > 5 s over the old canonical
   keeps the old value unless adjudicated.

Exit code 0 = promotable (apply allowed); 1 = not promotable.
"""
import json
import statistics
import sys

GUARD_RATIO = 1.3
GUARD_DELTA_S = 5.0
MEDIAN_BAR = 1.05
AGREE_BAR = 0.05


def load(p):
    with open(p) as f:
        return json.load(f)


def queries(rec):
    return {k: float(v) for k, v in rec.get("queries", {}).items()
            if isinstance(v, (int, float)) and v > 0}


def fail(msg):
    print(f"NOT PROMOTABLE: {msg}")
    sys.exit(1)


def apply_guard(adopted, cand_q, canon_q, adjudicated):
    """Returns (adopted, guarded) — guarded lines keep the old
    canonical value unless an adjudicated value was supplied."""
    guarded = []
    for q, v in sorted(cand_q.items()):
        old = canon_q.get(q)
        if old is None:
            adopted[q] = v  # first canonical row for a new line
            continue
        ratio, delta = v / old, v - old
        if ratio > GUARD_RATIO and delta > GUARD_DELTA_S:
            if q in adjudicated:
                adopted[q] = adjudicated[q]
                guarded.append((q, old, v, f"adjudicated={adjudicated[q]}"))
            else:
                adopted[q] = old
                guarded.append((q, old, v, "kept old value — needs rule-3"))
        else:
            adopted[q] = v
    return adopted, guarded


def report_guard(guarded):
    for q, old, new, action in guarded:
        print(f"  GUARD {q}: canonical {old:.3f}s, candidate {new:.3f}s "
              f"({new / old:.2f}x, +{new - old:.1f}s) -> {action}")


def write_out(path, cpus, adopted, note):
    rec = {"metric": "total", "value": round(sum(adopted.values()), 4),
           "unit": "sec", "cpus": cpus, "promotion_note": note,
           "queries": {k: round(v, 4) for k, v in sorted(adopted.items())}}
    with open(path, "w") as f:
        json.dump(rec, f)
        f.write("\n")
    print(f"wrote {path} ({len(adopted)} lines, "
          f"total {rec['value']:.1f}s)")


def main():
    args = sys.argv[1:]
    adjudicated, apply_it, out, canon_path = {}, False, None, None
    rest = []
    i = 0
    while i < len(args):
        a = args[i]
        if a == "--adjudicated":
            q, v = args[i + 1].split("=")
            adjudicated[q] = float(v)
            i += 2
        elif a == "--apply":
            apply_it = True
            i += 1
        elif a == "--out":
            out = args[i + 1]
            i += 2
        elif a == "--canon":
            canon_path = args[i + 1]
            i += 2
        else:
            rest.append(a)
            i += 1

    if rest and rest[0] == "--merge-min":
        sessions = [load(p) for p in rest[1:]]
        if len(sessions) < 3:
            fail("--merge-min needs >= 3 record_ok sessions")
        cpus = sessions[0].get("cpus")
        for p, s in zip(rest[1:], sessions):
            if not s.get("record_ok"):
                fail(f"{p} is not record_ok — a flagged session is "
                     "never promotion input")
            if s.get("cpus") != cpus:
                fail(f"{p} ran cpus={s.get('cpus')}, expected {cpus}")
        qs = [queries(s) for s in sessions]
        # pairwise agreement over common lines
        for i1 in range(len(qs)):
            for i2 in range(i1 + 1, len(qs)):
                common = set(qs[i1]) & set(qs[i2])
                med = statistics.median(
                    qs[i1][q] / qs[i2][q] for q in common)
                if abs(med - 1.0) > AGREE_BAR:
                    fail(f"sessions {rest[1+i1]} and {rest[1+i2]} "
                         f"disagree (median ratio {med:.3f}) — "
                         "min-of-sessions needs agreeing sessions")
        all_q = set().union(*qs)
        composite = {q: min(m[q] for m in qs if q in m) for q in all_q}
        partial = [q for q in all_q if any(q not in m for m in qs)]
        if partial:
            print(f"note: {len(partial)} line(s) present in only some "
                  f"sessions: {sorted(partial)}")
        canon_q = queries(load(canon_path)) if canon_path else {}
        adopted, guarded = apply_guard({}, composite, canon_q, adjudicated)
        common = set(composite) & set(canon_q)
        if common:
            med = statistics.median(
                composite[q] / canon_q[q] for q in common)
            print(f"composite vs old canonical: median {med:.3f} over "
                  f"{len(common)} common lines")
        report_guard(guarded)
        print(f"PROMOTABLE (min of {len(sessions)} agreeing record_ok "
              f"sessions, {len(adopted)} lines)")
        if apply_it:
            if not out:
                fail("--apply needs --out")
            write_out(out, cpus, adopted,
                      f"per-line min of {len(sessions)} record_ok "
                      "sessions (SCALE.md r14 amendment)")
        return

    if len(rest) != 2:
        print(__doc__)
        sys.exit(2)
    cand, canon = load(rest[0]), load(rest[1])
    if not cand.get("record_ok"):
        fail(f"{rest[0]} is not record_ok")
    if cand.get("cpus") != canon.get("cpus"):
        fail(f"cpus mismatch: candidate {cand.get('cpus')} vs "
             f"canonical {canon.get('cpus')}")
    cand_q, canon_q = queries(cand), queries(canon)
    common = set(cand_q) & set(canon_q)
    if not common:
        fail("no common lines")
    med = statistics.median(cand_q[q] / canon_q[q] for q in common)
    print(f"median ratio vs canonical: {med:.3f} over "
          f"{len(common)} common lines")
    adopted, guarded = apply_guard({}, cand_q, canon_q, adjudicated)
    report_guard(guarded)
    if med > MEDIAN_BAR:
        fail(f"median {med:.3f} > {MEDIAN_BAR}")
    print("PROMOTABLE")
    if apply_it:
        if not out:
            fail("--apply needs --out")
        write_out(out, cand.get("cpus"), adopted,
                  f"promoted from {rest[0]} vs {rest[1]}, "
                  f"median {med:.3f}; per-line guard r14")


if __name__ == "__main__":
    main()
