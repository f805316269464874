#!/usr/bin/env python3
"""Staged tests for promote.py (the r14 per-line guard + merge-min
amendment). Run: python3 tools/test_promote.py — prints PASS/FAIL per
case, exit 0 iff all pass."""
import json
import os
import subprocess
import sys
import tempfile

HERE = os.path.dirname(os.path.abspath(__file__))


def run(*args):
    return subprocess.run(
        [sys.executable, os.path.join(HERE, "promote.py"), *args],
        capture_output=True, text=True)


def rec(path, queries, record_ok=True, cpus=32):
    with open(path, "w") as f:
        json.dump({"cpus": cpus, "record_ok": record_ok,
                   "queries": queries}, f)
    return path


def main():
    ok = True

    def check(name, cond, detail=""):
        nonlocal ok
        print(f"{'PASS' if cond else 'FAIL'} {name} {detail}")
        ok = ok and cond

    d = tempfile.mkdtemp(prefix="promote_test_")
    base = {f"q{i}": 1.0 for i in range(20)}
    canon = rec(f"{d}/canon.json", dict(base, slow=50.0))

    # 1. guard fires: healthy median, one line 1.6x and +30s — the
    # line must NOT be adopted; the promoted file keeps the old value
    cand = rec(f"{d}/cand.json", dict(base, slow=80.0))
    r = run(cand, canon, "--apply", "--out", f"{d}/new.json")
    promoted = json.load(open(f"{d}/new.json"))["queries"]
    check("guard keeps old value", r.returncode == 0
          and "GUARD slow" in r.stdout and promoted["slow"] == 50.0,
          f"(rc={r.returncode})")

    # 2. adjudicated value is adopted instead
    r = run(cand, canon, "--adjudicated", "slow=55.0",
            "--apply", "--out", f"{d}/new2.json")
    promoted = json.load(open(f"{d}/new2.json"))["queries"]
    check("adjudicated value adopted", r.returncode == 0
          and promoted["slow"] == 55.0)

    # 3. a small-absolute-delta slowdown (2x but +0.5s) is NOT guarded
    cand3 = rec(f"{d}/cand3.json", dict(base, q0=2.0))
    r = run(cand3, canon, "--apply", "--out", f"{d}/new3.json")
    promoted = json.load(open(f"{d}/new3.json"))["queries"]
    check("sub-threshold delta adopted", r.returncode == 0
          and "GUARD" not in r.stdout and promoted["q0"] == 2.0)

    # 4. median over the bar refuses
    cand4 = rec(f"{d}/cand4.json", {k: v * 1.2 for k, v in base.items()})
    r = run(cand4, canon)
    check("median>1.05 refused", r.returncode == 1)

    # 5. non-record_ok refused
    cand5 = rec(f"{d}/cand5.json", base, record_ok=False)
    r = run(cand5, canon)
    check("non-record_ok refused", r.returncode == 1)

    # 6. merge-min: per-line min across 3 agreeing sessions; new line
    # present in one session only still gets a row
    s1 = rec(f"{d}/s1.json", dict(base, q0=1.2))
    s2 = rec(f"{d}/s2.json", dict(base, q0=0.9))
    s3 = rec(f"{d}/s3.json", dict(base, q0=1.1, extra=3.0))
    r = run("--merge-min", s1, s2, s3, "--canon", canon,
            "--apply", "--out", f"{d}/merged.json")
    m = json.load(open(f"{d}/merged.json"))["queries"]
    check("merge-min composite", r.returncode == 0
          and m["q0"] == 0.9 and m["extra"] == 3.0 and "slow" not in m)
    check("merge-min line count", len(m) == 21, f"(got {len(m)})")

    # 7. merge-min refuses disagreeing sessions
    s4 = rec(f"{d}/s4.json", {k: v * 1.4 for k, v in base.items()})
    r = run("--merge-min", s1, s2, s4)
    check("merge-min disagreement refused", r.returncode == 1)

    # 8. merge-min refuses a non-record_ok input
    r = run("--merge-min", s1, s2, f"{d}/cand5.json")
    check("merge-min non-record_ok refused", r.returncode == 1)

    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
