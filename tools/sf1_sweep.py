#!/usr/bin/env python3
"""Scale cross-check driver: run tools/compare.py once per oracle-paired
query in parallel subprocesses, each under a hard timeout, and bucket the
results. The per-query timeout is what makes a full-registry sf1 sweep
practical: brute pair oracles that are quadratic on a ×10-replicated corpus
classify themselves as TIMEOUT instead of stalling the sweep, and the
summary separates value-exact / mismatch / timeout / error so the BASELINE
record can cite one number.

Usage: python3 tools/sf1_sweep.py <sfDir> <verifyOutDir> [timeoutSec] [par]
"""
import json, subprocess, sys, os
from concurrent.futures import ThreadPoolExecutor

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    timeout = int(sys.argv[3]) if len(sys.argv) > 3 else 180
    par = int(sys.argv[4]) if len(sys.argv) > 4 else 8
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    names = sorted(n for n in oracles if os.path.isdir(f"{out_dir}/{n}"))
    here = os.path.dirname(os.path.abspath(__file__))

    def one(name):
        try:
            r = subprocess.run(
                [sys.executable, f"{here}/compare.py", sf_dir, out_dir, name],
                capture_output=True, text=True, timeout=timeout)
            line = (r.stdout.strip().splitlines() or ["(no output)"])[-1]
            return (name, "OK" if r.returncode == 0 else "FAIL", line)
        except subprocess.TimeoutExpired:
            return (name, "TIMEOUT", f"> {timeout}s in DuckDB")

    with ThreadPoolExecutor(max_workers=par) as ex:
        results = list(ex.map(one, names))

    buckets = {}
    for name, status, line in results:
        buckets.setdefault(status, []).append((name, line))
    for status in ("FAIL", "TIMEOUT", "OK"):
        for name, line in buckets.get(status, []):
            if status != "OK":
                print(f"[{status}] {name}: {line}")
    ok = len(buckets.get("OK", []))
    print(f"\nSUMMARY: {ok} OK / {len(buckets.get('FAIL', []))} FAIL / "
          f"{len(buckets.get('TIMEOUT', []))} TIMEOUT of {len(names)} compared")
    for name, line in sorted(buckets.get("OK", [])):
        print(f"  OK {name}: {line}")
    sys.exit(1 if buckets.get("FAIL") else 0)

main()
