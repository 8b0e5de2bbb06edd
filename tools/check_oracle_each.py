#!/usr/bin/env python3
"""Per-query isolated form of check_oracle.py — one subprocess per gate
with a wall timeout, for LARGE scale factors where a monolithic DuckDB
session accumulates tens of GB across queries (observed: the sf1 run
OOM'd after 9 queries; per-query isolation passed 18/20 in <300 s each,
flagging only the two genuinely heavy oracles).

Usage: python3 tools/check_oracle_each.py <sfDir> <verifyOutDir> [timeoutSec]
"""
import json, os, shutil, subprocess, sys

def main():
    sf_dir, src = sys.argv[1], sys.argv[2]
    timeout = int(sys.argv[3]) if len(sys.argv) > 3 else 300
    oracle = json.load(open(f"{src}/oracle_sql.json"))
    results = {}
    work = "/tmp/check_oracle_each"
    for name in sorted(oracle):
        d = f"{work}/{name}"
        shutil.rmtree(work, ignore_errors=True)
        os.makedirs(d)
        os.symlink(os.path.abspath(f"{src}/{name}"), f"{d}/{name}")
        json.dump({name: oracle[name]}, open(f"{d}/oracle_sql.json", "w"))
        try:
            r = subprocess.run(
                ["python3", os.path.join(os.path.dirname(__file__),
                                         "check_oracle.py"), sf_dir, d],
                capture_output=True, text=True, timeout=timeout)
            line = [l for l in r.stdout.splitlines()
                    if l.startswith(("PASS", "FAIL", "ERROR"))]
            results[name] = line[0][:160] if line else f"rc={r.returncode}"
        except subprocess.TimeoutExpired:
            results[name] = f"TIMEOUT>{timeout}s (oracle infeasible at this sf)"
        print(name, "->", results[name], flush=True)
    n_pass = sum(1 for v in results.values() if v.startswith("PASS"))
    n_to = sum(1 for v in results.values() if v.startswith("TIMEOUT"))
    print(f"\n{n_pass}/{len(results)} pass" +
          (f" ({n_to} TIMEOUT - oracle infeasible, NOT verified)" if n_to else ""))
    # exit codes: 0 = all verified PASS; 3 = no failure but some oracles
    # timed out (a diverging gate could hide behind a slow oracle — the
    # caller must explicitly acknowledge, never fold into green); 1 = FAIL
    if not all(v.startswith(("PASS", "TIMEOUT")) for v in results.values()):
        sys.exit(1)
    sys.exit(3 if n_to else 0)

if __name__ == "__main__":
    main()
