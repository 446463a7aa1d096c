"""Re-validate (or retire) the pytest-xdist `-n 2` pin in one command.

Background (pyproject.toml / CLAUDE.md): on jax 0.9.0's CPU backend, ONE
process that compiles the full suite's ~190 XLA programs segfaults/aborts
INSIDE a late compile (7/7 serial full-suite runs crashed at round-4 HEAD;
the crash site wanders across test_verify/test_vmap programs and every
isolated rerun passes, so it is a compile-count/process-state regime, not
any single test). Splitting across xdist workers keeps each process below
the trigger regime. Ruled out during round 4: the test_cache singleton
leak (fixed anyway), torch-in-process interference, 0-d dummy while_loop
carries, --xla_cpu_parallel_codegen_split_count=1.

Run AFTER any jax/jaxlib upgrade:

    python tests/serial_compile_repro.py            # 1 serial full-suite run
    python tests/serial_compile_repro.py --runs 3   # more confidence

Exit status 0 = serial run completed (pin droppable if repeated runs agree;
the round-4 evidence needed several runs - the crash is probabilistic).
Exit status 1 = crash reproduced; keep the pin. The observed signature is
recorded either way (return code, signal name, last output lines).

NOT collected by pytest (filename does not match test_*.py) - this is a
harness, not a test: it re-runs the whole suite in a child process.
"""

from __future__ import annotations

import argparse
import pathlib
import signal
import subprocess
import sys
import time

REPO = pathlib.Path(__file__).resolve().parent.parent


def run_serial(timeout_s: float) -> dict:
    """One serial (no-xdist) full-suite run in a child process."""
    cmd = [
        sys.executable, "-m", "pytest", "tests/", "-q",
        "-o", "addopts=",          # drop the pyproject '-n 2' pin
        "-p", "no:cacheprovider",  # no cross-run state
    ]
    t0 = time.time()
    try:
        proc = subprocess.run(
            cmd, cwd=REPO, capture_output=True, text=True, timeout=timeout_s
        )
        rc, out = proc.returncode, proc.stdout + proc.stderr
    except subprocess.TimeoutExpired as e:
        rc = None
        out = ((e.stdout or b"").decode(errors="replace")
               + (e.stderr or b"").decode(errors="replace"))
    elapsed = time.time() - t0

    sig = None
    if rc is not None and rc < 0:
        try:
            sig = signal.Signals(-rc).name
        except ValueError:
            sig = f"signal {-rc}"
    # only rc 0 (all passed) and 1 (ordinary test failures) count as a
    # clean serial completion: signals/timeouts (None, <0, >=128) and
    # pytest rc 2/3/4 (interrupted, INTERNALERROR, usage error) can all be
    # the crash surfacing and must not feed a "pin droppable" verdict
    crashed = rc not in (0, 1)
    return {
        "returncode": rc,
        "signal": sig,
        "crashed": crashed,
        "timed_out": rc is None,
        "elapsed_s": round(elapsed, 1),
        "tail": "\n".join(out.strip().splitlines()[-15:]),
    }


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--runs", type=int, default=1,
                    help="serial full-suite runs (crash is probabilistic; "
                         "round-4 evidence used 7)")
    ap.add_argument("--timeout", type=float, default=3600.0,
                    help="per-run timeout in seconds (suite is ~25 min "
                         "serial on an idle host)")
    args = ap.parse_args()

    any_crash = False
    for i in range(args.runs):
        print(f"=== serial run {i + 1}/{args.runs} (timeout "
              f"{args.timeout:.0f}s) ===", flush=True)
        r = run_serial(args.timeout)
        any_crash |= r["crashed"]
        verdict = (
            f"CRASHED (rc={r['returncode']}, signal={r['signal']})"
            if r["crashed"] and not r["timed_out"]
            else "TIMED OUT (hang - treat as crashed)" if r["timed_out"]
            else f"completed (rc={r['returncode']})"
        )
        print(f"run {i + 1}: {verdict} in {r['elapsed_s']}s")
        print("--- last output lines ---")
        print(r["tail"])
        print()

    if any_crash:
        print("VERDICT: serial crash REPRODUCED - keep the '-n 2' pin "
              "(pyproject.toml addopts).")
        return 1
    print(f"VERDICT: {args.runs} serial run(s) completed without crashing. "
          "The crash was probabilistic at round 4 (7/7 then, but site "
          "wandered); only drop the pin after >=3 clean runs on this "
          "toolchain.")
    return 0


if __name__ == "__main__":
    sys.exit(main())
