#!/usr/bin/env python3
"""Run-until-clean quiet bench (r18 verdict #2): re-run graft.Bench up to
K times and keep the first CLEAN run — run_degraded false AND zero
contaminated entries — as the committed quiet artifact, so the durable
record is machine-picked at final HEAD instead of hand-adjudicated.

The prev chain (target/bench.json — yardstick + per-query medians) is
snapshotted at startup and RESTORED before every attempt, so each retry
is adjudicated against the same committed prior-round artifact. Letting
attempts chain into each other would launder a real cross-round
regression: attempt 1 flags it, the run retries for an unrelated
contamination, and attempt 2 — now comparing against attempt 1's
already-regressed medians — comes back "clean". Seed target/bench.json
with the committed prior BENCH_r*_quiet.json before invoking. A run
that is degraded only because the HOST is slower than the prior
round's (yardstick ratio > 1.15 with empty contamination) still
retries, because absolute totals from such a run are not comparable
across rounds.

Usage: python3 tools/quiet_bench.py OUT.json [max_attempts] [sf_dir] [prev.json]
`prev.json` (r19 verdict #6) seeds target/bench.json with the committed
prior-round quiet artifact before the first attempt — pass the previous
BENCH_r*_quiet.json here instead of hand-copying it. Starting PREV-LESS
(no seed argument and no pre-existing target/bench.json) is almost
always a mistake — every attempt then runs un-compared (no cross-round
growers, a null series ratio) — so the picker warns unmissably and
names the artifact to seed from.
Exit 0 with the clean artifact copied to OUT.json; exit 1 if no attempt
came back clean (the LAST run is still copied, loudly marked unclean, so
the round never ends artifact-less).
"""
import json
import pathlib
import re
import shutil
import subprocess
import sys


def main() -> int:
    out = pathlib.Path(sys.argv[1] if len(sys.argv) > 1 else "BENCH_quiet.json")
    max_attempts = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    sf_dir = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.1"
    seed = pathlib.Path(sys.argv[4]) if len(sys.argv) > 4 else None
    bench_out = pathlib.Path("target/bench.json")

    # Snapshot the prior-round prev chain once; every attempt compares
    # against THIS, never against a failed sibling attempt (see module
    # docstring — chaining would launder cross-round regressions). The
    # explicit seed argument, when given, IS the snapshot.
    if seed is not None:
        prev_chain = seed.read_bytes()
    else:
        prev_chain = bench_out.read_bytes() if bench_out.exists() else None
    if prev_chain is None:
        latest = sorted(pathlib.Path(".").glob("BENCH_r*_quiet.json"))
        hint = (f"seed it, e.g.:  python3 tools/quiet_bench.py {out} "
                f"{max_attempts} {sf_dir} {latest[-1]}" if latest
                else "no committed BENCH_r*_quiet.json found either")
        print("=" * 72, flush=True)
        print("[quiet_bench] WARNING: starting PREV-LESS - target/bench.json "
              "is absent and no prev artifact argument was given. Every "
              "attempt will run UN-COMPARED: no cross-round growers, a null "
              "series ratio, and the round's delta cannot be adjudicated.",
              flush=True)
        print(f"[quiet_bench] {hint}", flush=True)
        print("=" * 72, flush=True)

    last = None
    for attempt in range(1, max_attempts + 1):
        if prev_chain is not None:
            bench_out.parent.mkdir(parents=True, exist_ok=True)
            bench_out.write_bytes(prev_chain)
        elif bench_out.exists():
            bench_out.unlink()  # no prior round: every attempt runs prev-less
        print(f"[quiet_bench] attempt {attempt}/{max_attempts}", flush=True)
        r = subprocess.run(
            ["sbt", "-batch", "runMain graft.Bench"],
            env={**__import__("os").environ,
                 "SPARK_GRAFT_SF_DIR": sf_dir, "SPARK_GRAFT_CPUS": "8"},
            stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)
        if r.returncode != 0 or not bench_out.exists():
            print(f"[quiet_bench] attempt {attempt}: bench run failed "
                  f"(rc={r.returncode})", flush=True)
            continue
        text = bench_out.read_text()
        last = text
        try:
            artifact = json.loads(text)
            degraded = bool(artifact.get("run_degraded", True))
            contaminated = artifact.get("contaminated", ["unparsed"])
        except json.JSONDecodeError:
            # The artifact is one hand-built JSON line; fall back to the
            # same regex reads the bench itself uses on its prev chain.
            degraded = '"run_degraded":false' not in text
            m = re.search(r'"contaminated":\[([^\]]*)\]', text)
            contaminated = [x for x in (m.group(1).split(",") if m else ["?"])
                            if x.strip()]
        print(f"[quiet_bench] attempt {attempt}: run_degraded={degraded} "
              f"contaminated={contaminated}", flush=True)
        if not degraded and not contaminated:
            shutil.copyfile(bench_out, out)
            print(f"[quiet_bench] clean run on attempt {attempt} -> {out}",
                  flush=True)
            return 0
    if last is not None:
        shutil.copyfile(bench_out, out)
        print(f"[quiet_bench] NO clean run in {max_attempts} attempts; "
              f"copied the LAST (unclean) run to {out} - adjudicate by hand",
              flush=True)
    else:
        print("[quiet_bench] every attempt failed to produce an artifact",
              flush=True)
    return 1


if __name__ == "__main__":
    sys.exit(main())
