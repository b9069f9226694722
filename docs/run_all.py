"""Execute the entire docs corpus — the integration suite.

The reference runs all of its literate docs in CI with a solve cache
(reference: docs/make.jl + src/docs_cache.jl:8,180): its docs ARE its
integration suite. This runner is the piccolax counterpart: every
executable tutorial under docs/ runs in its own subprocess (each doc
configures JAX itself); any assert failure fails the run.

Usage:
    python docs/run_all.py [--jobs N] [--filter SUBSTR] [--list]

Docs are independent processes, so --jobs parallelizes across cores
(default 2; each doc may itself use multiple BLAS threads).
"""

from __future__ import annotations

import argparse
import concurrent.futures as cf
import os
import pathlib
import subprocess
import sys
import time

ROOT = pathlib.Path(__file__).resolve().parent


def doc_files(filter_substr: str | None = None):
    files = [f for f in sorted(ROOT.rglob("*.py"))
             if f.name != pathlib.Path(__file__).name]
    # quickstart first: it is the cheapest smoke and warms import caches
    files.sort(key=lambda f: (f.name != "quickstart.py", str(f)))
    if filter_substr:
        files = [f for f in files if filter_substr in str(f)]
    return files


def run_one(f: pathlib.Path):
    env = dict(os.environ, MPLBACKEND="Agg")
    t0 = time.time()
    r = subprocess.run([sys.executable, str(f)], env=env,
                       capture_output=True, text=True, cwd=str(ROOT.parent))
    return f, r.returncode, time.time() - t0, r.stdout, r.stderr


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--jobs", type=int, default=2)
    ap.add_argument("--filter", default=None)
    ap.add_argument("--list", action="store_true")
    args = ap.parse_args()

    files = doc_files(args.filter)
    if args.list:
        for f in files:
            print(f.relative_to(ROOT))
        return 0

    failures = []
    done = 0
    with cf.ThreadPoolExecutor(max_workers=max(1, args.jobs)) as ex:
        futs = [ex.submit(run_one, f) for f in files]
        for fut in cf.as_completed(futs):
            f, rc, dt, out, err = fut.result()
            done += 1
            status = "ok" if rc == 0 else "FAIL"
            print(f"[{done}/{len(files)}] {f.relative_to(ROOT)}: {status} "
                  f"({dt:.0f}s)", flush=True)
            if rc != 0:
                failures.append(f)
                print("---- stdout tail ----")
                print(out[-2000:])
                print("---- stderr tail ----")
                print(err[-4000:])

    if failures:
        print(f"\n{len(failures)} docs FAILED:")
        for f in failures:
            print(f"  {f.relative_to(ROOT)}")
        return 1
    print(f"\nall {len(files)} docs passed")
    return 0


if __name__ == "__main__":
    sys.exit(main())
