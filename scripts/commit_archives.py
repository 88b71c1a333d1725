#!/usr/bin/env python3
"""Commit the newest fp16 checkpoint archive so pre-training survives resets.

Round 3 lost its pre-training twice: a container reset destroyed an
uncommitted 13.8k-step checkpoint, and the latest-only prune cycle unlinked
already-committed archives so the end-of-round snapshot committed their
deletion. This watcher closes the loop:

  * every --interval seconds it looks for the newest `step-*.fp16.npz`
    in the watched ckpts dir;
  * when that archive is >= --commit-every steps ahead of the newest one
    tracked by git (history-size control: archives are tens of MB), it
    commits it, retiring the previously tracked archive IN THE SAME COMMIT
    (`git commit -- new old` with `old` removed from disk) so HEAD always
    holds exactly one archive — the newest — and git history keeps the rest;
  * `cli/splat_train._save_ckpt` never unlinks tracked archives, so the
    training loop cannot race this deletion.

Paths-only commits (`git commit -- <paths>`) never sweep in unrelated
staged work. Exits when --pid stops existing (training done) after one
final unconditional commit of the newest archive.
"""

from __future__ import annotations

import argparse
import subprocess
import sys
import time
from pathlib import Path


def _run(args, cwd, check=False):
    r = subprocess.run(args, cwd=cwd, capture_output=True, text=True)
    if check and r.returncode != 0:
        print(f"[commit-archives] {' '.join(args)} failed: {r.stderr.strip()}",
              flush=True)
    return r


def _step(p) -> int:
    import re
    m = re.search(r"step-(\d+)", str(p))
    return int(m.group(1)) if m else -1


def newest_archive(ckpt_dir: Path):
    arcs = sorted(ckpt_dir.glob("step-*.fp16.npz"), key=_step)
    return arcs[-1] if arcs else None


def tracked_archives(ckpt_dir: Path, repo: Path) -> list[Path]:
    r = _run(["git", "ls-files", "--", str(ckpt_dir)], cwd=repo)
    return sorted((repo / line for line in r.stdout.splitlines()
                   if line.endswith(".fp16.npz")), key=_step)


def commit_newest(ckpt_dir: Path, repo: Path, label: str) -> bool:
    new = newest_archive(ckpt_dir)
    if new is None:
        return False
    tracked = tracked_archives(ckpt_dir, repo)
    if tracked and _step(tracked[-1]) >= _step(new):
        return False  # already committed
    if _run(["git", "add", "-f", str(new)], cwd=repo, check=True).returncode:
        return False
    paths = [str(new)]
    for old in tracked:
        if old.resolve() != new.resolve():
            old.unlink(missing_ok=True)  # commit below records the deletion
            paths.append(str(old))
    r = _run(["git", "commit", "-q",
              "-m", f"{label}: archive checkpoint step {_step(new)}",
              "--"] + paths, cwd=repo)
    if r.returncode:
        print(f"[commit-archives] commit failed (will retry): "
              f"{r.stderr.strip()[:200]}", flush=True)
        return False
    print(f"[commit-archives] committed step {_step(new)}", flush=True)
    return True


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("ckpt_dir", help="ckpts dir to watch (or its parent run "
                                     "dir — resolved at each poll)")
    ap.add_argument("--repo", default=".")
    ap.add_argument("--label", default="pretrain")
    ap.add_argument("--interval", type=float, default=300.0)
    ap.add_argument("--commit-every", type=int, default=2500,
                    help="min step distance between committed archives "
                         "(archives are tens of MB; every-500 would bloat "
                         "history by GBs)")
    ap.add_argument("--pid", type=int, default=0,
                    help="exit (after a final commit) when this pid is gone")
    args = ap.parse_args()
    repo = Path(args.repo).resolve()

    def find_dir():
        d = Path(args.ckpt_dir)
        if d.name != "ckpts":  # run dir given — find the ckpts dir inside
            cands = sorted(d.glob("**/ckpts"))
            d = cands[-1] if cands else d
        return d

    while True:
        ckpt_dir = find_dir()
        alive = True
        if args.pid:
            alive = Path(f"/proc/{args.pid}").exists()
        if ckpt_dir.is_dir():
            new = newest_archive(ckpt_dir)
            tracked = tracked_archives(ckpt_dir, repo)
            last = _step(tracked[-1]) if tracked else -10**9
            if new is not None and (
                    _step(new) >= last + args.commit_every or not alive):
                commit_newest(ckpt_dir, repo, args.label)
        if not alive:
            print("[commit-archives] training pid gone — exiting", flush=True)
            return
        time.sleep(args.interval)


if __name__ == "__main__":
    sys.exit(main())
