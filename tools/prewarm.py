"""Prewarm the persistent compilation cache for the bench/app configs.

A cold machine's first frame pays the real XLA compile (plain ~10 s,
rich ~13 s, mega ~48-130 s on the tunneled chip — ROADMAP
"Compile-time findings"); the persistent cache (.jax_cache) absorbs it
for every later process. This tool is the install step that takes the
hit once, deliberately: it renders one frame of each shipped bench
config in a fresh subprocess (the same code path `bench.py` uses, so
the cache keys match exactly), including the escalated-capacity mega
programs and the in-graph device-probe scans.

Usage:
    python tools/prewarm.py            # all bench configs
    python tools/prewarm.py plain rich # a subset

Evidence that it works: `python bench.py` suite runs a --cold-cache rich
leg (fresh temp cache) and prints cold-vs-warm first-frame walls; after
prewarm, the warm number is what a fresh process sees.
"""

from __future__ import annotations

import os
import subprocess
import sys
import time

CONFIGS = {
    "plain": [],
    "rich": ["--rich"],
    "animate": ["--animate"],
    "mega": ["--mega"],
}


def main():
    names = [a for a in sys.argv[1:] if a in CONFIGS] or list(CONFIGS)
    bench = os.path.join(os.path.dirname(__file__), "..", "bench.py")
    for name in names:
        cmd = [
            sys.executable, os.path.abspath(bench), *CONFIGS[name],
            "--overflow-probe", "--no-extras", "--frames", "1",
        ]
        if name == "mega":
            cmd.append("--escalate-caps")
        t0 = time.perf_counter()
        print(f"prewarm {name}: {' '.join(cmd[2:])}", flush=True)
        p = subprocess.run(cmd, capture_output=True, text=True,
                           timeout=3600)
        status = "ok" if p.returncode == 0 else f"rc={p.returncode}"
        print(
            f"prewarm {name}: {status} in {time.perf_counter() - t0:.0f}s",
            flush=True,
        )


if __name__ == "__main__":
    main()
