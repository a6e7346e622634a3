"""N-vs-4N scaling evidence (BASELINE.json criterion; sandbox protocol per
BASELINE.md): run the SAME end-to-end pipeline on the SAME corpus at
local[8] and local[32] in fresh JVMs, report throughput at both and the
scaling efficiency (throughput_4N / throughput_N) / 4.

Usage: python tools/scaling_bench.py [n_docs] [mega_spans]
Writes BENCH/scaling.json and prints a summary.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]


def run(cpus: int, n_docs: int, mega: int) -> dict:
    env = dict(
        os.environ,
        SPARK_GRAFT_CPUS=str(cpus),
        SPARK_GRAFT_BENCH_DOCS=str(n_docs),
        SPARK_GRAFT_BENCH_MEGA=str(mega),
        # identical plan at both levels: fixed shuffle partitions, and a
        # warm repeat so steady-state throughput is measured (JIT +
        # python-worker startup excluded — they are per-process constants,
        # not per-document work)
        SPARK_GRAFT_SHUFFLE_PARTITIONS="32",
        SPARK_GRAFT_BENCH_REPEATS="2",
        SPARK_GRAFT_SF_DIR=os.environ.get(
            "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
        ),
    )
    out = subprocess.run(
        [sys.executable, str(REPO / "bench.py")],
        env=env,
        capture_output=True,
        text=True,
        timeout=3600,
    )
    line = [
        ln for ln in out.stdout.strip().splitlines() if ln.startswith("{")
    ][-1]
    return json.loads(line)


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 16000
    mega = int(sys.argv[2]) if len(sys.argv) > 2 else 20000

    # warm the corpus cache once so both runs read identical bytes
    print(f"corpus: {n_docs} docs (+1 mega doc of {mega} spans)")
    r8 = run(8, n_docs, mega)
    print(f"local[8]:  {r8['value']} docs/s "
          f"(pipeline {r8['queries']['pipeline_e2e']}s)")
    r32 = run(32, n_docs, mega)
    print(f"local[32]: {r32['value']} docs/s "
          f"(pipeline {r32['queries']['pipeline_e2e']}s)")

    eff = (r32["value"] / r8["value"]) / 4.0
    summary = {
        "n_docs": n_docs,
        "mega_spans": mega,
        "local8_docs_per_sec": r8["value"],
        "local32_docs_per_sec": r32["value"],
        "local8": r8,
        "local32": r32,
        "scaling_efficiency": round(eff, 3),
        "target": 0.8,
        "pass": eff >= 0.8,
    }
    bench_dir = REPO / "BENCH"
    bench_dir.mkdir(exist_ok=True)
    (bench_dir / "scaling.json").write_text(json.dumps(summary, indent=2))
    print(json.dumps({k: summary[k] for k in
                      ("local8_docs_per_sec", "local32_docs_per_sec",
                       "scaling_efficiency", "pass")}))


if __name__ == "__main__":
    main()
