"""Summarize an on-chip queue log into one structured JSON report.

The queue (run_onchip_queue.sh) interleaves `set -x` traces with JSON
lines printed by the individual tools (bench_dcn_variants, the
profilers, bench.py ...).  This collects every JSON object line, tags
it with the queue step it appeared under, and prints a compact digest —
the input for updating RESULTS.md after a measurement run.

    python experiments/summarize_onchip_log.py /tmp/onchip_r3.log
"""
from __future__ import annotations

import json
import re
import sys


def main(path: str) -> None:
    step = "preamble"
    records = []
    steps_seen = []
    with open(path, errors="replace") as f:
        for line in f:
            line = line.strip()
            m = re.match(r"^=== (.+?) ===$", line)
            if m:
                step = m.group(1)
                steps_seen.append(step)
                continue
            if line.startswith("--- "):
                # sub-label within a step (formulation/layout loops)
                step = step.split(" | ")[0] + " | " + line[4:].strip()
                continue
            if not (line.startswith("{") and line.endswith("}")):
                continue
            try:
                obj = json.loads(line)
            except ValueError:
                continue
            records.append({"step": step, **obj})

    print(json.dumps({
        "steps_started": steps_seen,
        "queue_complete": any("QUEUE COMPLETE" in s for s in steps_seen),
        "n_json_records": len(records),
    }))
    for r in records:
        print(json.dumps(r))


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/tmp/onchip_r3.log")
