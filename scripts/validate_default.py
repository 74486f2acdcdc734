"""Flagship-shape validation gate for default-graph changes (VERDICT r3 #2).

Round 3 twice shipped a changed default traced graph without a
flagship-shape TPU run, and the driver's bench then measured the default
NON-FINITE both times (BENCH_r03.json). The rule this script enforces:

    Every commit that changes the traced DEFAULT graph (new kernel
    default, conv form flip, dtype policy, remat policy, ...) must cite a
    finite run of this script at HEAD in triage/validate_default.log.

What it does: runs the exact bench measurement protocol (bench.py
--child — flagship FlyingThings3D eval shape, batch 4, 576x960, 8192
points, serial-dependency timing chain, full flow_2d/flow_3d finiteness
readback) in a child process under the SHIPPING default environment plus
any ``NAME=VALUE`` overrides given on the command line, then appends one
JSON line with the git revision, dirty state, overrides, and result to
triage/validate_default.log. Exits 0 only for a finite, trustworthy
measurement.

Usage:
    python scripts/validate_default.py                      # shipping default
    python scripts/validate_default.py --label probe-einsum \
        RPEFLOW_CONV1X1_EINSUM=1                            # A/B probe
"""

from __future__ import annotations

import datetime
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
LOG = os.path.join(REPO, "triage", "validate_default.log")

#: env vars that shape the traced default graph; recorded (inherited value
#: or "<default>") so every log line pins down exactly which graph ran.
GRAPH_VARS = (
    "RPEFLOW_NO_PALLAS", "RPEFLOW_NO_PALLAS_CORR", "RPEFLOW_NO_PALLAS_FPS",
    "RPEFLOW_NO_PALLAS_MDTA", "RPEFLOW_NO_PALLAS_GDFN", "RPEFLOW_NO_PALLAS_DW",
    "RPEFLOW_PALLAS_ALL", "RPEFLOW_PALLAS_MDTA", "RPEFLOW_PALLAS_GDFN",
    "RPEFLOW_PALLAS_DW", "RPEFLOW_CONV1X1_EINSUM", "RPEFLOW_GROUPED_CONV",
    "RPEFLOW_DW_IMPL", "RPEFLOW_FUSER_BF16", "RPEFLOW_PYRAMID_BF16",
    "RPEFLOW_NO_REMAT", "RPEFLOW_S2D_BLOCKS", "RPEFLOW_DW_BF16",
    "RPEFLOW_SEGMENTED", "RPEFLOW_SEGMENTS",
)


def _git(*args: str) -> str:
    try:
        return subprocess.run(["git", *args], cwd=REPO, text=True,
                              stdout=subprocess.PIPE).stdout.strip()
    except OSError:
        return "unknown"


def main() -> int:
    label = "default"
    overrides: dict[str, str] = {}
    args = sys.argv[1:]
    while args:
        a = args.pop(0)
        if a == "--label":
            label = args.pop(0)
        elif "=" in a:
            k, v = a.split("=", 1)
            overrides[k] = v
        else:
            print(__doc__, file=sys.stderr)
            return 2

    env = dict(os.environ)
    env.update(overrides)
    env["RPEFLOW_BENCH_LABEL"] = label
    graph_env = {k: env.get(k, "<default>") for k in GRAPH_VARS
                 if k in env or k in overrides}

    bench = os.path.join(REPO, "bench.py")
    timeout = float(env.get("RPEFLOW_VALIDATE_TIMEOUT_S", "2700"))
    print(f"[validate] label={label} overrides={overrides} "
          f"timeout={timeout:.0f}s", file=sys.stderr)
    try:
        p = subprocess.run([sys.executable, bench, "--child"], env=env,
                           stdout=subprocess.PIPE, stderr=sys.stderr,
                           text=True, timeout=timeout)
        line = next((ln for ln in (p.stdout or "").strip().splitlines()[::-1]
                     if ln.startswith("{")), None)
        result = json.loads(line) if line else None
        rc = p.returncode
    except subprocess.TimeoutExpired:
        result, rc = None, -1
        print(f"[validate] TIMEOUT after {timeout:.0f}s", file=sys.stderr)

    record = {
        "date": datetime.datetime.now(datetime.timezone.utc)
                .strftime("%Y-%m-%dT%H:%M:%SZ"),
        "git_rev": _git("rev-parse", "--short", "HEAD"),
        "git_dirty": bool(_git("status", "--porcelain")),
        "label": label,
        "overrides": overrides,
        "graph_env": graph_env,
        "child_rc": rc,
        "result": result,
    }
    os.makedirs(os.path.dirname(LOG), exist_ok=True)
    with open(LOG, "a") as f:
        f.write(json.dumps(record) + "\n")
    print(f"[validate] appended to {LOG}:", file=sys.stderr)
    print(json.dumps(record, indent=2), file=sys.stderr)

    ok = bool(result and result.get("finite")
              and not result.get("suspect_timing") and rc == 0)
    print(f"[validate] {'PASS' if ok else 'FAIL'}", file=sys.stderr)
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
