#!/usr/bin/env python3
"""Multi-chip scaling-efficiency projection: ties the measured collective
volumes (SCALING_COMM.json, optimized-HLO bytes from tools/
collective_report.py) to the measured single-chip op times
(BENCH_DETAIL.json) in ONE reproducible model, so the >=80 % BASELINE.md
scaling claim is auditable without multi-chip hardware.

Model (zero-overlap lower bound; XLA overlaps collectives with compute
when schedulable, so real efficiency is higher):

    eff(P) >= (t_comp / P) / (t_comp / P + t_comm(P))
    t_comm(P) = (bytes_total(P) / P) / ICI_BW
    bytes_total(P) = bytes_measured * ((P-1)/P) / ((P_rec-1)/P_rec)

* ``t_comp`` — the op's measured single-chip device time
  (BENCH_DETAIL.json, chained-slope method).
* ``bytes_measured`` — global bytes moved by every collective in the
  GSPMD-partitioned HLO of the limb-sharded op (SCALING_COMM.json),
  recorded at mesh size ``P_rec``; ring collectives move (P-1)/P of the
  data, hence the normalization when projecting to another P.  Per-chip
  bytes are total/P (each chip sources/sinks its shard).
* ``ICI_BW`` — one sustained v5e ICI link, 45 GB/s.  A 2D torus has 4
  links per chip, so this is conservative.

The output (SCALING_PROJ.json) embeds sha256 fingerprints of both input
files; tests/test_scaling_projection.py recomputes the projection and
fails if the checked-in output drifted from the checked-in inputs — the
model and its inputs stay pinned together.

Usage: python tools/scaling_projection.py [--write]   (default: print)
"""

import argparse
import hashlib
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ICI_BW_BYTES_PER_US = 45_000  # 45 GB/s = 45,000 bytes/us
MESHES = (2, 4, 8)

# Which BENCH_DETAIL row supplies t_comp for each SCALING_COMM op label.
# behz_extend is the only communicating stage of the composed BFV multiply,
# so the multiply row's full time is the right t_comp for that op's
# efficiency (the other stages are embarrassingly limb-parallel).
_TCOMP_SOURCE = {
    "key_switch": lambda d, n: d.get(f"ckks_{n}", {}).get("relinearize"),
    "behz_extend": lambda d, n: d.get(f"bfv_{n}", {}).get("multiply"),
    "ntt_forward": lambda d, n: d.get(f"ntt_{n}", {}).get("ntt_forward"),
}


def _sha256(path):
    with open(path, "rb") as f:
        return hashlib.sha256(f.read()).hexdigest()


def compute(repo=REPO):
    comm_path = os.path.join(repo, "SCALING_COMM.json")
    bench_path = os.path.join(repo, "BENCH_DETAIL.json")
    comm = json.load(open(comm_path))
    bench = json.load(open(bench_path))

    rows = []
    for key, entry in sorted(comm.items()):
        if not isinstance(entry, dict) or "ops" not in entry:
            continue
        n = entry["n"]
        for op in entry["ops"]:
            label = op["label"]
            kind = label.split()[0]
            src = _TCOMP_SOURCE.get(kind)
            if src is None:
                continue
            t_comp = src(bench, n)
            if t_comp is None:
                continue
            P_rec = entry["devices"]
            row = {
                "op": label,
                "n": n,
                "t_comp_us": round(t_comp, 2),
                "collective_bytes": op["total_bytes"],
                "recorded_mesh": P_rec,
                "eff": {},
            }
            for P in MESHES:
                ring = ((P - 1) / P) / ((P_rec - 1) / P_rec)
                t_shard = t_comp / P
                t_comm = (op["total_bytes"] * ring / P) / ICI_BW_BYTES_PER_US
                row["eff"][str(P)] = round(t_shard / (t_shard + t_comm), 3)
            rows.append(row)

    # The batch data-parallel axis moves zero collective bytes by
    # construction (independent ciphertexts) — include it explicitly so the
    # table states the configuration that reaches the >=80 % target.
    rows.append({
        "op": "batch axis (any op, B>=P ciphertexts)",
        "n": None,
        "t_comp_us": None,
        "collective_bytes": 0,
        "eff": {str(P): 1.0 for P in MESHES},
    })

    return {
        "model": "eff(P) = (t_comp/P) / (t_comp/P + bytes/(P*BW)); zero-overlap lower bound",
        "ici_bw_bytes_per_us": ICI_BW_BYTES_PER_US,
        "inputs": {
            "SCALING_COMM.json": _sha256(comm_path),
            "BENCH_DETAIL.json": _sha256(bench_path),
        },
        "rows": rows,
    }


def render(proj):
    lines = ["| op | t_comp 1-chip | bytes | eff P=2 | P=4 | P=8 |",
             "|---|---|---|---|---|---|"]
    for r in proj["rows"]:
        t = f"{r['t_comp_us']:.0f} us" if r["t_comp_us"] else "—"
        b = f"{r['collective_bytes'] / 1e6:.2f} MB" if r["collective_bytes"] else "0"
        e = r["eff"]
        lines.append(
            f"| {r['op']} | {t} | {b} | {e['2']:.0%} | {e['4']:.0%} | {e['8']:.0%} |")
    return "\n".join(lines)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--write", action="store_true",
                    help="write SCALING_PROJ.json (default: print only)")
    args = ap.parse_args()
    proj = compute()
    print(render(proj))
    if args.write:
        out = os.path.join(REPO, "SCALING_PROJ.json")
        with open(out, "w") as f:
            json.dump(proj, f, indent=1)
        print(f"wrote {out}")


if __name__ == "__main__":
    sys.exit(main())
