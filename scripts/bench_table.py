"""Render benchmarks/*.txt (reference `loglen: ns` format) as a markdown
table against BASELINE.md's 64-core numbers.  Usage:
    python scripts/bench_table.py
"""

import os
import sys

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# reference 64-core numbers (seconds / bytes), BASELINE.md
BASE = {
    "ligero": {
        13: (0.0149, 0.00376, 0.00616, 207704),
        15: (0.0314, None, None, 329184),
        17: (0.0949, 0.00588, 0.0128, 564584),
        19: (0.245, None, None, 1027824),
        21: (0.646, 0.0187, 0.0273, 1946744),
        23: (1.92, None, None, None),
        25: (5.73, 0.140, 0.0752, 7430024),
        27: (21.6, 0.421, 0.136, 14728464),
    },
    "sdig": {
        13: (0.0118, 0.0253, 0.0097, 4402016),
        15: (None, None, None, None),
        17: (0.0243, 0.0386, 0.0314, 6900784),
        19: (None, None, None, None),
        21: (0.234, 0.105, 0.270, 16175624),
        23: (None, None, None, None),
        25: (2.243, 0.281, 0.551, 50336784),
        27: (10.69, 0.931, 2.371, 96017376),
        29: (38.8, 2.047, 2.401, 186315104),
    },
    # 20210807_64c_255bit_ligero_hlf{,_pvs}.txt (rho = 1/2)
    "hlf": {
        13: (0.0092, 0.00452, 0.01182, 285584),
        15: (0.0219, 0.00458, 0.00650, 442584),
        17: (0.0624, 0.00597, 0.00960, 744224),
        19: (0.174, 0.00962, 0.01436, 1335144),
        21: (0.367, 0.02225, 0.02212, 2504624),
        23: (1.043, 0.04810, 0.03500, 4831224),
        25: (3.212, 0.146, 0.0577, 9472064),
        27: (11.50, 0.449, 0.106, 18741384),
        29: (45.53, 1.540, 0.201, 37267664),
    },
    # 20210807_64c_255bit_ligero_isz{,_pvs}.txt (rho = 38/39)
    "isz": {
        13: (0.0136, 0.02559, 0.00847, 4325992),
        15: (0.0151, 0.02904, 0.01223, 5296520),
        17: (0.0343, 0.03790, 0.01974, 6962536),
        19: (0.0926, 0.05568, 0.03064, 10019528),
        21: (0.254, 0.09516, 0.05056, 15858472),
        23: (0.470, 0.161, 0.0877, 27481352),
        25: (2.084, 0.332, 0.164, 50452008),
        27: (7.528, 0.792, 0.325, 95898248),
        29: (28.24, 2.130, 0.647, 186735784),
    },
    # 20210615_32core_96bit.txt cargo benches (Blake3; see tpu_96bit notes)
    "ft63": {
        16: (0.0150, None, None, None),
        20: (0.123, None, None, None),
        24: (1.517, None, None, None),
    },
}


def parse(path):
    rows = {}
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            head, rest = line.split(":", 1)
            lgl = int(head)
            parts = rest.split()
            if len(parts) == 1:
                rows.setdefault(lgl, {})["commit"] = int(parts[0]) / 1e9
            else:
                rows.setdefault(lgl, {})["prove"] = int(parts[0]) / 1e9
                rows[lgl]["verify"] = int(parts[1]) / 1e9
                rows[lgl]["size"] = int(parts[2])
    return rows


def fmt(v, base):
    if v is None:
        return "—"
    s = f"{v*1e3:.0f} ms" if v < 1 else f"{v:.2f} s"
    if base:
        s += f" ({base/v:.2f}x)"
    return s


def main():
    for name, fname in (
        ("Ligero rho=1/4 ft255", "tpu_255bit_ligero_dfl_pvs.txt"),
        ("Brakedown code3 ft255", "tpu_255bit_sdig_pvs.txt"),
        ("Ligero rho=1/2 ft255 (hlf)", "tpu_255bit_ligero_hlf_pvs.txt"),
        ("Ligero rho=38/39 ft255 (isz)", "tpu_255bit_ligero_isz_pvs.txt"),
        ("Ligero rho=1/4 ft63 (96-bit analogue)",
         "tpu_96bit_ligero_dfl_pvs.txt"),
    ):
        path = os.path.join(HERE, "benchmarks", fname)
        if not os.path.exists(path):
            continue
        if "hlf" in fname:
            key = "hlf"
        elif "isz" in fname:
            key = "isz"
        elif "96bit" in fname:
            key = "ft63"
        elif "ligero" in fname:
            key = "ligero"
        else:
            key = "sdig"
        rows = parse(path)
        print(f"\n### {name} (1 TPU v5e chip vs reference 64-core CPU; "
              f"x>1 = TPU faster)\n")
        print("| log2 N | commit | prove | verify | proof bytes |")
        print("|---|---|---|---|---|")
        for lgl in sorted(rows):
            r = rows[lgl]
            b = BASE[key].get(lgl, (None,) * 4)
            size = r.get("size")
            size_s = f"{size:,}" if size else "—"
            if size and b[3]:
                size_s += " ✓" if size == b[3] else f" (ref {b[3]:,})"
            print(
                f"| {lgl} | {fmt(r.get('commit'), b[0])} "
                f"| {fmt(r.get('prove'), b[1])} "
                f"| {fmt(r.get('verify'), b[2])} | {size_s} |"
            )


if __name__ == "__main__":
    main()
