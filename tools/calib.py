"""Extrinsic-calibration helpers.

Covers the reference's offline calibration scripts
(`src/liorf/scripts/euler2rot.py` — XYZ-Euler angles to a rotation matrix
for the `extrinsicRot` YAML blocks — and `scripts/combineCalib.py` — compose
two xyz/rpy extrinsics into one).  Conventions match the pipeline's
`utils/se3` (intrinsic XYZ / roll-pitch-yaw, R = Rz(yaw) Ry(pitch) Rx(roll)).

    python tools/calib.py euler2rot 0.1 0.2 0.3 [--degrees]
    python tools/calib.py combine --xyz1 1 2 3 --rpy1 0.1 0.2 0.3 \
                                  --xyz2 0.5 -1 2.5 --rpy2 0.5 -0.3 0.7
"""

from __future__ import annotations

import argparse
import json
import sys

import numpy as np


def euler_to_rot(rpy: np.ndarray) -> np.ndarray:
    """XYZ-Euler (roll, pitch, yaw) -> 3x3 rotation, R = Rz Ry Rx."""
    r, p, y = float(rpy[0]), float(rpy[1]), float(rpy[2])
    cr, sr = np.cos(r), np.sin(r)
    cp, sp = np.cos(p), np.sin(p)
    cy, sy = np.cos(y), np.sin(y)
    Rx = np.array([[1, 0, 0], [0, cr, -sr], [0, sr, cr]])
    Ry = np.array([[cp, 0, sp], [0, 1, 0], [-sp, 0, cp]])
    Rz = np.array([[cy, -sy, 0], [sy, cy, 0], [0, 0, 1]])
    return Rz @ Ry @ Rx


def rot_to_euler(R: np.ndarray) -> np.ndarray:
    """Inverse of euler_to_rot (same branch conventions as utils/se3)."""
    pitch = np.arcsin(np.clip(-R[2, 0], -1.0, 1.0))
    roll = np.arctan2(R[2, 1], R[2, 2])
    yaw = np.arctan2(R[1, 0], R[0, 0])
    return np.array([roll, pitch, yaw])


def combine_calib(xyz1, rpy1, xyz2, rpy2):
    """Compose T2 * T1 (apply calib 1, then calib 2) -> (xyz, rpy)."""
    T1 = np.eye(4)
    T1[:3, :3] = euler_to_rot(np.asarray(rpy1, np.float64))
    T1[:3, 3] = np.asarray(xyz1, np.float64)
    T2 = np.eye(4)
    T2[:3, :3] = euler_to_rot(np.asarray(rpy2, np.float64))
    T2[:3, 3] = np.asarray(xyz2, np.float64)
    T = T2 @ T1
    return T[:3, 3], rot_to_euler(T[:3, :3])


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    sub = ap.add_subparsers(dest="cmd", required=True)
    e = sub.add_parser("euler2rot", help="rpy -> rotation matrix")
    e.add_argument("rpy", type=float, nargs=3)
    e.add_argument("--degrees", action="store_true")
    c = sub.add_parser("combine", help="compose two xyz/rpy extrinsics")
    for k in ("xyz1", "rpy1", "xyz2", "rpy2"):
        c.add_argument(f"--{k}", type=float, nargs=3, required=True)
    args = ap.parse_args(argv)
    if args.cmd == "euler2rot":
        rpy = np.asarray(args.rpy, np.float64)
        if args.degrees:
            rpy = np.deg2rad(rpy)
        R = euler_to_rot(rpy)
        # YAML-pasteable row-major list (extrinsicRot block format)
        print(json.dumps({"rot": [round(v, 8) for v in R.reshape(-1)]}))
    else:
        xyz, rpy = combine_calib(args.xyz1, args.rpy1, args.xyz2, args.rpy2)
        print(json.dumps({"xyz": [round(float(v), 8) for v in xyz],
                          "rpy": [round(float(v), 8) for v in rpy]}))


if __name__ == "__main__":
    main(sys.argv[1:])
