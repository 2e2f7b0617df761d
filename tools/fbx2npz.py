"""Convert an FBX motion clip to the npz format SkeletonMotion loads.

The reference reads FBX through a python-2.7 Autodesk-FBX-SDK subprocess
(/root/reference/smpl_sim/poselib/skeleton/backend/fbx/fbx_read_wrapper.py:30,
fbx_py27_backend.py); the SDK is proprietary and not bundled there either.
This converter closes the same gap one step earlier: run it once on a
machine where the `fbx` python SDK IS importable (Autodesk ships py3 wheels)
and it writes an npz with

    node_names        (J,)   str
    parent_indices    (J,)   int64   (-1 for the root)
    local_rotation    (T,J,4) float32 wxyz quaternions
    root_translation  (T,3)  float32
    fps               ()     float64

which `smplsim_tpu.poselib.SkeletonMotion.from_npz` consumes directly.

Usage:
    python tools/fbx2npz.py input.fbx output.npz [--root-name Hips]
"""
from __future__ import annotations

import argparse
import sys

import numpy as np


def _quat_from_euler_zyx_deg(e):
    """FBX eEulerXYZ local rotation (degrees, applied X then Y then Z in the
    local frame => R = Rz @ Ry @ Rx) -> wxyz quaternion."""
    rx, ry, rz = np.radians(e[..., 0]), np.radians(e[..., 1]), np.radians(e[..., 2])

    def axis_quat(half, axis):
        q = np.zeros(half.shape + (4,))
        q[..., 0] = np.cos(half)
        q[..., 1 + axis] = np.sin(half)
        return q

    def qmul(a, b):
        w1, x1, y1, z1 = np.moveaxis(a, -1, 0)
        w2, x2, y2, z2 = np.moveaxis(b, -1, 0)
        return np.stack([
            w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
            w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
            w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
            w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
        ], axis=-1)

    return qmul(axis_quat(rz / 2, 2), qmul(axis_quat(ry / 2, 1), axis_quat(rx / 2, 0)))


def convert(fbx_path: str, out_path: str, root_name: str | None = None,
            fps_override: float | None = None) -> None:
    try:
        import fbx  # Autodesk FBX SDK python bindings
        import FbxCommon
    except ImportError as e:  # pragma: no cover - requires proprietary SDK
        raise SystemExit(
            "The Autodesk FBX SDK python bindings are not importable in this "
            "environment. Install the SDK (https://aps.autodesk.com/developer/"
            "overview/fbx-sdk, pip wheel `fbx` for py3) and re-run; this "
            "script then writes the npz that SkeletonMotion.from_npz loads."
        ) from e

    manager, scene = FbxCommon.InitializeSdkObjects()
    if not FbxCommon.LoadScene(manager, scene, fbx_path):
        raise SystemExit(f"failed to load {fbx_path}")

    # collect the skeleton-node hierarchy (depth-first, parents before kids)
    names, parents, nodes = [], [], []

    def walk(node, parent_idx):
        attr = node.GetNodeAttribute()
        is_skel = attr is not None and (
            attr.GetAttributeType() == fbx.FbxNodeAttribute.eSkeleton
        )
        idx = parent_idx
        if is_skel or (root_name and node.GetName() == root_name):
            idx = len(names)
            names.append(node.GetName())
            parents.append(parent_idx)
            nodes.append(node)
        for i in range(node.GetChildCount()):
            walk(node.GetChild(i), idx)

    walk(scene.GetRootNode(), -1)
    if not names:
        raise SystemExit("no skeleton nodes found in the FBX scene")

    # animation range + fps
    stack = scene.GetSrcObject(
        fbx.FbxCriteria.ObjectType(fbx.FbxAnimStack.ClassId), 0)
    scene.SetCurrentAnimationStack(stack)
    span = stack.GetLocalTimeSpan()
    time_mode = scene.GetGlobalSettings().GetTimeMode()
    fps = fps_override or fbx.FbxTime.GetFrameRate(time_mode)
    t0 = span.GetStart().GetFrameCount(time_mode)
    t1 = span.GetStop().GetFrameCount(time_mode)
    T = int(t1 - t0 + 1)

    J = len(names)
    local_rot = np.zeros((T, J, 4), np.float32)
    root_trans = np.zeros((T, 3), np.float32)
    local_trans = np.zeros((J, 3), np.float32)   # static bone offsets
    t = fbx.FbxTime()
    for f in range(T):
        t.SetFrame(int(t0 + f), time_mode)
        for j, node in enumerate(nodes):
            lt = node.EvaluateLocalTransform(t)
            q = lt.GetQ()          # xyzw
            local_rot[f, j] = [q[3], q[0], q[1], q[2]]
            tr = lt.GetT()
            if f == 0:
                local_trans[j] = [tr[0], tr[1], tr[2]]
            if j == 0:
                root_trans[f] = [tr[0], tr[1], tr[2]]

    np.savez(
        out_path,
        node_names=np.asarray(names),
        parent_indices=np.asarray(parents, np.int64),
        local_translation=local_trans,
        local_rotation=local_rot,
        root_translation=root_trans,
        fps=float(fps),
    )
    print(f"wrote {out_path}: {J} joints, {T} frames @ {fps} fps")


if __name__ == "__main__":
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("fbx")
    ap.add_argument("out")
    ap.add_argument("--root-name", default=None,
                    help="treat this named node as the skeleton root even if "
                         "it is not an eSkeleton attribute node")
    ap.add_argument("--fps", type=float, default=None)
    args = ap.parse_args()
    convert(args.fbx, args.out, args.root_name, args.fps)
