"""Train the shared head-to-head ORB vocabulary from the synthetic KITTI
sequence and package it as resources/ORBvoc.zip for the reference binary.

The reference loads resources/ORBvoc.zip at Hybrid construction (reference:
src/cml/slam/modslam/Hybrid.cpp:47-51 via readWholeZipFile ->
TemplatedVocabulary.h:1318 loadFromText); no vocabulary asset ships in this
environment, so both engines get one trained on the benchmark sequence's own
descriptor distribution (libcml_tpu loads the identical file through
bow.load_dbow2_text).

Usage: python benchmarks/make_vocab.py [--seq benchmarks/kitti_synth/sequences/04]
                                       [--out benchmarks/refrun]
"""

from __future__ import annotations

import argparse
import os
import sys
import zipfile

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--seq", default=os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        "kitti_synth", "sequences", "04"))
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "refrun"))
    ap.add_argument("--frames", type=int, default=12)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--depth", type=int, default=4)
    args = ap.parse_args()

    import jax.numpy as jnp
    from PIL import Image

    from libcml_tpu.models.indirect.bow import export_dbow2_text
    from libcml_tpu.models.indirect.orb import extract_orb
    from libcml_tpu.ops.image import build_pyramid

    img_dir = os.path.join(args.seq, "image_0")
    files = sorted(os.listdir(img_dir))
    stride = max(1, len(files) // args.frames)
    descs = []
    for fn in files[::stride][:args.frames]:
        img = np.asarray(Image.open(os.path.join(img_dir, fn)), np.float32)
        pyr = build_pyramid(jnp.asarray(img), 4)
        feats = extract_orb(pyr, budget_per_level=512)
        d = np.asarray(feats.desc)[np.asarray(feats.valid)]
        descs.append(d)
    all_desc = np.concatenate(descs)
    print(f"{len(all_desc)} descriptors from {args.frames} frames")

    res_dir = os.path.join(args.out, "resources")
    os.makedirs(res_dir, exist_ok=True)
    txt = os.path.join(res_dir, "ORBvoc.txt")
    n = export_dbow2_text(all_desc, txt, k=args.k, depth=args.depth)
    print(f"{n} leaf words -> {txt}")
    with zipfile.ZipFile(os.path.join(res_dir, "ORBvoc.zip"), "w",
                         zipfile.ZIP_DEFLATED) as z:
        z.write(txt, "ORBvoc.txt")
    print(f"zipped -> {res_dir}/ORBvoc.zip")


if __name__ == "__main__":
    main()
