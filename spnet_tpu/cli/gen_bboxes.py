"""`spnet-gen-bboxes` — export axis-aligned bounding boxes of the rotated
ellipses for use with external object detectors.

Capability twin of `/root/reference/gen_bboxes_csv.py`: exact bbox of a
rotated ellipse (extremal points of the parametric curve), clipped to the
frame, one combined CSV `filename,width,height,label,xmin,ymin,xmax,ymax`.
"""

from __future__ import annotations

import argparse
import os

import numpy as np

from spnet_tpu.config import ORIG_IMG_HEIGHT, ORIG_IMG_WIDTH
from spnet_tpu.data.csvio import paired_file_lists, read_raw_meta


def ellipse_bbox(cx, cy, a, b, angle_deg, clip=True,
                 width=ORIG_IMG_WIDTH, height=ORIG_IMG_HEIGHT):
    """Exact axis-aligned bbox of the rotated ellipse.

    For x(t) = cx + a cos t cos th - b sin t sin th the extrema satisfy
    tan t = -b tan(th) / a; closed form: dx = sqrt(a^2 cos^2 th +
    b^2 sin^2 th) (and symmetrically for y) — equivalent to the
    reference's parametric-extrema formulation (`gen_bboxes_csv.py:15-30`,
    which halves axes because it treats a,b as full axes; ours are
    semi-axes like the per-image CSVs)."""
    th = np.radians(angle_deg)
    dx = np.sqrt((a * np.cos(th)) ** 2 + (b * np.sin(th)) ** 2)
    dy = np.sqrt((a * np.sin(th)) ** 2 + (b * np.cos(th)) ** 2)
    xmin, xmax = cx - dx, cx + dx
    ymin, ymax = cy - dy, cy + dy
    if clip:
        xmin, xmax = np.clip(xmin, 0, width), np.clip(xmax, 0, width)
        ymin, ymax = np.clip(ymin, 0, height), np.clip(ymax, 0, height)
    return int(xmin), int(ymin), int(xmax), int(ymax)


def gen_bboxes(datapath: str, out_filename: str,
               label_by_rings: bool = False,
               width=ORIG_IMG_WIDTH, height=ORIG_IMG_HEIGHT) -> int:
    imgs, metas = paired_file_lists(
        datapath if datapath.endswith(os.sep) else datapath + os.sep
    )
    rows = ["filename,width,height,label,xmin,ymin,xmax,ymax"]
    n = 0
    for img, meta in zip(imgs, metas):
        base = os.path.basename(img)
        for r in read_raw_meta(meta):
            cx, cy, a, b, ang, rings = r
            if rings < 1e-6:
                continue
            xmin, ymin, xmax, ymax = ellipse_bbox(cx, cy, a, b, ang,
                                                  width=width,
                                                  height=height)
            label = (f"{int(round(rings))}_rings" if label_by_rings
                     else "object")
            rows.append(f"{base},{width},{height},{label},"
                        f"{xmin},{ymin},{xmax},{ymax}")
            n += 1
    with open(out_filename, "w") as f:
        f.write("\n".join(rows) + "\n")
    return n


def main(argv=None):
    p = argparse.ArgumentParser(
        description="exports bounding boxes from ellipse metadata",
        formatter_class=argparse.ArgumentDefaultsHelpFormatter,
    )
    p.add_argument("-d", "--datapath", required=True,
                   help="directory of paired *.png + *.csv")
    p.add_argument("-o", "--outfile", default="bounding_boxes.csv")
    p.add_argument("--label-by-rings", action="store_true",
                   help="class label = rounded ring count (default: "
                        "single 'object' class)")
    args = p.parse_args(argv)
    n = gen_bboxes(args.datapath, args.outfile,
                   label_by_rings=args.label_by_rings)
    print(f"wrote {n} boxes to {args.outfile}")


if __name__ == "__main__":
    main()
