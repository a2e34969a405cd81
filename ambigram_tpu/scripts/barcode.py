"""10x linked-read barcode evidence -> .juncs file.

Port of /root/reference/script/process_barcode.py: assigns barcode
intervals to segment spans, weights segment links by
|shared barcode set| * span length, and emits the top-5 links as
segment runs. The shared-barcode intersection is done with vectorized
set membership over a barcode x segment incidence matrix rather than
pairwise Python set intersections.
"""

from __future__ import annotations

import argparse
from typing import Dict, List, Sequence, Tuple

import numpy as np


def read_seg(seg_path: str) -> List[List]:
    segs = []
    for line in open(seg_path, "r").read().splitlines():
        if not line:
            continue
        info = line.split("\t")[0]
        chrom = info.split(":")[0]
        pos = info.split(":")[1]
        segs.append(
            [chrom, int(pos.split("-")[0]), int(pos.split("-")[1]), len(segs) + 1]
        )
    return segs


def read_barcode(bed_path: str, segs: List[List]) -> List[List[str]]:
    """Assign each barcode interval to its snapped segment span
    (process_barcode.py:13-49)."""
    group: List[List[str]] = [[] for _ in segs]
    for line in open(bed_path, "r").read().splitlines():
        if not line:
            continue
        info = line.split("\t")
        chrom = info[0]
        if chrom[0] != "c":
            chrom = "chr" + chrom
        pos1, pos2 = int(info[1]), int(info[2])
        code = info[3]
        start = end = -1
        min1 = min2 = float("inf")
        for i, seg in enumerate(segs):
            if chrom != seg[0]:
                continue
            if i == 0 and pos1 <= seg[1]:
                start = i
            elif i == len(segs) - 1 and pos2 >= seg[2]:
                end = i
            else:
                if abs(seg[1] - pos1) < min1:
                    start = i
                    min1 = abs(seg[1] - pos1)
                if abs(seg[2] - pos2) < min2:
                    end = i
                    min2 = abs(seg[2] - pos2)
        if start > end or not (0 <= start < len(segs)) or not (0 <= end < len(segs)):
            continue
        for i in range(start, end + 1):
            group[i].append(code)
    return group


def incidence_matrix(group: List[List[str]]) -> Tuple[np.ndarray, List[str]]:
    """Barcode x segment boolean incidence matrix."""
    codes = sorted({c for arr in group for c in arr})
    index = {c: i for i, c in enumerate(codes)}
    mat = np.zeros((len(codes), len(group)), dtype=bool)
    for s, arr in enumerate(group):
        for c in arr:
            mat[index[c], s] = True
    return mat, codes


def link_weights(group: List[List[str]], intervals: List[List[int]]) -> List[List[int]]:
    """Weight = |intersection of barcode sets over [i..j]| * (j - i),
    computed as a running AND over the incidence matrix
    (vectorizes process_barcode.py:51-57,81)."""
    mat, _ = incidence_matrix(group)
    links = []
    for interval in intervals:
        for i in range(interval[0], interval[1]):
            running = mat[:, i].copy()
            for j in range(i + 1, interval[1] + 1):
                running &= mat[:, j]
                w = int(running.sum()) * (j - i)
                links.append([i + 1, j + 1, w])
    links.sort(key=lambda x: x[2], reverse=True)
    return links


def barcode2juncs(seg_path: str, bed_path: str, junc_path: str, top: int = 5) -> str:
    segs = read_seg(seg_path)
    group = read_barcode(bed_path, segs)
    intervals = []
    source = 0
    for i in range(1, len(segs)):
        if segs[i][0] != segs[source][0]:
            intervals.append([source, i - 1])
            source = i
    if source < len(segs):
        intervals.append([source, len(segs) - 1])
    links = link_weights(group, intervals)
    res = ""
    for i in range(min(top, len(links))):
        for seg in range(links[i][0], links[i][1]):
            res += str(seg) + "+ "
        res += str(links[i][1]) + "+\n"
    with open(junc_path, "w") as f:
        f.write(res)
    return junc_path


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(
        description="Generate .juncs from 10x barcode BED + SEG file."
    )
    parser.add_argument("-bed", "--bed_file", dest="bedPath", required=True)
    parser.add_argument("-seg", "--seg_file", dest="segPath", required=True)
    parser.add_argument("-s", "--sample_name", dest="sampleName", default="sample")
    args = parser.parse_args(argv)
    barcode2juncs(args.segPath, args.bedPath, "%s.juncs" % args.sampleName)
    return 0


if __name__ == "__main__":
    import sys

    sys.exit(main())
