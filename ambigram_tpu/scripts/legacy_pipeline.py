"""Legacy localhap pipeline utilities.

Capability ports of the reference's `script/main.py`, `script/bpsmap.py`,
`script/config.py` and `script/e_size.py` (pandas/pysam/pybedtools
pipelines), with pure-Python replacements where the external tool added
nothing (e.g. fasta extraction instead of pybedtools):

- vcf2sv / parse_snif_vcf        main.py:590-708, :742-788
- path2bed                       localhap.cpp:353-381 (bed writer)
- bfb2fasta / seg2fasta          main.py:537-588, :709-741
- merge_near_pos / map_bps       bpsmap.py:214-276
- mergedb                        main.py:361-438 (junction DB merge)
- segmentation / dedup           config.py:46-70
- hg38 chromosome sizes          e_size.py
"""

from __future__ import annotations

from typing import Dict, Iterable, List, Optional, Sequence, Tuple

# effective hg38 chromosome sizes used by the simulation drivers
# (reference script/e_size.py)
HG38_SIZES: Dict[str, int] = {
    "chr1": 230481121,
    "chr2": 240548241,
    "chr3": 198100144,
    "chr4": 189752667,
    "chr5": 181265378,
    "chr6": 170078524,
    "chr7": 158970135,
    "chr8": 144768136,
    "chr9": 121790553,
    "chr10": 133263006,
    "chr11": 134533742,
    "chr12": 133137821,
    "chr13": 97983128,
    "chr14": 90568149,
    "chr15": 84641328,
    "chr16": 81805944,
    "chr17": 82920216,
    "chr18": 80089650,
    "chr19": 58440758,
    "chr20": 63944268,
    "chr21": 40088623,
    "chr22": 39159782,
}


# ------------------------------------------------------------------ fasta

_COMP = str.maketrans("ACGTacgtNn", "TGCAtgcaNn")


def revcomp(seq: str) -> str:
    return seq.translate(_COMP)[::-1]


def read_fasta(path: str) -> Dict[str, str]:
    seqs: Dict[str, str] = {}
    name = None
    chunks: List[str] = []
    with open(path) as f:
        for line in f:
            line = line.rstrip("\n")
            if line.startswith(">"):
                if name is not None:
                    seqs[name] = "".join(chunks)
                name = line[1:].split()[0]
                chunks = []
            else:
                chunks.append(line)
    if name is not None:
        seqs[name] = "".join(chunks)
    return seqs


def extract_bed_sequence(fasta: Dict[str, str], bed_rows: Iterable[Sequence]) -> str:
    """Concatenate (chrom, start, end, strand) rows into one sequence
    (strand-aware; 0-based half-open like bedtools getfasta -s)."""
    out = []
    for row in bed_rows:
        chrom, start, end = row[0], int(row[1]), int(row[2])
        strand = row[3] if len(row) > 3 else "+"
        seq = fasta[chrom][start:end]
        out.append(revcomp(seq) if strand == "-" else seq)
    return "".join(out)


def path_to_bed(path_steps: List[Tuple[int, str]], segments) -> List[Tuple[str, int, int, str]]:
    """BFB path -> bed rows of maximal same-strand runs
    (reference localhap.cpp:353-381, the commented bed writer).
    `segments`: seg_id -> object with .chrom/.start/.end."""
    if not path_steps:
        return []
    rows: List[Tuple[str, int, int, str]] = []
    run_start = 0
    for k in range(1, len(path_steps) + 1):
        if k == len(path_steps) or path_steps[k][1] != path_steps[run_start][1]:
            first = segments[path_steps[run_start][0]]
            last = segments[path_steps[k - 1][0]]
            strand = path_steps[run_start][1]
            if strand == "+":
                rows.append((first.chrom, first.start, last.end, "+"))
            else:
                # on '-' a vertex's "end" is the segment start
                # (src/Vertex.cpp:28-30), so the run spans
                # [last segment's start, first segment's end]
                rows.append((first.chrom, last.start, first.end, "-"))
            run_start = k
    return rows


def bfb2fasta(ref_fasta_path: str, bed_rows: Iterable[Sequence], out_fasta: str, name: str = "BFBPATH") -> None:
    """Path bed -> one concatenated sequence (main.py bfb2fasta without
    the pybedtools dependency)."""
    fasta = read_fasta(ref_fasta_path)
    seq = extract_bed_sequence(fasta, bed_rows)
    with open(out_fasta, "w") as f:
        f.write(">%s\n%s\n" % (name, seq))


def seg2fasta(seg_path: str, ref_fasta_path: str, out_fasta: str) -> None:
    """SEG file -> per-segment fasta (main.py:709-741)."""
    fasta = read_fasta(ref_fasta_path)
    with open(out_fasta, "w") as out:
        for line in open(seg_path).read().splitlines():
            if not line:
                continue
            info = line.split("\t")[0]
            chrom, interval = info.split(":")
            start, end = interval.split("-")
            out.write(
                ">%s:%s-%s(+)\n%s\n"
                % (chrom, start, end, fasta[chrom][int(start) : int(end)])
            )


# ----------------------------------------------------------------- vcf2sv

def vcf2sv(vcf_path: str, output_prefix: str) -> str:
    """longranger-style SV table -> sv.txt, keeping inter-chromosomal /
    inversion entries and their FBI-adjacent neighbors
    (main.py:610-637)."""
    arr = []
    for line in open(vcf_path).read().splitlines():
        if not line:
            continue
        entry = line.split("\t")
        depth = entry[13].split("DP:")[1].split(" ")[0]
        arr.append([entry[0], entry[1], entry[2], entry[3], entry[4], entry[5], depth])
    sv = []

    def is_fbi(e):
        return e[0] == e[3] and e[2] != e[5]

    if len(arr) > 1 and is_fbi(arr[1]):
        sv.append(arr[0])
    for i in range(1, len(arr) - 1):
        if arr[i][0] != arr[i][3] or arr[i][2] != arr[i][5]:
            sv.append(arr[i])
        elif is_fbi(arr[i - 1]) or is_fbi(arr[i + 1]):
            sv.append(arr[i])
    if len(arr) > 1 and is_fbi(arr[-2]):
        sv.append(arr[-1])
    out_path = "%s_sv.txt" % output_prefix
    with open(out_path, "w") as f:
        f.write("chrom_5p\tbkpos_5p\tstrand_5p\tchrom_3p\tbkpos_3p\tstrand_3p\tavg_cn\n")
        for d in sv:
            f.write("\t".join(d) + "\n")
    return out_path


def parse_snif_vcf(vcf_path: str, out_sv: str) -> str:
    """Sniffles VCF -> sv.txt with strand remapping (main.py:742-788)."""
    inv = ("++", "--")
    trans = ("[", "]", "N")
    rows = []
    for line in open(vcf_path).read().splitlines():
        if not line or line[0] == "#":
            continue
        entry = line.split("\t")
        strands = ""
        for item in entry[7].split(";"):
            if item[:8] == "STRANDS=":
                strands = item[-2:]
                break
        if strands in inv or (entry[4][0] in trans and len(entry[4]) > 1) or entry[4] == "<TRA>":
            new_str = {"+-": "++", "++": "+-", "--": "-+", "-+": "--"}.get(strands, strands)
            info = entry[7].split(";")
            chrom_3p = info[2][5:]
            pos_3p = info[3][4:]
            num_v_reads = entry[9].split(":")[-1]
            if chrom_3p and chrom_3p[0] != "c":
                chrom_3p = "chr" + chrom_3p
            chrom_5p = entry[0] if entry[0][0] == "c" else "chr" + entry[0]
            rows.append(
                "%s\t%s\t%s\t%s\t%s\t%s\t%s"
                % (chrom_5p, entry[1], new_str[0], chrom_3p, pos_3p, new_str[1], num_v_reads)
            )
    with open(out_sv, "w") as f:
        f.write("chrom_5p\tbkpos_5p\tstrand_5p\tchrom_3p\tbkpos_3p\tstrand_3p\tavg_cn\n")
        f.write("\n".join(rows) + ("\n" if rows else ""))
    return out_sv


# ----------------------------------------------------------------- bpsmap

def merge_near_pos(poses: Sequence[int], threshold: int) -> List[int]:
    """Collapse positions within `threshold` of the previous kept one
    (bpsmap.py:214-222)."""
    r = [poses[0]]
    for i in range(1, len(poses)):
        if poses[i] - poses[i - 1] > threshold:
            r.append(poses[i])
    return r


def map_bps(bps: Sequence[int], r: int = 20, radius: int = 10) -> List[Tuple[int, int]]:
    """Cluster breakpoints within `radius` and map each to the
    most-central pivot (bpsmap.py:249-268, without sklearn)."""
    bps = sorted(bps)
    clusters: List[List[int]] = []
    cur = [bps[0]]
    for p in bps[1:]:
        if p - cur[-1] <= radius:
            cur.append(p)
        else:
            clusters.append(cur)
            cur = [p]
    clusters.append(cur)
    out: List[Tuple[int, int]] = []
    for cluster in clusters:
        counts = [sum(1 for q in cluster if abs(q - p) < r) for p in cluster]
        pivot = cluster[counts.index(max(counts))]
        for p in cluster:
            out.append((p, pivot))
    return out


def get_breakpoints(pos_5p: Sequence[int], pos_3p: Sequence[int], is_virus: bool = False) -> List[int]:
    """Union of SV breakpoints with +-300 flanks for host chromosomes
    (bpsmap.py:223-229)."""
    svs = sorted(set(pos_5p) | set(pos_3p))
    if not is_virus:
        svs.insert(0, svs[0] - 300)
        svs.append(svs[-1] + 300)
    return svs


# ----------------------------------------------------------------- config

def dedup_sv(rows: List[List]) -> List[List]:
    """Drop duplicate SV rows by (5p, 3p) key (config.py:46-51)."""
    seen = set()
    out = []
    for row in rows:
        key = (row[0], row[1], row[2], row[3], row[4], row[5])
        if key not in seen:
            seen.add(key)
            out.append(row)
    return out


def segmentation(
    breakpoints: Dict[str, List[int]], id_start: int = 1
) -> List[Tuple[int, str, int, int]]:
    """Breakpoints per chromosome -> (id, chrom, start, end) segments
    (config.py:52-70's core)."""
    segs = []
    seg_id = id_start
    for chrom in breakpoints:
        bps = sorted(set(breakpoints[chrom]))
        for a, b in zip(bps[:-1], bps[1:]):
            segs.append((seg_id, chrom, a, b))
            seg_id += 1
    return segs


def mergedb(db_paths: Sequence[str], out_path: str) -> str:
    """Merge junction DB TSVs, summing support of identical records
    (main.py mergedb capability)."""
    agg: Dict[Tuple, int] = {}
    header = "chrom_5p\tpos_5p\tstrand_5p\tchrom_3p\tpos_3p\tstrand_3p\tcount"
    for path in db_paths:
        lines = open(path).read().splitlines()
        for line in lines[1:]:
            if not line:
                continue
            tok = line.split("\t")
            key = tuple(tok[:6])
            agg[key] = agg.get(key, 0) + int(float(tok[6]))
    with open(out_path, "w") as f:
        f.write(header + "\n")
        for key in sorted(agg):
            f.write("\t".join(key) + "\t%d\n" % agg[key])
    return out_path
