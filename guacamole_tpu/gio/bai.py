"""BAM index (.bai) parsing and region queries.

Lets the loader inflate only the byte ranges overlapping the requested loci
(the BAM-index pushdown of the reference's samtools path,
cf. /root/reference .../reads/Read.scala:395-406).
"""

from __future__ import annotations

import struct
from typing import Dict, List, Optional, Tuple

BAI_MAGIC = b"BAI\x01"

Chunk = Tuple[int, int]  # (virtual start, virtual end)


class BamIndex:
    def __init__(self, path: str):
        with open(path, "rb") as f:
            data = f.read()
        if data[:4] != BAI_MAGIC:
            raise ValueError(f"Not a BAI index: {path}")
        n_ref = struct.unpack_from("<i", data, 4)[0]
        pos = 8
        # per reference: bin id -> chunks, plus the 16kb linear index
        self.bins: List[Dict[int, List[Chunk]]] = []
        self.linear: List[List[int]] = []
        for _ in range(n_ref):
            n_bin = struct.unpack_from("<i", data, pos)[0]
            pos += 4
            ref_bins: Dict[int, List[Chunk]] = {}
            for _ in range(n_bin):
                bin_id, n_chunk = struct.unpack_from("<Ii", data, pos)
                pos += 8
                chunks = []
                for _ in range(n_chunk):
                    beg, end = struct.unpack_from("<QQ", data, pos)
                    pos += 16
                    chunks.append((beg, end))
                ref_bins[bin_id] = chunks
            n_intv = struct.unpack_from("<i", data, pos)[0]
            pos += 4
            intervals = list(struct.unpack_from("<%dQ" % n_intv, data, pos))
            pos += 8 * n_intv
            self.bins.append(ref_bins)
            self.linear.append(intervals)

    @staticmethod
    def region_to_bins(beg: int, end: int) -> List[int]:
        """All bin ids that may contain records overlapping [beg, end)."""
        if end <= beg:
            return []
        end -= 1
        bins = [0]
        for shift, offset in ((26, 1), (23, 9), (20, 73), (17, 585), (14, 4681)):
            bins.extend(range(offset + (beg >> shift), offset + (end >> shift) + 1))
        return bins

    def chunks_for_region(self, ref_id: int, beg: int, end: int) -> List[Chunk]:
        """Merged, sorted chunk list possibly containing records overlapping
        [beg, end) on reference ref_id."""
        if ref_id < 0 or ref_id >= len(self.bins):
            return []
        ref_bins = self.bins[ref_id]
        linear = self.linear[ref_id]
        # Linear index: minimum virtual offset of records overlapping the
        # 16kb window containing beg.
        window = beg >> 14
        min_offset = linear[window] if window < len(linear) else (
            linear[-1] if linear else 0
        )
        chunks: List[Chunk] = []
        for bin_id in self.region_to_bins(beg, end):
            for cbeg, cend in ref_bins.get(bin_id, ()):
                if cend > min_offset:
                    chunks.append((max(cbeg, min_offset), cend))
        chunks.sort()
        # Merge adjacent/overlapping chunks.
        merged: List[Chunk] = []
        for cbeg, cend in chunks:
            if merged and cbeg <= merged[-1][1]:
                merged[-1] = (merged[-1][0], max(merged[-1][1], cend))
            else:
                merged.append((cbeg, cend))
        return merged


def optimize_chunks(chunk_lists: List[List[Chunk]]) -> List[Chunk]:
    """Merge chunk lists from multiple region queries into one sorted,
    non-overlapping list (the QueryInterval.optimizeIntervals analog)."""
    all_chunks = sorted(c for chunks in chunk_lists for c in chunks)
    merged: List[Chunk] = []
    for cbeg, cend in all_chunks:
        if merged and cbeg <= merged[-1][1]:
            merged[-1] = (merged[-1][0], max(merged[-1][1], cend))
        else:
            merged.append((cbeg, cend))
    return merged
