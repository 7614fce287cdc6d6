"""Shared caller driver pieces: loci resolution, output writing.

(cf. /root/reference .../Common.scala:223-304)
"""

from __future__ import annotations

import json
import sys
from typing import Dict, List, Optional, Sequence

from guacamole_tpu.gio.vcf import VcfRecord, write_vcf
from guacamole_tpu.loci.lociset import LociSet, LociSetBuilder, parse_loci
from guacamole_tpu.utils.progress import progress


def resolve_loci_builder(
    loci: str = "", loci_from_file: str = ""
) -> LociSetBuilder:
    """Parse --loci / --loci-from-file (default: 'all')."""
    if loci and loci_from_file:
        raise ValueError(
            "Specify at most one of the 'loci' and 'loci-from-file' arguments"
        )
    if loci:
        expression = loci
    elif loci_from_file:
        with open(loci_from_file) as fh:
            expression = fh.read()
    else:
        expression = "all"
    return parse_loci(expression)


def record_to_json(rec: VcfRecord) -> dict:
    out = {
        "sampleId": rec.sample_name,
        "variant": {
            "contig": {"contigName": rec.contig},
            "start": rec.start,
            "referenceAllele": rec.ref,
            "alternateAllele": rec.alt,
        },
        "alleles": list(rec.genotype),
    }
    if rec.genotype_quality is not None:
        out["genotypeQuality"] = rec.genotype_quality
    if rec.read_depth is not None:
        out["readDepth"] = rec.read_depth
        out["referenceReadDepth"] = rec.reference_read_depth
        out["alternateReadDepth"] = rec.alternate_read_depth
        if rec.read_depth:
            out["expectedAlleleDosage"] = (
                (rec.alternate_read_depth or 0) / rec.read_depth
            )
    if rec.id_ != ".":
        out["rsId"] = rec.id_
    return out


def write_variants(
    records: Sequence[VcfRecord],
    out_path: str = "",
    contig_lengths: Optional[Dict[str, int]] = None,
    max_genotypes: int = 0,
) -> None:
    """Write calls: stdout JSON (default), .json file, or .vcf file
    (cf. Common.scala:246-304)."""
    if max_genotypes > 0 and len(records) > max_genotypes:
        progress(f"Subsetting to {max_genotypes} genotypes.")
        records = records[:max_genotypes]
    records = sorted(
        records, key=lambda r: (r.contig, r.start, r.sample_name, r.ref, r.alt)
    )
    lower = out_path.lower()
    if not out_path or lower.endswith(".json"):
        out = sys.stdout if not out_path else open(out_path, "w")
        try:
            for rec in records:
                json.dump(record_to_json(rec), out, indent=2, sort_keys=True)
                out.write("\n")
        finally:
            if out is not sys.stdout:
                out.close()
    elif lower.endswith(".vcf"):
        progress(f"Writing genotypes to VCF file: {out_path}.")
        write_vcf(records, out_path, contig_lengths)
    else:
        raise ValueError(f"Unsupported output format: {out_path}")


def validate_output_path(out_path: str) -> None:
    import os

    if out_path.lower().endswith(".vcf") and os.path.exists(out_path):
        raise FileExistsError(f"Output file {out_path} already exists")
